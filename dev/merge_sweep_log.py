#!/usr/bin/env python3
"""Assemble a CORRECTNESS json from a check_oracle.py LOG plus optional
extra per-query json files (targeted --only re-runs). Used when a sweep
outlives its session: check_oracle writes its --json only at the very
end, but every decided row is already in the log. Row shapes mirror
check_oracle's: pass -> {rows, method, match}, proof -> method
'replica_proof', rows-only -> 'rows_only', infeasible ->
'oracle_infeasible'. Rows/cols come from the log line "(rows, cols)".

Usage: merge_sweep_log.py <sweep.log> <out.json> [extra.json ...]
"""
import sys, json, re

log, out = sys.argv[1], sys.argv[2]
rows = {}
pat = re.compile(r"^\[(PASS|PASS-proof|rows-only|FAIL|infeasible)\s*\]\s+(\w+):\s*(.*)$")
for line in open(log):
    m = pat.match(line.strip())
    if not m:
        continue
    kind, name, rest = m.groups()
    size = re.match(r"\((\d+),\s*(\d+)\)", rest)
    n = int(size.group(1)) if size else None
    # a malformed/concatenated log should not yield a plausible-looking
    # CORRECTNESS json silently: PASS without a parseable "(rows, cols)"
    # and duplicate decisions for one query are both loudly flagged
    # (last-wins behavior kept — a targeted re-run legitimately
    # supersedes an earlier sweep row)
    if kind == "PASS" and n is None:
        print(f"WARN: PASS row for {name} has no parseable (rows, cols): {rest!r}",
              file=sys.stderr)
    if name in rows:
        print(f"WARN: duplicate decision for {name} — keeping the later line",
              file=sys.stderr)
    if kind == "PASS":
        rows[name] = {"rows": n, "method": "duckdb", "match": True}
    elif kind == "PASS-proof":
        nm = re.match(r"(\d+) rows", rest)
        rows[name] = {"rows": int(nm.group(1)) if nm else None,
                      "method": "replica_proof", "match": True,
                      "note": rest}
    elif kind == "rows-only":
        rows[name] = {"rows": n, "method": "rows_only", "match": None}
    elif kind == "infeasible":
        rows[name] = {"method": "oracle_infeasible", "match": None,
                      "reason": rest}
    else:
        rows[name] = {"method": "duckdb", "match": False, "detail": rest}
for extra in sys.argv[3:]:
    rows.update(json.load(open(extra)))
json.dump(dict(sorted(rows.items())), open(out, "w"), indent=1)
print(f"{len(rows)} rows -> {out}")
