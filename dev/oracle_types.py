#!/usr/bin/env python3
"""Static type audit of every oracle SQL: DESCRIBE under DuckDB, no execution.

Dev/CI-only harness (uses driver-side duckdb — NOT a dependency of the Scala
library). The driver's correctness hash is TYPE-SENSITIVE, and DuckDB widens
SUM(BIGINT) and '//'-over-HUGEINT results to HUGEINT (int128) — a type Spark
cannot produce, so any oracle column declared HUGEINT/UHUGEINT is a guaranteed
hash mismatch even when values are identical (the round-14 o74/o79 failure
class). DESCRIBE resolves the declared output types without running the query,
so this audit is cheap enough for CI (OracleAuditSpec shells out to it).

DECIMAL columns are NOT failed here: a few oracles legitimately return DECIMAL
where the Spark query also returns DecimalType (order-free exact sums). They
are reported on stdout as `decimal_columns` so the calling spec can verify the
Spark side's precision/scale matches.

Usage: python3 dev/oracle_types.py <sfDir> <oracleSqlJson>
Exit 0: no forbidden types. Exit 1: violations (listed as JSON on stdout).
"""
import sys, os, json, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FORBIDDEN = ("HUGEINT", "UHUGEINT")

# --- money-sum tripwire (round 16) ---------------------------------------
# The sf10 drift class was ROUND(SUM(double)) over money columns: double
# addition is association-order-dependent, so Spark's partial-agg order vs
# DuckDB's serial order flips the last ulp and crosses round(…,2)
# boundaries at scale — while matching at sf0.01, so the per-round gate
# can't see it. Every money aggregate must ride DECIMAL. This audit scans
# each oracle's SUM arguments for a money column with no DECIMAL cast.
MONEY_RE = re.compile(
    r"\b(l_extendedprice|l_discount|price|freight_value|value|o_totalprice"
    r"|p_retailprice|amount|order_revenue|revenue|rev|total_value)\b", re.I)
# counting sums (SUM(CASE WHEN <money pred> THEN 1 ELSE 0 END)) aggregate
# integers, not money — exempt
COUNT_CASE_RE = re.compile(r"THEN\s+\d+\s+ELSE\s+\d+", re.I)


def sum_args(sql):
    """(argument, start_offset) of every SUM(...) in sql, balanced-paren
    extracted. The offset lets callers scope alias-resolution checks to the
    text PRECEDING the SUM."""
    out = []
    for m in re.finditer(r"\bSUM\s*\(", sql, re.I):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        out.append((sql[m.end():i - 1], m.start()))
    return out


def money_sum_violations(sql):
    """SUM args that reference a money column as DOUBLE (no decimal)."""
    bad = []
    for arg, pos in sum_args(sql):
        idents = set(i.lower() for i in MONEY_RE.findall(arg))
        if not idents or "DECIMAL" in arg.upper():
            continue
        if COUNT_CASE_RE.search(arg):
            continue  # integer counting sum, not a money aggregate
        # an identifier (re)defined as a DECIMAL expression BEFORE this SUM
        # (e.g. a CTE's `CAST(x AS DECIMAL(18,4)) AS freight_value`) is
        # decimal-typed at the point of this SUM — not a violation. Scoped
        # to the preceding text (round 17, ADVICE r16): a whole-text search
        # let one decimal alias anywhere exempt every same-named SUM in
        # sibling CTEs, including ones reading the raw double column.
        # CTE definitions always precede their uses, so preceding-text
        # scoping keeps every legitimate exemption and drops the leak.
        preceding = sql[:pos]
        unresolved = [i for i in idents if not re.search(
            r"DECIMAL\s*\(\s*\d+\s*,\s*\d+\s*\)\s*\)*\s*AS\s+" + i,
            preceding, re.I)]
        if unresolved:
            bad.append({"sum_arg": arg.strip()[:120],
                        "double_money_cols": sorted(unresolved)})
    return bad


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_json))
    violations = {}
    decimals = {}
    errors = {}
    for name in sorted(oracles):
        try:
            rows = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
        except Exception as e:  # an unresolvable oracle is itself a failure
            errors[name] = str(e).splitlines()[0]
            continue
        for col, typ in ((r[0], r[1]) for r in rows):
            u = typ.upper()
            if any(f in u for f in FORBIDDEN):
                violations.setdefault(name, {})[col] = typ
            elif "DECIMAL" in u:
                decimals.setdefault(name, {})[col] = typ
    money = {name: v for name in sorted(oracles)
             if (v := money_sum_violations(oracles[name]))}
    print(json.dumps({"oracles": len(oracles), "violations": violations,
                      "errors": errors, "decimal_columns": decimals,
                      "double_money_sums": money},
                     indent=1, sort_keys=True))
    return 1 if (violations or errors or money) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
