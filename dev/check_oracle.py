#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Dev-only harness (uses driver-side duckdb/pandas — NOT a dependency of the
Scala library): runs each oracle SQL from <outDir>/oracle_sql.json against
the sfDir parquet tables in DuckDB and compares with the Spark parquet dump
written by graft.Verify. Columns are sorted by name before comparison, like
the driver; rows are compared both in emitted order and sorted.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir> [--timeout SECS] [--json OUT]

--timeout: per-oracle wall-clock budget; a DuckDB run past it is interrupted
and recorded as `timeout` (skipped, not failed) — for sf1 sweeps where the
handful of all-pairs oracles are infeasible in DuckDB but everything else is
checkable. --json: also write per-query results as JSON (for the
CORRECTNESS_sf1_r{N} artifact).

Type gate (round 15): the driver's hash is TYPE-SENSITIVE — DuckDB widens
SUM(BIGINT) and '//'-over-HUGEINT to HUGEINT (int128), which pandas silently
normalizes, so a value-only comparison passes where the driver fails (this is
exactly how o74/o79 slipped through in round 14). We now DESCRIBE both the
oracle SQL and the Spark parquet dump in DuckDB and fail on any column whose
declared types differ, before comparing values.
"""
import sys, os, json
import duckdb
import pandas as pd


def described_types(con, sql):
    """Column name -> DuckDB type string for a query, without running it."""
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    return {r[0]: r[1] for r in rows}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_with_timeout(con, sql, timeout):
    """Execute sql; on a timeout interrupt the connection and raise."""
    if not timeout:
        return con.execute(sql).df()
    import threading
    timer = threading.Timer(timeout, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).df()
    finally:
        timer.cancel()


def main(sf_dir, out_dir, timeout=None, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table dir (sf1 rehearsal data)
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    n_pass = n_fail = n_timeout = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(spark_df)} rows")
            results[name] = {"rows": len(spark_df), "method": "rows_only",
                             "match": None}
            continue
        try:
            duck_df = run_with_timeout(con, oracle[name], timeout)
        except duckdb.InterruptException:
            print(f"[timeout  ] {name}: oracle exceeded {timeout}s in DuckDB "
                  f"(skipped, not failed)")
            results[name] = {"rows": len(spark_df), "method": "duckdb",
                             "match": None, "timeout_s": timeout}
            n_timeout += 1
            continue
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                print(f"[timeout  ] {name}: oracle exceeded {timeout}s in "
                      f"DuckDB (skipped, not failed)")
                results[name] = {"rows": len(spark_df), "method": "duckdb",
                                 "match": None, "timeout_s": timeout}
                n_timeout += 1
                continue
            print(f"[FAIL-sql ] {name}: {e}")
            results[name] = {"rows": len(spark_df), "method": "duckdb",
                             "match": False, "error": str(e)[:200]}
            n_fail += 1
            continue
        # Type gate: DESCRIBE both sides in DuckDB; any declared-type drift
        # (HUGEINT/DECIMAL widening above all) is a hard failure even when the
        # pandas-normalized values match.
        try:
            o_types = described_types(con, oracle[name])
            s_types = described_types(
                con, f"SELECT * FROM read_parquet('{d}/*.parquet')")
            type_drift = {
                c: (s_types.get(c), o_types.get(c))
                for c in sorted(set(o_types) | set(s_types))
                if s_types.get(c) != o_types.get(c)}
        except Exception as e:
            type_drift = {"<describe-error>": (None, str(e))}
        if type_drift:
            print(f"[FAIL-type] {name}:")
            for c, (st, ot) in type_drift.items():
                print(f"    col {c}: spark-parquet={st} oracle={ot}")
            results[name] = {"rows": len(spark_df), "method": "duckdb",
                             "match": False,
                             "type_drift": {c: list(v) for c, v
                                            in type_drift.items()}}
            n_fail += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = duck_df[sorted(duck_df.columns)]
        ok_cols = list(s.columns) == list(o.columns)
        ok_shape = s.shape == o.shape
        ok_vals = False
        ok_sorted = False
        if ok_cols and ok_shape:
            try:
                pd.testing.assert_frame_equal(
                    s.reset_index(drop=True), o.reset_index(drop=True),
                    check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError:
                pass
            try:
                ss = s.sort_values(by=list(s.columns)).reset_index(drop=True)
                oo = o.sort_values(by=list(o.columns)).reset_index(drop=True)
                pd.testing.assert_frame_equal(ss, oo, check_dtype=False,
                                              check_exact=True)
                ok_sorted = True
            except Exception:
                pass
        results[name] = {"rows": len(spark_df), "method": "duckdb",
                         "match": bool(ok_vals)}
        if ok_vals:
            print(f"[PASS     ] {name}: {s.shape}")
            n_pass += 1
        else:
            print(f"[FAIL     ] {name}: cols={ok_cols} shape={ok_shape} "
                  f"spark={s.shape} duck={o.shape} sorted_match={ok_sorted}")
            if ok_cols and ok_shape:
                neq = (s.values != o.values)
                import numpy as np
                rows, cols = np.where(neq)
                for r, c in list(zip(rows, cols))[:5]:
                    print(f"    row {r} col {s.columns[c]}: "
                          f"spark={s.iloc[r, c]!r} duck={o.iloc[r, c]!r}")
            elif ok_cols:
                print(f"    spark cols={list(s.columns)}")
            else:
                print(f"    spark cols={list(s.columns)}\n    duck  cols={list(o.columns)}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_timeout} timeout ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    timeout = None
    json_out = None
    if "--timeout" in argv:
        i = argv.index("--timeout")
        timeout = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], timeout, json_out))
