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
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FORBIDDEN = ("HUGEINT", "UHUGEINT")


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
    print(json.dumps({"oracles": len(oracles), "violations": violations,
                      "errors": errors, "decimal_columns": decimals},
                     indent=1, sort_keys=True))
    return 1 if (violations or errors) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
