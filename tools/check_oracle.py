#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 tools/check_oracle.py <verify_out_dir> [sf_dir]

Expects <verify_out_dir> to be the output of `sbt "runMain graft.Verify
<sf_dir> <verify_out_dir>"`: one parquet dir per query + oracle_sql.json.
Registers each fixture table as a DuckDB view over the sf parquet, runs
every oracle SQL, and compares against the Spark result with columns
sorted by name and rows sorted, hashing values — mirroring the driver's
described compare. Prints a per-query PASS/FAIL table and exits nonzero
on any FAIL. (Dev tool only; not part of the shipped library.)
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9) + 0.0)  # +0.0 collapses -0.0 into 0.0
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def frame(con, sql):
    cur = con.sql(sql)
    cols = list(cur.columns)
    types = [str(t) for t in cur.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in cur.fetchall()]
    return [(cols[i], types[i]) for i in order], sorted(rows)


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    # optional thread cap so a long oracle run can share the box with
    # timing probes (default: all cores)
    if os.environ.get("DUCKDB_THREADS"):
        con.sql(f"PRAGMA threads={int(os.environ['DUCKDB_THREADS'])}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (SfGen fixtures)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"  MISS {name}: no spark result dir"); n_fail += 1; continue
        try:
            scols, srows = frame(con, f"SELECT * FROM '{res_dir}/*.parquet'")
            ocols, orows = frame(con, oracle[name])
        except Exception as e:
            print(f"  ERR  {name}: {e}"); n_fail += 1; continue
        if scols != ocols:
            print(f"  FAIL {name}: columns spark={scols} oracle={ocols}"); n_fail += 1
        elif len(srows) != len(orows):
            print(f"  FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}"); n_fail += 1
        elif srows != orows:
            diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"  FAIL {name}: first diff at sorted-row {diff}:\n"
                  f"    spark : {srows[diff]}\n    oracle: {orows[diff]}")
            n_fail += 1
        else:
            print(f"  PASS {name} ({len(srows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
