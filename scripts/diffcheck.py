#!/usr/bin/env python3
"""Dev-only differential checker (mimics the driver's DuckDB-oracle gate).

NOT part of the shipped Scala library — local tooling to pre-validate
`SparkEntry.oracleSql` before the driver runs the real correctness pass.

Usage: python3 scripts/diffcheck.py <sfDir> <verifyOutDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json
import math
import os
import sys

import duckdb


def canon(rows, cols):
    """Sort columns by name, stringify values canonically, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Skip a missing result dir ONLY when SPARK_GRAFT_ONLY excluded the
    # query from the dump; in a full run a missing dir means the query
    # CRASHED in Verify and must fail the gate.
    only = os.environ.get("SPARK_GRAFT_ONLY")
    subset = {s.strip() for s in only.split(",")} if only else None
    n_ok = n_bad = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if subset is not None and name not in subset:
                n_skip += 1  # deliberately not dumped
                continue
            print(f"FAIL {name}: no result dir (query crashed in Verify?)")
            n_bad += 1
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = got_rel.columns
            got = canon(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: ERROR {e}")
            n_bad += 1
            continue
        if sorted(got_cols) != sorted(exp_rel.columns):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} "
                  f"oracle={sorted(exp_rel.columns)}")
            n_bad += 1
        elif got == exp:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            diff_a = [r for r in got if r not in set(exp)][:3]
            diff_b = [r for r in exp if r not in set(got)][:3]
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            print(f"  spark-only: {diff_a}")
            print(f"  oracle-only: {diff_b}")
    print(f"\n{n_ok} ok, {n_bad} failed, {n_skip} not dumped")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
