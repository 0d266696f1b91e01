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


def type_lint(exp_rel, got_rel=None):
    """Flag oracle output types Spark cannot emit (driver-hash artifacts).

    DuckDB widens sum(BIGINT) to HUGEINT and integer-literal division to
    DECIMAL; Spark emits BIGINT/DOUBLE. Values stringify identically so
    the local row compare passes, but the driver's hash is type-sensitive
    — this exact class produced red rows in rounds 4-6 (p09/p10 DECIMAL,
    l45/r43 HUGEINT). Lint runs on the oracle's *plan* types (no
    execution). HUGEINT fails unconditionally (Spark can never emit it,
    so it covers every oracle even in SPARK_GRAFT_ONLY subset runs);
    DECIMAL fails only when the dumped Spark side is known non-DECIMAL —
    a matching Spark decimal is legitimate, so an un-dumped query gets a
    warning, not a false red.
    """
    bad, warns = [], []
    got_types = {}
    if got_rel is not None:
        got_types = {c: str(t).upper()
                     for c, t in zip(got_rel.columns, got_rel.types)}
    for c, t in zip(exp_rel.columns, exp_rel.types):
        ts = str(t).upper()
        gs = got_types.get(c, "")
        if "HUGEINT" in ts:
            bad.append(f"{c}: oracle {ts} (Spark max is BIGINT) "
                       f"-> CAST(... AS BIGINT) in the oracle SQL")
        elif ts.startswith("DECIMAL"):
            if got_rel is not None and not gs.startswith("DECIMAL"):
                bad.append(f"{c}: oracle {ts} vs spark {gs or '(missing)'} "
                           f"-> CAST(... AS DOUBLE) or BIGINT in the "
                           f"oracle SQL")
            elif got_rel is None:
                warns.append(f"{c}: oracle {ts} not checked against a "
                             f"dumped Spark result (subset run)")
    return bad, warns


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
        dumped = os.path.isdir(f"{out_dir}/{name}")
        try:
            exp_rel = con.sql(sql)
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'") \
                if dumped else None
            lint, lint_warns = type_lint(exp_rel, got_rel)
        except Exception as e:
            print(f"FAIL {name}: ERROR {e}")
            n_bad += 1
            continue
        for w in lint_warns:
            print(f"warn {name}: {w}")
        if lint:
            print(f"FAIL {name}: oracle output-type lint")
            for b in lint:
                print(f"  {b}")
            n_bad += 1
            continue
        if not dumped:
            if subset is not None and name not in subset:
                n_skip += 1  # deliberately not dumped (type lint still ran)
                continue
            print(f"FAIL {name}: no result dir (query crashed in Verify?)")
            n_bad += 1
            continue
        try:
            got_cols = got_rel.columns
            got = canon(got_rel.fetchall(), got_cols)
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
