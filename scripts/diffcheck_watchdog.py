#!/usr/bin/env python3
"""Per-oracle watchdog wrapper around diffcheck's compare — for the
large-sf differential check where the deliberately-quadratic DuckDB
exact-twin formulations (labeled oracle twins of engine queries that
run in seconds on the Spark side) would take minutes-to-hours. Each
oracle gets `--timeout` seconds of DuckDB time (interrupted via a
timer thread); a timeout is reported separately, not as a failure.

Usage: python3 scripts/diffcheck_watchdog.py <sfDir> <verifyOutDir>
           [--timeout 300]
"""
import json
import math
import os
import sys
import threading

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else repr(v))
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out


def main(sf_dir, out_dir, timeout):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_timeout = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"skip {name}: not dumped")
            n_skip += 1
            continue
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"]:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            exp_rel = con.sql(sql)
            exp = canon(exp_rel.fetchall(), exp_rel.columns)
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = canon(got_rel.fetchall(), got_rel.columns)
            if sorted(got_rel.columns) != sorted(exp_rel.columns):
                print(f"FAIL {name}: cols spark={sorted(got_rel.columns)} "
                      f"oracle={sorted(exp_rel.columns)}")
                n_bad += 1
            elif got == exp:
                print(f"ok   {name} ({len(got)} rows)")
                n_ok += 1
            else:
                print(f"FAIL {name}: rows spark={len(got)} "
                      f"oracle={len(exp)}")
                n_bad += 1
        except duckdb.InterruptException:
            print(f"TIMEOUT {name}: oracle exceeded {timeout}s in DuckDB")
            n_timeout += 1
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                print(f"TIMEOUT {name}: oracle exceeded {timeout}s")
                n_timeout += 1
            else:
                print(f"FAIL {name}: ERROR {e}")
                n_bad += 1
        finally:
            timer.cancel()
            con.close()
    print(f"\n{n_ok} ok, {n_bad} failed, {n_timeout} oracle-timeout, "
          f"{n_skip} not dumped")
    return 1 if n_bad else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tmo = 300
    if "--timeout" in sys.argv:
        tmo = int(sys.argv[sys.argv.index("--timeout") + 1])
    sys.exit(main(args[0], args[1], tmo))
