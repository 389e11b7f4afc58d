#!/usr/bin/env python3
"""spark-submit driver for the oracle query surface (VERDICT r2 #8: exercise
the driver contract through the DEPLOYED shape, not only in-process).

    spark-submit --master local[N] --py-files dist/sketch_spark.zip \
        scripts/run_queries.py --sf-dir /root/testdata/sf0.01 \
        [--entry-sf-dir /root/testdata/sf0.001] [--json <path>]

Runs `__spark_entry__.entry()` plus every `queries()` entry against the
given sf dir and, when duckdb is importable, cross-checks each against its
`oracle_sql()` (row count + sorted-column value frame equality) — the same
comparison the round driver performs, but through spark-submit --py-files.
Prints one JSON line: per-query rows + match verdicts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--entry-sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    # __spark_entry__ lives at the repo root, next to this script's parent
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E

    from sketch_spark import get_spark

    spark = get_spark("queries-submit", master="inherit")

    t0 = time.time()
    # pass the flag through (it was previously only a truthiness gate and
    # entry() always read its default dir)
    entry_rows = (
        E.entry(spark, args.entry_sf_dir).count() if args.entry_sf_dir else None
    )

    con = None
    if not args.skip_oracle:
        try:
            import duckdb

            con = duckdb.connect()
            for t in TABLES:
                p = f"{args.sf_dir}/{t}.parquet"
                if os.path.exists(p):
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                    )
        except ImportError:
            con = None

    qs, osql = E.queries(), E.oracle_sql()
    results = {}
    for name, fn in sorted(qs.items()):
        qt = time.time()
        sdf = fn(spark, args.sf_dir).toPandas()
        rec = {"rows": int(len(sdf)), "sec": round(time.time() - qt, 2)}
        if con is not None and name in osql:
            ddf = con.execute(osql[name]).fetchdf()
            cols = sorted(sdf.columns)
            ok_schema = cols == sorted(ddf.columns)
            ok = False
            if ok_schema and len(sdf) == len(ddf):
                import pandas.testing as pdt

                s = sdf[cols].sort_values(cols).reset_index(drop=True)
                d = ddf[cols].sort_values(cols).reset_index(drop=True)
                try:
                    pdt.assert_frame_equal(
                        s, d, check_dtype=False, check_exact=False, rtol=1e-9
                    )
                    ok = True
                except AssertionError:
                    ok = False
            rec["oracle_match"] = bool(ok)
        results[name] = rec

    out = {
        "surface": "spark-submit --py-files",
        "sf_dir": args.sf_dir,
        "entry_rows": entry_rows,
        "wall_sec": round(time.time() - t0, 1),
        "n_queries": len(results),
        "n_oracle_matched": sum(
            1 for r in results.values() if r.get("oracle_match") is True
        ),
        "n_oracle_failed": sum(
            1 for r in results.values() if r.get("oracle_match") is False
        ),
        "queries": results,
    }
    line = json.dumps(out)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
