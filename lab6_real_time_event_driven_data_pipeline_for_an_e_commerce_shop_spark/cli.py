"""Command-line surface: ``python -m <package> <command>``.

The reference's operational surface is spark-submit + AWS consoles;
here it's five subcommands over the same engine:

    query <name> [--sf-dir DIR] [-n ROWS]   run a catalog query, show rows
    sql <statement> [--sf-dir DIR]          ad-hoc Spark SQL over the tables
    pipeline <root> [--watch]               run medallion cycles over a directory
    list                                    list catalog queries (oracle-paired?)
    validate <table> <path>                 data-quality rules on a parquet table
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lab6-ecommerce-spark-engine")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run a catalog query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("-n", "--rows", type=int, default=20)

    pl = sub.add_parser("pipeline", help="run medallion cycles over <root>/landing")
    pl.add_argument("root")
    pl.add_argument("--watch", action="store_true",
                    help="keep polling for new files (Ctrl-C to stop)")
    pl.add_argument("--interval", type=float, default=5.0)

    s = sub.add_parser("sql", help="ad-hoc Spark SQL over the analytics tables")
    s.add_argument("statement")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    s.add_argument("-n", "--rows", type=int, default=20)

    sub.add_parser("list", help="list catalog queries")

    v = sub.add_parser("validate", help="run data-quality rules against a parquet table")
    v.add_argument("table", choices=["orders", "order_items", "products"])
    v.add_argument("path")

    args = p.parse_args(argv)

    from .plans import queries as qmod

    if args.cmd == "list":
        oracles = qmod.oracles()
        for name in sorted(qmod.catalog()):
            print(f"{name}  [{'oracle' if name in oracles else 'rows-only'}]")
        return 0

    from .session import build_session

    spark = build_session(app_name=f"engine-cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "query":
        catalog = qmod.catalog()
        if args.name not in catalog:
            print(f"unknown query {args.name!r}; try: python -m <pkg> list", file=sys.stderr)
            return 2
        catalog[args.name](spark, args.sf_dir).show(args.rows, truncate=False)
        return 0

    if args.cmd == "sql":
        import glob
        import os

        # every parquet table in --sf-dir becomes a temp view named by
        # its file stem (region, nation, ..., documents, embeddings) —
        # the ad-hoc surface for anything the 50-query catalog doesn't
        # pre-package; Catalyst plans it like any catalog query.
        for path in sorted(glob.glob(os.path.join(args.sf_dir, "*.parquet"))):
            name = os.path.splitext(os.path.basename(path))[0]
            spark.read.parquet(path).createOrReplaceTempView(name)
        spark.sql(args.statement).show(args.rows, truncate=False)
        return 0

    if args.cmd == "validate":
        from . import schemas
        from .operators import validation

        df = spark.read.schema(schemas.ECOMMERCE_SCHEMAS[args.table]).parquet(args.path)
        rules = validation.rules_for(args.table)
        validation.violation_counts(df, rules).show(50, truncate=False)
        return 0

    if args.cmd == "pipeline":
        from .streaming.pipeline import MedallionPipeline

        pipe = MedallionPipeline(spark, args.root)
        while True:
            dates = pipe.run_cycle()
            print(f"cycle complete; released order_dates: {dates or 'none'}")
            if not args.watch:
                return 0
            time.sleep(args.interval)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
