"""Run any registered query from the command line.

    python -m datamodel_clinicaldata_spark.run <query> [--sf-dir DIR]
        [--limit N] [--format show|csv|json] [--explain] [--list]

The operational front door for the whole registry: the same callables the
driver and bench execute, behind one argparse surface — `--list` prints
the inventory, `--explain` prints the formatted physical plan instead of
results (the plan-first habit SCALING.md prescribes before running
anything expensive at scale).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("query", nargs="?", help="registered query name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--limit", type=int, default=20, help="rows to display (show/json)")
    p.add_argument("--format", choices=("show", "csv", "json"), default="show")
    p.add_argument("--explain", action="store_true", help="print the plan, don't run")
    p.add_argument("--list", action="store_true", help="list registered queries")
    args = p.parse_args(argv)

    from datamodel_clinicaldata_spark.registry import QUERIES

    if args.list or not args.query:
        for name in sorted(QUERIES):
            print(name)
        return 0
    if args.query not in QUERIES:
        print(f"unknown query {args.query!r} — see --list", file=sys.stderr)
        return 2

    from datamodel_clinicaldata_spark.session import get_spark

    spark = get_spark(f"run-{args.query}")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.format == "show":
        df.show(args.limit, truncate=False)
    elif args.format == "csv":
        pdf = df.toPandas()
        pdf.to_csv(sys.stdout, index=False)
    else:
        pdf = df.limit(args.limit).toPandas()
        print(pdf.to_json(orient="records"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
