"""CLI: run any registered query against a testdata directory.

  python -m bigdata_gamedb_etl_spark list
  python -m bigdata_gamedb_etl_spark run <query> [--sf-dir DIR] [--limit N]
  python -m bigdata_gamedb_etl_spark explain <query> [--sf-dir DIR]
  python -m bigdata_gamedb_etl_spark figures [--sf-dir DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="bigdata_gamedb_etl_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for cmd in ("run", "explain"):
        c = sub.add_parser(cmd)
        c.add_argument("query")
        c.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        if cmd == "run":
            c.add_argument("--limit", type=int, default=20)
    f = sub.add_parser(
        "figures", help="render the reference figure set (S9) as PNGs"
    )
    f.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    f.add_argument("--out", default="./figs")
    args = parser.parse_args(argv)

    if args.cmd == "figures":
        from .session import get_spark
        from .sinks import save_reference_figures

        spark = get_spark(app_name="cli-figures")
        spark.sparkContext.setLogLevel("ERROR")
        for name, path in save_reference_figures(
            spark, args.sf_dir, args.out
        ).items():
            print(f"{name}\t{path}")
        return 0

    from .registry import all_oracle, all_queries

    queries = all_queries()
    if args.cmd == "list":
        oracle = all_oracle()
        for name in sorted(queries):
            kind = "oracle" if name in oracle else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    if args.query not in queries:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
