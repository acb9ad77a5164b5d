"""Command-line entry point: `python -m namegraph_collections_spark`.

The reference is driven as a pipeline tool (Airflow DAG tasks invoking
per-stage scripts — airflow/readme-airflow.md); this CLI is the
Spark-native equivalent surface: list the registered queries, run one
against a scale-factor directory, inspect its physical plan, or land
its output through the lake sinks.

Commands:
  list                         registry names, one per line
  run NAME [--out DIR]         execute; print rows (or write parquet)
  explain NAME                 formatted physical plan
  oracle NAME                  the query's DuckDB oracle SQL (if any)

Common flags: --sf-dir (default $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.01), --cpus (default $SPARK_GRAFT_CPUS or 32),
--limit N for run's stdout mode.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="namegraph_collections_spark")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="directory with the parquet tables",
    )
    p.add_argument(
        "--cpus",
        type=int,
        default=None,
        help="local[N] parallelism (default: $SPARK_GRAFT_CPUS or 32)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    run = sub.add_parser("run")
    run.add_argument("name")
    run.add_argument("--out", help="write parquet here instead of printing")
    run.add_argument("--limit", type=int, default=20)
    exp = sub.add_parser("explain")
    exp.add_argument("name")
    orc = sub.add_parser("oracle")
    orc.add_argument("name")
    return p


def _registry():
    from namegraph_collections_spark.queries import REGISTRY

    return REGISTRY


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    reg = _registry()
    if args.cmd == "list":
        for name in reg:
            print(name)
        return 0
    if args.name not in reg:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    if args.cmd == "oracle":
        sql = reg[args.name].oracle
        if sql is None:
            print(f"{args.name} has no SQL oracle (rows-only check)", file=sys.stderr)
            return 1
        print(sql)
        return 0

    from namegraph_collections_spark.session import get_spark

    spark = get_spark(f"ngcs-cli-{args.cmd}", cpus=args.cpus)
    df = reg[args.name].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        print(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        return 0
    # run
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
