"""Command-line surface — the reference's script workflows, one binary.

A dhakajack/Eurovision user runs three scripts: ``scrape.py`` (acquire),
``scan.py`` (parse to SQLite, prompted for paths on stdin) and
``toexcel.py`` (interactive WHERE-clause search exported to xlsx).
The same workflows here:

    python -m eurovision_spark ingest  DUMP.txt  OUT_DIR/
    python -m eurovision_spark export  TABLES_DIR/ out.xlsx \
        --trial-where "o.placebo = 1" --imp-where "trade <> ''"
    python -m eurovision_spark fetch   LANDING_DIR/ --url-template ...

``ingest`` replaces the stdin prompts (scan.py:498-499) with arguments
and SQLite with parquet; ``export`` replaces the interactive loop
(toexcel.py:100-165) with flags — a missing predicate skips that
table's constraint exactly like an empty interactive answer
(toexcel.py:24-28). Predicates are Spark SQL expressions parsed by the
engine, not string-interpolated SQL (the reference's injection surface,
toexcel.py:29).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _cmd_ingest(args: argparse.Namespace) -> int:
    from eurovision_spark import get_spark
    from eurovision_spark.operators.parse import parse_registry
    from eurovision_spark.sinks import write_parquet

    spark = get_spark("eurovision-ingest")
    t0 = time.time()
    tables = parse_registry(spark, args.source, yes_trumps_no=args.yes_trumps_no)
    for name, df in tables.items():
        write_parquet(df, os.path.join(args.out_dir, name))
    n = {name: spark.read.parquet(os.path.join(args.out_dir, name)).count() for name in tables}
    # parity with the reference's end-of-run trace (scan.py:500-503)
    print(f"ingested {n} in {time.time() - t0:.1f}s -> {args.out_dir}")
    return 0


def _cmd_export(args: argparse.Namespace) -> int:
    from eurovision_spark import get_spark
    from eurovision_spark.plans.search import search_and_export
    from eurovision_spark.sinks import write_csv, write_excel

    spark = get_spark("eurovision-export")
    tables = {
        name: spark.read.parquet(os.path.join(args.tables_dir, name))
        for name in ("trial", "imp", "sponsor", "location")
    }
    result = search_and_export(
        tables,
        trial_where=args.trial_where,
        imp_where=args.imp_where,
        location_where=args.location_where,
        sponsor_where=args.sponsor_where,
    )
    n = result.count()
    print(f"{n} trials match")  # hit-count trace, toexcel.py:118
    if args.out.endswith(".xlsx"):
        write_excel(result, args.out)
    else:
        write_csv(result, args.out)
    print(f"wrote {args.out}")
    return 0


def _cmd_fetch(args: argparse.Namespace) -> int:
    from eurovision_spark.sources.fetcher import crawl, default_transport

    n = crawl(args.url_template, args.landing_dir, default_transport)
    print(f"fetched {n} pages -> {args.landing_dir}")
    return 0


def _cmd_query(args: argparse.Namespace) -> int:
    from eurovision_spark import get_spark
    from eurovision_spark.catalog import registry
    from eurovision_spark.sinks import write_csv, write_parquet

    specs = registry()
    if args.name not in specs:
        print(f"unknown query {args.name!r}; available: {', '.join(sorted(specs))}")
        return 2
    spark = get_spark("eurovision-query")
    df = specs[args.name].fn(spark, args.sf_dir)
    if args.out:
        (write_csv if args.out.endswith(".csv") else write_parquet)(df, args.out)
        print(f"wrote {args.out}")
    else:
        # persist so show + count execute the plan once, not twice
        df.persist()
        try:
            n = df.count()
            df.show(args.limit, truncate=False)
            print(f"{n} rows")
        finally:
            df.unpersist()
    return 0


def _cmd_explain(args: argparse.Namespace) -> int:
    """Plan inspection for any catalog query — the .explain("formatted")
    loop the engine's own plan tests run, exposed to users so a slow
    query's shuffle/broadcast structure is one command away."""
    from eurovision_spark import get_spark
    from eurovision_spark.catalog import registry

    specs = registry()
    if args.name not in specs:
        print(f"unknown query {args.name!r}; available: {', '.join(sorted(specs))}")
        return 2
    spark = get_spark("eurovision-explain")
    specs[args.name].fn(spark, args.sf_dir).explain(args.mode)
    return 0


def _cmd_list(args: argparse.Namespace) -> int:
    """Catalog discovery: every runnable query with its first doc
    sentence — no SparkSession needed (the registry is plain Python
    until a query's builder runs)."""
    from eurovision_spark.catalog import registry

    for name, spec in sorted(registry().items()):
        if args.filter and args.filter not in name:
            continue
        first = (spec.doc or "").split(". ")[0].split(" — ")[0].strip()
        tags = "" if spec.oracle is not None else "  [rows-only]"
        print(f"{name:28s} {first[:90]}{tags}")
    return 0


def _cmd_sql(args: argparse.Namespace) -> int:
    """Ad-hoc SQL over the registered star schema — the engine-native
    replacement for the reference's raw interpolated WHERE loop
    (toexcel.py:29): the statement is parsed/analyzed by Spark SQL
    against named temp views, never string-spliced into another query."""
    from eurovision_spark import get_spark
    from eurovision_spark.sinks import write_csv, write_parquet
    from eurovision_spark.sources import register_views

    spark = get_spark("eurovision-sql")
    register_views(spark, args.sf_dir)
    df = spark.sql(args.statement)
    if args.out:
        (write_csv if args.out.endswith(".csv") else write_parquet)(df, args.out)
        print(f"wrote {args.out}")
    else:
        # persist so show + count execute the plan once, not twice
        df.persist()
        try:
            n = df.count()
            df.show(args.limit, truncate=False)
            print(f"{n} rows")
        finally:
            df.unpersist()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="eurovision_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="parse a registry dump into 4 parquet tables")
    pi.add_argument("source", help="registry text dump (scan.py stdin arg 1)")
    pi.add_argument("out_dir", help="output dir for trial/imp/sponsor/location parquet")
    pi.add_argument(
        "--yes-trumps-no",
        action="store_true",
        help="enable the reference's INTENDED bool merge (its dead code, scan.py:296-301)",
    )
    pi.set_defaults(fn=_cmd_ingest)

    pe = sub.add_parser("export", help="predicate search -> denormalized xlsx/csv")
    pe.add_argument("tables_dir", help="dir with trial/imp/sponsor/location parquet")
    pe.add_argument("out", help="output .xlsx (or CSV dir)")
    pe.add_argument("--trial-where", default=None)
    pe.add_argument("--imp-where", default=None)
    pe.add_argument("--location-where", default=None)
    pe.add_argument("--sponsor-where", default=None)
    pe.set_defaults(fn=_cmd_export)

    pf = sub.add_parser("fetch", help="paginated registry crawl into a landing dir")
    pf.add_argument("landing_dir")
    pf.add_argument("--url-template", required=True, help="page-parametrized URL (magicString.txt)")
    pf.set_defaults(fn=_cmd_fetch)

    default_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pq_ = sub.add_parser("query", help="run a named catalog query")
    pq_.add_argument("name", help="catalog query name (see COVERAGE.md)")
    pq_.add_argument("--sf-dir", default=default_sf, help="tables dir (parquet star schema)")
    pq_.add_argument("--out", default=None, help="write result (.csv => CSV, else parquet)")
    pq_.add_argument("--limit", type=int, default=20, help="rows to show when not writing")
    pq_.set_defaults(fn=_cmd_query)

    px = sub.add_parser("explain", help="print a catalog query's physical plan")
    px.add_argument("name", help="catalog query name (see COVERAGE.md)")
    px.add_argument("--sf-dir", default=default_sf, help="tables dir (parquet star schema)")
    px.add_argument(
        "--mode", default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
        help="explain mode (default: formatted)",
    )
    px.set_defaults(fn=_cmd_explain)

    pl = sub.add_parser("list", help="list catalog queries (name + one-liner)")
    pl.add_argument("--filter", default=None, help="substring filter on the name")
    pl.set_defaults(fn=_cmd_list)

    ps = sub.add_parser("sql", help="ad-hoc Spark SQL over the registered tables")
    ps.add_argument("statement", help="SQL; tables region..embeddings are views")
    ps.add_argument("--sf-dir", default=default_sf, help="tables dir (parquet star schema)")
    ps.add_argument("--out", default=None, help="write result (.csv => CSV, else parquet)")
    ps.add_argument("--limit", type=int, default=20, help="rows to show when not writing")
    ps.set_defaults(fn=_cmd_sql)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
