"""CLI entry point — parity with the reference's argparse commands
(reference cli.py:12-39: init-db / ingest-status / ingest-weather)
plus engine-native extras (query / bench-style listing).

Usage:
    python -m bike_analyzer_spark.cli ingest-gbfs --warehouse DIR
        [--fixture si.json ss.json]          # offline: fixture payloads
    python -m bike_analyzer_spark.cli ingest-weather --warehouse DIR
        --start -2d --end +2d [--fixture payload.json]
    python -m bike_analyzer_spark.cli query NAME [--sf-dir DIR]
    python -m bike_analyzer_spark.cli explain NAME [--mode formatted]
    python -m bike_analyzer_spark.cli list-queries
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from .session import get_spark

    return get_spark(app_name="bike-analyzer-spark-cli")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bike-analyzer-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("ingest-gbfs", help="stations upsert + status append")
    g.add_argument("--warehouse", required=True)
    g.add_argument("--fixture", nargs=2, metavar=("SI_JSON", "SS_JSON"))

    w = sub.add_parser("ingest-weather", help="hourly weather upsert")
    w.add_argument("--warehouse", required=True)
    w.add_argument("--start", default="-2d")
    w.add_argument("--end", default="+2d")
    w.add_argument("--fixture", metavar="PAYLOAD_JSON")

    q = sub.add_parser("query", help="run a named corpus query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)

    sub.add_parser("list-queries", help="list the query corpus")

    e = sub.add_parser(
        "explain", help="print a query's optimized physical plan"
    )
    e.add_argument("name")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    e.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
    )

    o = sub.add_parser(
        "optimize",
        help="table maintenance: compact small files, optionally "
        "refresh the per-file skip-stats sidecar",
    )
    o.add_argument("path", help="parquet table directory")
    o.add_argument(
        "--target-mb", type=int, default=128, help="target file size"
    )
    o.add_argument(
        "--stats",
        nargs="+",
        metavar="COL",
        help="rebuild the data-skipping stats sidecar for these columns",
    )
    o.add_argument(
        "--zorder",
        nargs=2,
        metavar=("COL_A", "COL_B"),
        help="rewrite Z-ordered on two columns instead of plain "
        "compaction (crash-safe staged swap)",
    )
    o.add_argument(
        "--n-files", type=int, default=16, help="files for --zorder"
    )

    b = sub.add_parser(
        "build-corpus",
        help="end-to-end training corpus: scrub -> gate -> dedup -> "
        "split -> shuffle-shards -> versioned commit",
    )
    b.add_argument("table_dir")
    b.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    b.add_argument("--shards", type=int, default=8)

    args = p.parse_args(argv)

    if args.cmd == "build-corpus":
        from . import pipeline

        out = pipeline.run_corpus_build(
            _spark(), args.sf_dir, args.table_dir, n_shards=args.shards
        )
        print(json.dumps(out))
        return 0

    if args.cmd == "ingest-gbfs":
        from .sources import gbfs

        if args.fixture:
            with open(args.fixture[0]) as f:
                si = json.load(f)
            with open(args.fixture[1]) as f:
                ss = json.load(f)
            fetch = lambda: (si, ss)  # noqa: E731
        else:
            fetch = gbfs.fetch_via_http
        out = gbfs.ingest_once(_spark(), args.warehouse, fetch_fn=fetch)
        print(json.dumps(out))
        return 0

    if args.cmd == "ingest-weather":
        from .sources import weather

        if args.fixture:
            with open(args.fixture) as f:
                payload = json.load(f)
        else:
            payload = weather.fetch_weather(args.start, args.end)
        n = weather.upsert_weather(_spark(), payload, args.warehouse)
        print(json.dumps({"weather_rows": n}))
        return 0

    if args.cmd == "optimize":
        return _optimize(args)

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    if args.cmd == "list-queries":
        for name in sorted(queries):
            print(name)
        return 0

    if args.cmd == "query":
        if args.name not in queries:
            print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
            return 2
        df = queries[args.name](_spark(), args.sf_dir)
        df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "explain":
        if args.name not in queries:
            print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
            return 2
        queries[args.name](_spark(), args.sf_dir).explain(args.mode)
        return 0

    return 2


def _optimize(args) -> int:
    from .sources import skipping
    from .sources.sinks import _staging_dir, _swap_staging, compact_parquet

    spark = _spark()
    # resolve BEFORE the rewrite: an existing sidecar must be
    # refreshed even without --stats, or it silently goes stale
    # against the rewritten file set
    cols = args.stats or skipping.stats_cols(spark, args.path)
    if args.zorder:
        from .operators.layout import write_zorder_cols
        from .sources.sinks import _recover

        _recover(args.path)  # heal a swap killed between its renames
        df = spark.read.parquet(args.path)
        staging = _staging_dir(args.path)
        write_zorder_cols(df, staging, *args.zorder, n_files=args.n_files)
        _swap_staging(args.path)
        out = {"zorder": args.zorder, "n_files": args.n_files}
    else:
        before, after = compact_parquet(
            spark, args.path, target_bytes=args.target_mb << 20
        )
        out = {"files_before": before, "files_after": after}
    if cols:
        skipping.build_stats(spark, args.path, cols)
        out["stats_cols"] = cols
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
