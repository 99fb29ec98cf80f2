"""Command-line apps (reference S11/S12/F4: the ``dask-ms`` CLI,
daskms/apps/convert.py:74-162, daskms/apps/fragments.py, and
daskms/apps/katdal_import.py).

Usage::

    python -m dask_ms_spark.apps convert IN OUT [--exclude C1,C2]
        [--group-columns G1,G2] [--index-columns I1,I2] [--where EXPR]
        [--format parquet] [--subtables S1,S2]
    python -m dask_ms_spark.apps fragments ancestry STORE
    python -m dask_ms_spark.apps fragments rebase STORE NEW_PARENT
    python -m dask_ms_spark.apps katdal-import URL OUT

Each command is a thin driver over the library; the heavy lifting runs
on the cluster through the same code paths the API exposes.
"""

from __future__ import annotations

import argparse
import sys


def _parse_codec(spec: str | None) -> dict | None:
    """--zarr-compressor id[:level] -> zarr v2 codec dict."""
    if not spec:
        return None
    cid, _, lvl = spec.partition(":")
    out = {"id": cid}
    if lvl:
        out["level"] = int(lvl)
    return out


def _csv(value: str | None) -> list[str]:
    return [v for v in (value or "").split(",") if v]


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="dask-ms-spark")
    sub = parser.add_subparsers(dest="command", required=True)

    conv = sub.add_parser("convert", help="convert between table formats "
                          "(reference: dask-ms convert)")
    conv.add_argument("input")
    conv.add_argument("output")
    conv.add_argument("--exclude", default="", help="columns to drop")
    conv.add_argument("--group-columns", default="")
    conv.add_argument("--index-columns", default="")
    conv.add_argument("--where", default=None, help="row filter expression")
    conv.add_argument("--taql-where", default=None,
                      help="TAQL row filter (reference syntax; "
                      "translated, see dask_ms_spark.taql)")
    conv.add_argument("--zarr-compressor", default=None,
                      help="codec for zarr output as id[:level], "
                      "e.g. zlib:6 or gzip:4 (stdlib codecs)")
    conv.add_argument("--format", default="parquet",
                      choices=["parquet", "casa", "zarr"])
    conv.add_argument("--subtables", default="",
                      help="subtables to convert alongside the main table")

    frag = sub.add_parser("fragments", help="fragment lineage tools "
                          "(reference: dask-ms fragments)")
    frag_sub = frag.add_subparsers(dest="frag_command", required=True)
    anc = frag_sub.add_parser("ancestry")
    anc.add_argument("store")
    reb = frag_sub.add_parser("rebase")
    reb.add_argument("store")
    reb.add_argument("new_parent")

    kat = sub.add_parser("katdal-import", help="MeerKAT archive ingest "
                         "(reference: dask-ms katdal_import)")
    kat.add_argument("url")
    kat.add_argument("output")

    args = parser.parse_args(argv)

    if args.command == "convert":
        from .session import get_spark
        from .sources.convert import convert_store

        spark = get_spark("dask-ms-spark-convert")
        convert_store(
            spark, args.input, args.output,
            subtables=_csv(args.subtables),
            exclude_columns=_csv(args.exclude),
            group_cols=_csv(args.group_columns),
            index_cols=_csv(args.index_columns),
            where=args.where, output_format=args.format,
            taql_where=args.taql_where,
            compressor=_parse_codec(args.zarr_compressor))
        return 0

    if args.command == "fragments":
        from .operators.overlay import get_ancestry, rebase_fragment

        if args.frag_command == "ancestry":
            for url in get_ancestry(args.store):
                print(url)
            return 0
        rebase_fragment(args.store, args.new_parent)
        return 0

    if args.command == "katdal-import":
        from .session import get_spark
        from .sources.katdal import katdal_import

        katdal_import(get_spark("dask-ms-spark-katdal"), args.url,
                      args.output)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
