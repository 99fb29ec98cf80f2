"""Table/column keyword metadata round-trip (reference S7 args).

The reference reads CASA table/column keyword dicts eagerly
(daskms/reads.py:541-546) and writes them back via the
``table_keywords`` / ``column_keywords`` arguments of ``xds_to_table``
(daskms/writes.py:723-739).  On a parquet store the same metadata rides
in a small JSON sidecar — one file per table, written once on the
driver (keywords are table-level metadata, never per-row data, so this
costs nothing at any scale).
"""

from __future__ import annotations

import json
from typing import Any, Mapping

from . import sidecar

__all__ = ["write_keywords", "read_keywords", "update_keywords",
           "KEYWORDS_FILE"]

KEYWORDS_FILE = "_dask_ms_spark_keywords.json"


def write_keywords(store: str,
                   table_keywords: Mapping[str, Any] | None = None,
                   column_keywords: Mapping[str, Mapping[str, Any]] | None = None,
                   ) -> None:
    """Write table + per-column keyword dicts next to a parquet store
    (local or remote — sidecar IO routes through the Hadoop FS)."""
    payload = {"table": dict(table_keywords or {}),
               "columns": {c: dict(kw)
                           for c, kw in (column_keywords or {}).items()}}
    sidecar.write_text(store, KEYWORDS_FILE,
                       json.dumps(payload, indent=1, sort_keys=True))


def read_keywords(store: str) -> tuple[dict, dict]:
    """(table_keywords, column_keywords) for a store; empty if absent
    (the reference returns {} for keywordless tables)."""
    text = sidecar.read_text(store, KEYWORDS_FILE)
    if text is None:
        return {}, {}
    payload = json.loads(text)
    return payload.get("table", {}), payload.get("columns", {})


def update_keywords(store: str,
                    table_keywords: Mapping[str, Any] | None = None,
                    column_keywords: Mapping[str, Mapping[str, Any]] | None = None,
                    ) -> None:
    """Merge new keywords over existing ones (the reference's keyword
    writes are merge-in-place on the open table)."""
    table, columns = read_keywords(store)
    table.update(table_keywords or {})
    for c, kw in (column_keywords or {}).items():
        columns.setdefault(c, {}).update(kw)
    write_keywords(store, table, columns)
