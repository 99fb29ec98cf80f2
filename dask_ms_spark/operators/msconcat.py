"""Measurement Set concatenation — the CASA ``concat`` task as
DataFrame algebra.

Combining two observations' MS (same array, different epochs or
scheduling blocks) is NOT a plain row union: the subtables are
id-indexed by ROW POSITION, so the second MS's SPECTRAL_WINDOW /
POLARIZATION / FIELD / DATA_DESCRIPTION rows land at OFFSET positions
in the combined subtables and every index column that points at them
(MAIN's ``DATA_DESC_ID``/``FIELD_ID``, DATA_DESCRIPTION's
``SPECTRAL_WINDOW_ID``/``POLARIZATION_ID``) must shift by its
subtable's offset.  The reference ships the per-table datasets and
leaves this to CASA's concat task; here the re-index is a pure
literal-offset projection, so the combined MAIN plan is a UNION of
map-side projections — no shuffle, no join, the same scan cost as
reading the parts.

Scale shape (100 TB): offsets come from driver-side counts of the
DIMENSION-sized subtables (bounded collects by the same contract as
the IVF cell lists); the fact-table union itself adds zero exchanges,
and a downstream group-by-(FIELD_ID, DATA_DESC_ID) partitioning
(``xds_from_ms`` defaults) sees the re-indexed ids exactly as if the
combined MS had been observed in one run.

ANTENNA is intentionally NOT offset by default: concatenating
observations of the SAME array must keep antenna indices stable (the
CASA behaviour when the antenna tables match); ``concat_ms`` verifies
the parts' ANTENNA tables are value-identical and raises otherwise —
pass ``match_antennas=False`` to offset ``ANTENNA1``/``ANTENNA2``
and stack the antenna tables instead (heterogeneous-array concat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..types import ROWID

__all__ = ["concat_ms"]

# subtable -> MAIN index column that points at it.  OBSERVATION /
# STATE / PROCESSOR are row-position-indexed exactly like the big
# four; CASA's concat offsets their MAIN pointers and stacks the
# tables (taking them from part 0 while part>=1 rows keep their
# original ids would silently re-point metadata at the wrong rows).
_MAIN_INDEX = {"DATA_DESCRIPTION": "DATA_DESC_ID",
               "FIELD": "FIELD_ID",
               "OBSERVATION": "OBSERVATION_ID",
               "STATE": "STATE_ID",
               "PROCESSOR": "PROCESSOR_ID"}
# DATA_DESCRIPTION's own pointer columns
_DD_INDEX = {"SPECTRAL_WINDOW": "SPECTRAL_WINDOW_ID",
             "POLARIZATION": "POLARIZATION_ID"}
_OFFSET_TABLES = ("SPECTRAL_WINDOW", "POLARIZATION", "FIELD",
                  "DATA_DESCRIPTION", "OBSERVATION", "STATE",
                  "PROCESSOR")
# id-indexed via an explicit SOURCE_ID column (FIELD points at it),
# not row position — stacking needs source de-duplication, which CASA
# does with sky-position tolerances we do not replicate; parts must
# agree or the concat raises.
_IDENTITY_TABLES = ("SOURCE",)
# keyed subtables: not pointed at from MAIN by row position, but
# carrying POINTER COLUMNS into the offset tables — CASA's concat
# stacks their rows and shifts those pointers (taking part 0 only
# would silently drop part>=1 feed/pointing/syscal metadata while
# their spw targets moved — review r9).  ANTENNA_ID shifts only under
# match_antennas=False (ids are stable when the arrays are identical).
_KEYED_SUBTABLES = {
    "FEED": {"SPECTRAL_WINDOW": "SPECTRAL_WINDOW_ID",
             "ANTENNA": "ANTENNA_ID"},
    "POINTING": {"ANTENNA": "ANTENNA_ID"},
    "SYSCAL": {"SPECTRAL_WINDOW": "SPECTRAL_WINDOW_ID",
               "ANTENNA": "ANTENNA_ID"},
    "WEATHER": {"ANTENNA": "ANTENNA_ID"},
    "FREQ_OFFSET": {"SPECTRAL_WINDOW": "SPECTRAL_WINDOW_ID",
                    "ANTENNA": "ANTENNA_ID"},
    "HISTORY": {"OBSERVATION": "OBSERVATION_ID"},
    "FLAG_CMD": {},
}


def _with_rowid_offset(df: DataFrame, off: int) -> DataFrame:
    if ROWID in df.columns and off:
        return df.withColumn(ROWID, F.col(ROWID) + F.lit(off))
    return df


def _shift(df: DataFrame, col: str, off: int) -> DataFrame:
    """Offset an id column, preserving NEGATIVE sentinels: casacore
    uses -1 for "no row" (STATE_ID on unfilled scans is the common
    case) and a sentinel never indexes a row, so it must survive
    concat unshifted — offsetting it would re-point the row at a real
    part-0 entry."""
    if col in df.columns and off:
        dt = df.schema[col].dataType
        return df.withColumn(
            col, F.when(F.col(col) >= 0,
                        (F.col(col) + F.lit(off)).cast(dt))
                  .otherwise(F.col(col)))
    return df


def concat_ms(parts: list, match_antennas: bool = True) -> dict:
    """Concatenate Measurement Sets (each a ``{table_name:
    DataFrame}`` dict with ``"MAIN"`` plus subtables) into one, CASA
    ``concat``-style: subtable rows stack in part order and every id
    column re-indexes by its subtable's cumulative offset.

    Row-position-indexed subtables (SPECTRAL_WINDOW, POLARIZATION,
    FIELD, DATA_DESCRIPTION, OBSERVATION, STATE, PROCESSOR) stack
    with offsets; keyed subtables (FEED, POINTING, SYSCAL, WEATHER,
    FREQ_OFFSET, HISTORY, FLAG_CMD) stack with their pointer columns
    (SPECTRAL_WINDOW_ID/ANTENNA_ID/OBSERVATION_ID) shifted by the
    target table's offsets — the CASA concat behaviour; SOURCE
    (id-indexed by an explicit SOURCE_ID column) must be
    value-identical across parts or the concat raises.  Remaining
    subtables (ANTENNA under ``match_antennas=True``, and anything
    else present in part 0) are taken from the FIRST part; parts
    carrying extra tables the first lacks raise (silently dropping
    metadata is worse than failing).
    """
    if not parts:
        raise ValueError("concat_ms: no parts")
    parts = [dict(p) for p in parts]
    for i, p in enumerate(parts):
        if "MAIN" not in p:
            raise ValueError(f"concat_ms: part {i} has no MAIN table")
        extra = set(p) - set(parts[0])
        if extra:
            raise ValueError(
                f"concat_ms: part {i} carries tables {sorted(extra)} "
                "absent from part 0 — their metadata would be "
                "dropped; align the parts first")

    # driver-side subtable row counts -> cumulative offsets
    # (dimension tables: bounded collect contract).  ANTENNA and the
    # keyed subtables join the one-pass count map so nothing recounts
    # inside per-part loops (review r9: O(parts^2) count jobs).
    count_tables = set(_OFFSET_TABLES) | set(_KEYED_SUBTABLES) \
        | {"ANTENNA"}
    counts = {t: [p[t].count() if t in p else 0 for p in parts]
              for t in count_tables}
    offsets = {t: [sum(counts[t][:i]) for i in range(len(parts))]
               for t in count_tables}

    def _rows_in_order(df):
        """Rows in ROW-POSITION order: ANTENNA identity is positional
        (ANTENNA1/ANTENNA2 index row numbers), so a PERMUTED antenna
        table is NOT the same array — the previous sorted-set compare
        accepted it and silently mis-attributed every part>=1
        visibility (review r9).  ROWID orders when carried; otherwise
        the frame's natural (scan) order stands."""
        if ROWID in df.columns:
            return [tuple(r) for r in df.orderBy(ROWID).collect()]
        return [tuple(r) for r in df.collect()]

    if match_antennas and "ANTENNA" in parts[0]:
        rows0 = _rows_in_order(parts[0]["ANTENNA"])
        for i, p in enumerate(parts[1:], 1):
            if "ANTENNA" not in p:
                continue
            if _rows_in_order(p["ANTENNA"]) != rows0:
                raise ValueError(
                    f"concat_ms: part {i} ANTENNA table differs from "
                    "part 0 (value or ROW ORDER — antenna identity "
                    "is positional) — same-array concat requires "
                    "identical antennas; pass match_antennas=False "
                    "to stack heterogeneous arrays with offset "
                    "indices")

    out = {}
    mains = []
    row_off = 0
    for i, p in enumerate(parts):
        m = p["MAIN"]
        for t, col in _MAIN_INDEX.items():
            m = _shift(m, col, offsets[t][i])
        if not match_antennas and i:
            m = _shift(m, "ANTENNA1", offsets["ANTENNA"][i])
            m = _shift(m, "ANTENNA2", offsets["ANTENNA"][i])
        m = _with_rowid_offset(m, row_off)
        if ROWID in p["MAIN"].columns:
            row_off += p["MAIN"].count()
        mains.append(m)
    u = mains[0]
    for m in mains[1:]:
        u = u.unionByName(m)
    out["MAIN"] = u

    for t in _OFFSET_TABLES:
        stacked = None
        for i, p in enumerate(parts):
            if t not in p:
                continue
            d = p[t]
            if t == "DATA_DESCRIPTION":
                for sub, col in _DD_INDEX.items():
                    d = _shift(d, col, offsets[sub][i])
            d = _with_rowid_offset(d, offsets[t][i])
            stacked = d if stacked is None else stacked.unionByName(d)
        if stacked is not None:
            out[t] = stacked

    for t, pointers in _KEYED_SUBTABLES.items():
        if t not in parts[0]:
            continue
        stacked = None
        for i, p in enumerate(parts):
            if t not in p:
                continue
            d = p[t]
            for sub, col in pointers.items():
                off = (0 if sub == "ANTENNA" and match_antennas
                       else offsets[sub][i])
                d = _shift(d, col, off)
            d = _with_rowid_offset(d, offsets[t][i])
            stacked = d if stacked is None else stacked.unionByName(d)
        if stacked is not None:
            out[t] = stacked

    for t in _IDENTITY_TABLES:
        if t not in parts[0]:
            continue
        rows0 = sorted(map(tuple, parts[0][t].collect()))
        for i, p in enumerate(parts[1:], 1):
            if t in p and sorted(map(tuple, p[t].collect())) != rows0:
                raise ValueError(
                    f"concat_ms: part {i} {t} table differs from "
                    f"part 0 — {t} is id-indexed by an explicit id "
                    "column and stacking needs source merging CASA "
                    "does with position tolerances; reconcile the "
                    f"{t} tables before concatenation")

    for t, d in parts[0].items():
        if t not in out and t != "MAIN":
            if t == "ANTENNA" and not match_antennas:
                stacked = None
                for i, p in enumerate(parts):
                    if "ANTENNA" not in p:
                        continue
                    d2 = _with_rowid_offset(p["ANTENNA"],
                                            offsets["ANTENNA"][i])
                    stacked = d2 if stacked is None \
                        else stacked.unionByName(d2)
                out[t] = stacked
            else:
                out[t] = d
    return out
