"""CASA table-descriptor builders and Measurement Set presets.

Reference surface: ``xds_to_table(..., descriptor=...)`` accepts a
ready tabledesc dict, a registered builder name (``"ms"``) or a
builder call string (``"ms_subtable('ANTENNA')"``) resolved through a
factory (daskms/descriptors/builder_factory.py:1-60, builders
registered via ``register_descriptor_builder``,
daskms/descriptors/builder.py:20-40; the MS preset builder is
daskms/descriptors/ms.py:21-309).

The reference derives its MS presets from casacore's
``complete_ms_desc()``; python-casacore is absent here, so the presets
below are transcribed from the PUBLIC Measurement Set v2.0
specification (casacore Note 229 / Kemball & Wieringa 2000) — column
names, value types and cell ranks for the MAIN table and the standard
subtables.  A builder starts from the Spark schema's inferred
descriptor (the data determines what is actually written), overlays
canonical MS value types, and ADDS any required MS columns absent from
the frame so the created table is a complete MS skeleton.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

from pyspark.sql.types import ArrayType, StructType

__all__ = ["register_descriptor_builder", "resolve_descriptor",
           "descriptor_complex_cols", "MS_PRESETS", "MS_SUBTABLES"]

_BUILDERS: dict[str, Callable] = {}


def register_descriptor_builder(name: str):
    """Register a descriptor builder under ``name`` (reference
    daskms/descriptors/builder.py:20-40).  A builder is
    ``fn(schema: StructType, complex_cols, arg: str | None) -> dict``.
    """
    def deco(fn):
        _BUILDERS[name] = fn
        return fn
    return deco


def resolve_descriptor(spec, schema: StructType,
                       complex_cols: Iterable[str] = ()) -> dict:
    """Resolve a ``descriptor=`` spec to a tabledesc dict.

    ``None`` -> the minimal schema-derived descriptor
    (:func:`~.casa.casa_table_descriptor`); a dict passes through
    verbatim; a string is a registered builder name with an optional
    single-string argument, e.g. ``"ms"`` or ``"ms('ANTENNA')"``
    (reference builder_factory string forms).
    """
    if spec is None:
        from .casa import casa_table_descriptor

        return casa_table_descriptor(schema, complex_cols)
    if isinstance(spec, dict):
        return dict(spec)
    if isinstance(spec, str):
        m = re.match(r"^\s*(\w+)\s*(?:\(\s*(?:['\"]([\w]*)['\"])?\s*\))?"
                     r"\s*$", spec)
        if not m:
            raise ValueError(f"unparseable descriptor spec {spec!r}; "
                             "expected \"name\" or \"name('ARG')\"")
        name, arg = m.group(1), m.group(2)
        try:
            builder = _BUILDERS[name]
        except KeyError:
            raise ValueError(
                f"unknown descriptor builder {name!r}; registered: "
                f"{sorted(_BUILDERS)}") from None
        return builder(schema, complex_cols, arg)
    raise TypeError(f"descriptor must be None, dict or str, "
                    f"got {type(spec).__name__}")


def descriptor_complex_cols(desc: dict, schema: StructType,
                            complex_cols: Iterable[str] = ()) -> set:
    """Effective complex-column set for the FILL step: columns the
    descriptor declares complex AND the frame carries as interleaved
    float arrays must be re-assembled at putcol time even when the
    caller didn't list them."""
    out = set(complex_cols)
    names = {f.name: f for f in schema.fields}
    for c, d in desc.items():
        if d.get("valueType") in ("complex", "dcomplex") and c in names:
            ft = names[c].dataType
            if isinstance(ft, ArrayType):
                out.add(c)
    return out


# ---------------------------------------------------------------------
# MS v2.0 presets: column -> (valueType, ndim, fixed shape | None).
# ndim 0 is a scalar column; ndim > 0 with shape None is a
# variable-shape tensor (casacore ndim with no fixed shape).
# Transcribed from the public MS v2.0 definition (casacore Note 229).

MS_PRESETS: dict[str, dict] = {
    "MAIN": {
        "TIME": ("double", 0, None),
        "TIME_CENTROID": ("double", 0, None),
        "ANTENNA1": ("int", 0, None),
        "ANTENNA2": ("int", 0, None),
        "ARRAY_ID": ("int", 0, None),
        "DATA_DESC_ID": ("int", 0, None),
        "EXPOSURE": ("double", 0, None),
        "FEED1": ("int", 0, None),
        "FEED2": ("int", 0, None),
        "FIELD_ID": ("int", 0, None),
        "FLAG": ("boolean", 2, None),
        "FLAG_CATEGORY": ("boolean", 3, None),
        "FLAG_ROW": ("boolean", 0, None),
        "INTERVAL": ("double", 0, None),
        "OBSERVATION_ID": ("int", 0, None),
        "PROCESSOR_ID": ("int", 0, None),
        "SCAN_NUMBER": ("int", 0, None),
        "SIGMA": ("float", 1, None),
        "STATE_ID": ("int", 0, None),
        "UVW": ("double", 1, (3,)),
        "WEIGHT": ("float", 1, None),
        # optional imaging columns (reference ms.py DATA_COLS +
        # spectral weights, daskms/descriptors/ms.py:44-96)
        "DATA": ("complex", 2, None),
        "MODEL_DATA": ("complex", 2, None),
        "CORRECTED_DATA": ("complex", 2, None),
        "WEIGHT_SPECTRUM": ("float", 2, None),
        "SIGMA_SPECTRUM": ("float", 2, None),
        "IMAGING_WEIGHT": ("float", 1, None),
    },
    "ANTENNA": {
        "DISH_DIAMETER": ("double", 0, None),
        "FLAG_ROW": ("boolean", 0, None),
        "MOUNT": ("string", 0, None),
        "NAME": ("string", 0, None),
        "OFFSET": ("double", 1, (3,)),
        "POSITION": ("double", 1, (3,)),
        "STATION": ("string", 0, None),
        "TYPE": ("string", 0, None),
    },
    "DATA_DESCRIPTION": {
        "FLAG_ROW": ("boolean", 0, None),
        "POLARIZATION_ID": ("int", 0, None),
        "SPECTRAL_WINDOW_ID": ("int", 0, None),
    },
    "FIELD": {
        "CODE": ("string", 0, None),
        "DELAY_DIR": ("double", 2, None),
        "FLAG_ROW": ("boolean", 0, None),
        "NAME": ("string", 0, None),
        "NUM_POLY": ("int", 0, None),
        "PHASE_DIR": ("double", 2, None),
        "REFERENCE_DIR": ("double", 2, None),
        "SOURCE_ID": ("int", 0, None),
        "TIME": ("double", 0, None),
    },
    "POLARIZATION": {
        "CORR_PRODUCT": ("int", 2, None),
        "CORR_TYPE": ("int", 1, None),
        "FLAG_ROW": ("boolean", 0, None),
        "NUM_CORR": ("int", 0, None),
    },
    "SPECTRAL_WINDOW": {
        "CHAN_FREQ": ("double", 1, None),
        "CHAN_WIDTH": ("double", 1, None),
        "EFFECTIVE_BW": ("double", 1, None),
        "FLAG_ROW": ("boolean", 0, None),
        "FREQ_GROUP": ("int", 0, None),
        "FREQ_GROUP_NAME": ("string", 0, None),
        "IF_CONV_CHAIN": ("int", 0, None),
        "MEAS_FREQ_REF": ("int", 0, None),
        "NAME": ("string", 0, None),
        "NET_SIDEBAND": ("int", 0, None),
        "NUM_CHAN": ("int", 0, None),
        "REF_FREQUENCY": ("double", 0, None),
        "RESOLUTION": ("double", 1, None),
        "TOTAL_BANDWIDTH": ("double", 0, None),
    },
}

# Standard subtables a complete-MS conversion writes (reference
# iterates the input's subtables, daskms/apps/convert.py:251-279;
# these are the ones with required presets above).
MS_SUBTABLES = ("ANTENNA", "DATA_DESCRIPTION", "FIELD",
                "POLARIZATION", "SPECTRAL_WINDOW")

# MAIN-table index columns stored on IncrementalStMan by the reference
# preset (daskms/descriptors/ms.py:22-31, descriptor():105-110) —
# run-length friendly for slowly-varying ids.
_MS_INDEX_COLS = ("ARRAY_ID", "DATA_DESC_ID", "FIELD_ID",
                  "OBSERVATION_ID", "PROCESSOR_ID", "SCAN_NUMBER",
                  "STATE_ID")


def _preset_entry(name: str, vt: str, ndim: int,
                  shape: tuple | None) -> dict:
    col = {"comment": f"{name} column (MS v2 preset)",
           "dataManagerGroup": "StandardStMan",
           "dataManagerType": "StandardStMan",
           "keywords": {}, "maxlen": 0, "option": 0,
           "valueType": vt}
    if ndim:
        col["ndim"] = ndim
        if shape is not None:
            col["shape"] = list(shape)
            col["option"] = 5
            col["dataManagerType"] = "TiledColumnStMan"
            col["dataManagerGroup"] = f"{name}Tiled"
    return col


@register_descriptor_builder("ms")
def ms_descriptor_builder(schema: StructType,
                          complex_cols: Iterable[str] = (),
                          subtable: str | None = None) -> dict:
    """MS preset builder (reference MSDescriptorBuilder,
    daskms/descriptors/ms.py:21-309): ``"ms"`` builds a MAIN-table
    descriptor, ``"ms('ANTENNA')"`` the named subtable's.

    Columns present in the frame keep their schema-derived physical
    descriptor (shape metadata, tiled managers) but take the canonical
    MS value type when the preset knows the column — in particular
    DATA-like interleaved float arrays become complex, and the fill
    step re-assembles them automatically.  Required preset columns
    ABSENT from the frame are added (variable-shape) so the created
    table is a complete MS skeleton; MAIN index columns go on
    IncrementalStMan per the reference preset.
    """
    from .casa import casa_table_descriptor

    table = (subtable or "MAIN").upper()
    try:
        preset = MS_PRESETS[table]
    except KeyError:
        raise ValueError(
            f"no MS preset for table {table!r}; known: "
            f"{sorted(MS_PRESETS)}") from None

    # complex preset columns carried as float arrays are complex data
    complex_cols = set(complex_cols)
    for f in schema.fields:
        spec = preset.get(f.name)
        if (spec and spec[0] in ("complex", "dcomplex")
                and isinstance(f.dataType, ArrayType)):
            complex_cols.add(f.name)

    desc = casa_table_descriptor(schema, complex_cols)
    for name, (vt, ndim, shape) in preset.items():
        if name in desc:
            d = desc[name]
            if vt in ("complex", "dcomplex") and name in complex_cols:
                # single-precision frames write complex, double write
                # dcomplex — keep what the schema derivation chose
                pass
            else:
                d["valueType"] = vt
        else:
            desc[name] = _preset_entry(name, vt, ndim, shape)
    if table == "MAIN":
        for name in _MS_INDEX_COLS:
            if name in desc and "shape" not in desc[name]:
                desc[name]["dataManagerGroup"] = "IndexingGroup"
                desc[name]["dataManagerType"] = "IncrementalStMan"
    return desc


@register_descriptor_builder("ratt_ms")
def ratt_ms_descriptor_builder(schema: StructType,
                               complex_cols: Iterable[str] = (),
                               subtable: str | None = None) -> dict:
    """RATT MS builder variant (reference
    daskms/descriptors/ratt_ms.py: the MS builder plus a fixed-up
    BITFLAG column): identical to ``"ms"`` except the MeerKAT-style
    integer bitflag columns, when the frame carries them, take the
    canonical int value type (a float/long-typed frame column would
    otherwise keep its schema-derived type).  BITFLAG is only fixed
    when PRESENT — the reference's ``_maybe_fix_column`` contract —
    so plain MS frames build byte-identical descriptors under either
    builder.
    """
    desc = ms_descriptor_builder(schema, complex_cols, subtable)
    if (subtable or "MAIN").upper() == "MAIN":
        for name in ("BITFLAG", "BITFLAG_ROW"):
            if name in desc and any(f.name == name
                                    for f in schema.fields):
                desc[name]["valueType"] = "int"
    return desc
