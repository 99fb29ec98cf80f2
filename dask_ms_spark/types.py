"""Type system: CASA <-> Spark SQL mapping, complex + tensor encodings.

Mirrors the reference's CASA<->numpy map (daskms/columns.py:15-54) and
its parquet complex/tensor encoding (ComplexType = pa.list_(subtype, 2),
TensorType = pa.list_(dtype) with fixed stride —
daskms/experimental/arrow/extension_types.py:54-207).

Conventions:
* complex64/complex128 columns -> ``ArrayType(Float/DoubleType)`` with
  re/im interleaved, stride 2: ``[re0, im0, re1, im1, ...]``.
* N-d tensor columns -> flat ``ArrayType`` + ``dims``/``shape`` entries
  in the Spark ``StructField.metadata`` (the reference keeps dims in
  hand-maintained schema dicts, daskms/table_schemas.py:35-126).
* every engine-managed table may carry a ``ROWID`` LongType column, the
  analogue of the reference's ROWID coordinate (daskms/reads.py:227).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "CASA_TO_SPARK",
    "SPARK_TO_CASA",
    "ROWID",
    "DIMS_KEY",
    "SHAPE_KEY",
    "PARTITION_KEY",
    "MS_DIM_SCHEMAS",
    "infer_ms_table",
    "ms_column_dims",
    "complex_array_type",
    "tensor_field",
    "field_dims",
    "field_shape",
]

# The reference's ROWID coordinate name (daskms/reads.py:227).
ROWID = "ROWID"

# StructField.metadata keys for tensor columns.
DIMS_KEY = "dask_ms_spark.dims"
SHAPE_KEY = "dask_ms_spark.shape"

# Partition-key table property, mirroring DASKMS_PARTITION_KEY
# (daskms/constants.py:1, round-tripped in
# daskms/experimental/arrow/writes.py:33-57 / reads.py:108-127).
PARTITION_KEY = "dask_ms_spark.partition_key"

# CASA value type -> Spark SQL type (daskms/columns.py:15-54).  Spark has
# no unsigned integers, so each unsigned type widens one rank.
CASA_TO_SPARK: dict[str, DataType] = {
    "BOOL": BooleanType(),
    "BOOLEAN": BooleanType(),
    "BYTE": ShortType(),
    "UCHAR": ShortType(),
    "SMALLINT": ShortType(),
    "SHORT": ShortType(),
    "USMALLINT": IntegerType(),
    "USHORT": IntegerType(),
    "INT": IntegerType(),
    "INTEGER": IntegerType(),
    "UINT": LongType(),
    "UINTEGER": LongType(),
    "FLOAT": FloatType(),
    "DOUBLE": DoubleType(),
    # complex -> interleaved re/im array, stride 2 (the reference's own
    # parquet mapping, extension_types.py:178-200)
    "FCOMPLEX": ArrayType(FloatType()),
    "COMPLEX": ArrayType(FloatType()),
    "DCOMPLEX": ArrayType(DoubleType()),
    "STRING": StringType(),
}

SPARK_TO_CASA: dict[str, str] = {
    "boolean": "BOOL",
    "short": "SHORT",
    "integer": "INT",
    "long": "UINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "STRING",
}


def complex_array_type(double: bool = False) -> ArrayType:
    """Spark type encoding a complex tensor: interleaved re/im floats."""
    return ArrayType(DoubleType() if double else FloatType())


def tensor_field(name: str, element: DataType, dims: tuple[str, ...],
                 shape: tuple[int, ...] | None = None,
                 nullable: bool = True) -> StructField:
    """A flat-array tensor column with dims/shape recorded in metadata.

    Reference analogue: column dim schemas in daskms/table_schemas.py
    plus fixed shapes from column descriptors (daskms/columns.py:171-180).
    """
    metadata: dict = {DIMS_KEY: list(dims)}
    if shape is not None:
        metadata[SHAPE_KEY] = list(shape)
    return StructField(name, ArrayType(element), nullable, metadata=metadata)


def field_dims(field: StructField) -> tuple[str, ...] | None:
    dims = (field.metadata or {}).get(DIMS_KEY)
    return tuple(dims) if dims is not None else None


def field_shape(field: StructField) -> tuple[int, ...] | None:
    shape = (field.metadata or {}).get(SHAPE_KEY)
    return tuple(shape) if shape is not None else None


def with_tensor_metadata(schema: StructType,
                         dims: dict[str, tuple[str, ...]],
                         shapes: dict[str, tuple[int, ...]] | None = None) -> StructType:
    """Return a copy of ``schema`` with dims/shape metadata applied."""
    shapes = shapes or {}
    fields = []
    for f in schema.fields:
        if f.name in dims:
            fields.append(tensor_field(f.name, f.dataType.elementType
                                       if isinstance(f.dataType, ArrayType)
                                       else f.dataType,
                                       dims[f.name], shapes.get(f.name),
                                       f.nullable))
        else:
            fields.append(f)
    return StructType(fields)


# ---------------------------------------------------------------------
# MS v2.0 column dimension schemas (the PUBLIC Measurement Set
# definition, casacore Note/Memo 229; reference analogue: the
# hand-maintained dim dicts of daskms/table_schemas.py:35-126 looked
# up by table-name suffix).  Dims name the CELL axes (per row); a
# complex column's interleave rides the flat encoding, not the dims.

MS_DIM_SCHEMAS: dict[str, dict[str, tuple[str, ...]]] = {
    "MAIN": {
        "UVW": ("uvw",),
        "UVW2": ("uvw",),
        "DATA": ("chan", "corr"),
        "FLOAT_DATA": ("chan", "corr"),
        "SIGMA": ("corr",),
        "SIGMA_SPECTRUM": ("chan", "corr"),
        "WEIGHT": ("corr",),
        "WEIGHT_SPECTRUM": ("chan", "corr"),
        "FLAG": ("chan", "corr"),
        "FLAG_CATEGORY": ("flagcat", "chan", "corr"),
        "MODEL_DATA": ("chan", "corr"),
        "CORRECTED_DATA": ("chan", "corr"),
        "IMAGING_WEIGHT": ("chan",),
        "IMAGING_WEIGHT_SPECTRUM": ("chan", "corr"),
    },
    "ANTENNA": {
        "POSITION": ("xyz",),
        "OFFSET": ("xyz",),
    },
    "FEED": {
        "BEAM_OFFSET": ("receptors", "radec"),
        "POLARIZATION_TYPE": ("receptors",),
        "POL_RESPONSE": ("receptors", "receptors-2"),
        "POSITION": ("xyz",),
        "RECEPTOR_ANGLE": ("receptors",),
    },
    "FIELD": {
        "DELAY_DIR": ("field-poly", "field-dir"),
        "PHASE_DIR": ("field-poly", "field-dir"),
        "REFERENCE_DIR": ("field-poly", "field-dir"),
    },
    "OBSERVATION": {
        "LOG": ("log",),
        "SCHEDULE": ("schedule",),
        "TIME_RANGE": ("obs-exts",),
    },
    "POINTING": {
        "DIRECTION": ("point-poly", "radec"),
        "ENCODER": ("radec",),
        "POINTING_OFFSET": ("point-poly", "radec"),
        "SOURCE_OFFSET": ("point-poly", "radec"),
        "TARGET": ("point-poly", "radec"),
    },
    "POLARIZATION": {
        "CORR_TYPE": ("corr",),
        "CORR_PRODUCT": ("corr", "corrprod_idx"),
    },
    "SOURCE": {
        "DIRECTION": ("radec",),
        "POSITION": ("position",),
        "PROPER_MOTION": ("radec-per-sec",),
        "REST_FREQUENCY": ("lines",),
        "SYSVEL": ("lines",),
        "TRANSITION": ("lines",),
    },
    "SPECTRAL_WINDOW": {
        "CHAN_FREQ": ("chan",),
        "CHAN_WIDTH": ("chan",),
        "EFFECTIVE_BW": ("chan",),
        "RESOLUTION": ("chan",),
    },
}


def infer_ms_table(path: str) -> str | None:
    """Guess the MS (sub)table type from a table path — the
    reference's suffix lookup (daskms/table_schemas.py
    infer_table_type): a ``::SUBTABLE`` url suffix or a trailing
    path component naming a standard subtable selects that schema; a
    ``.ms``-suffixed component is the MAIN table; anything else is a
    plain table (no dims known -> None)."""
    name = path.rstrip("/")
    if "::" in name:
        tail = name.rsplit("::", 1)[1].upper()
    else:
        tail = name.rsplit("/", 1)[-1].upper()
    if tail in MS_DIM_SCHEMAS:
        return tail
    if tail.endswith(".MS"):
        return "MAIN"
    return None


def ms_column_dims(table: str | None, column: str,
                   cell_ndim: int) -> tuple[str, ...]:
    """Dim names for a column's cell axes: the MS schema entry when
    the table knows the column at this rank, else the reference's
    auto-generated ``{column}-{i}`` names
    (daskms/table_schemas.py:128-186)."""
    dims = MS_DIM_SCHEMAS.get(table or "", {}).get(column)
    if dims is not None and len(dims) == cell_ndim:
        return dims
    return tuple(f"{column}-{i + 1}" for i in range(cell_ndim))
