"""dask-ms-spark: a PySpark-native engine with the query and
data-processing capabilities of ratt-ru/dask-ms (reference at
/root/reference, v0.2.32).

The reference exposes CASA Measurement Set tables as lists of lazy
datasets (daskms/dask_ms.py:128-294); here the same surface is a thin
facade over Spark DataFrames: Catalyst supplies pushdown, pruning,
codegen and shuffle planning, and the engine adds the dataset-list
API, tensor/complex column conventions, fragment overlays, format
conversion, plus corpus-scale extensions (dedup, similarity search,
text analysis, multimodal plumbing, streaming).
"""

from .session import get_spark, stop_spark
from .dataset import Dataset, partition_datasets, concat
from .expressions import data_column_expr, apply_expr
from .types import (CASA_TO_SPARK, SPARK_TO_CASA, ROWID,
                    complex_array_type, tensor_field)
from .sources.parquet import xds_from_parquet, xds_to_parquet, read_table
from .sources.storage import (xds_from_storage_table, xds_to_storage_table,
                              infer_format, TableStore)
from .sources.convert import convert_table, convert_store
from .sources.casa import xds_from_ms, MS_GROUP_COLS, MS_INDEX_COLS

# Reference-parity aliases: the reference's primary entry points are
# xds_from_table / xds_to_table (daskms/dask_ms.py:18-294); here the
# storage-dispatched pair is the same surface.
xds_from_table = xds_from_storage_table
xds_to_table = xds_to_storage_table

# Fragment entry points under their reference names
# (daskms/experimental/fragments/__init__.py:154-237): accept a
# Dataset or a plain DataFrame like the other writers.
from .operators.overlay import (get_ancestry, read_fragment,  # noqa: E402
                                write_fragment)


def xds_to_table_fragment(xds, store: str, parent: str, **kw) -> None:
    df = xds.df if isinstance(xds, Dataset) else xds
    return write_fragment(df, store, parent, **kw)


def xds_from_table_fragment(spark, store: str, **kw) -> list[Dataset]:
    return [Dataset(read_fragment(spark, store, **kw), {})]

from .cache import cache_scope, release_caches, scoped_persist  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "cache_scope", "release_caches", "scoped_persist",
    "get_spark", "stop_spark", "Dataset", "partition_datasets", "concat",
    "data_column_expr", "apply_expr", "CASA_TO_SPARK", "SPARK_TO_CASA",
    "ROWID", "complex_array_type", "tensor_field", "xds_from_parquet",
    "xds_to_parquet", "read_table", "xds_from_storage_table",
    "xds_to_storage_table", "infer_format", "TableStore", "convert_table",
    "convert_store", "xds_from_ms", "MS_GROUP_COLS", "MS_INDEX_COLS",
    "xds_from_table", "xds_to_table", "xds_to_table_fragment",
    "xds_from_table_fragment", "get_ancestry",
]
