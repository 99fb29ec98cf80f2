from .parquet import xds_from_parquet, xds_to_parquet, read_table
from .storage import (xds_from_storage_table, xds_to_storage_table,
                      infer_format, TableStore)
from .convert import convert_table, convert_store
