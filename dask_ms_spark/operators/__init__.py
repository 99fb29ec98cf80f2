from .bda import bda_factor, bda_average, flag_summary
from .grouping import group_metadata, update_write, column_update
from .joins import broadcast_lookup, star_join, semi_filter, anti_filter
from .ordering import (sorted_read, within_group_sort, attach_rowid,
                       group_rank, top_k)
from .overlay import (overlay, write_fragment, read_fragment, get_ancestry,
                      consolidate, rebase_fragment)
