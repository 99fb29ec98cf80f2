"""Grouped statistical kernels over Arrow batches (reference §2.9).

The reference's UDF surface is "apply any numpy function to a chunk"
(daskms/dataset.py:332-346, README.rst:63-66: ``da.logical_not``) plus
numba kernels registered in the graph
(daskms/experimental/katdal/transpose.py:34-97).  The Spark-first
analogue is ``applyInPandas`` / ``pandas_udf``: the group's columns
arrive as one Arrow-backed pandas frame, the kernel is plain
numpy/pandas, and the output is a narrow typed frame.

Kernels here are written so a SQL oracle can mirror them exactly
(``grouped_ols`` == ``regr_slope``/``regr_intercept``): two-pass
mean-centred sums in float64 — numerically equivalent to the SQL
aggregates to ~1e-12 relative, far below oracle rounding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["grouped_ols"]

_OLS_SCHEMA = ("{keys}, n_events long, slope double, intercept double")


def grouped_ols(df: DataFrame, group_cols: list[str] | str,
                x_col: str, y_col: str,
                x_scale: float = 1.0) -> DataFrame:
    """Per-group ordinary-least-squares fit of ``y`` on ``x`` via
    ``applyInPandas`` — the grouped-kernel pattern for anything numpy
    can do that SQL aggregates can't (here they can, which is exactly
    what makes it oracle-checkable).

    ``x`` is re-based to the group minimum and divided by ``x_scale``
    (e.g. 3600 for per-hour slopes from second timestamps), which both
    engines mirror and which keeps the slope magnitude printable.
    Timestamps are converted to epoch seconds.  Each group must fit in
    one Arrow batch — fine for per-entity groups (the 100 TB shape:
    many small groups), wrong for a handful of giant groups.
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in keys)
    out_schema = _OLS_SCHEMA.format(keys=key_schema)
    is_ts = dict(df.dtypes)[x_col].startswith("timestamp")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col]
        if is_ts:
            # unit-explicit: Arrow may hand the kernel datetime64[ns]
            # or [us] depending on the transfer path; epoch |us| < 2^53
            # so the double is exact, matching SQL epoch()
            x = x.astype("datetime64[us]").astype("int64") / 1e6
        x = (x.astype("float64") - x.min()) / float(x_scale)
        y = pdf[y_col].astype("float64")
        xm, ym = x.mean(), y.mean()
        xc = x - xm
        sxx = (xc * xc).sum()
        slope = float((xc * (y - ym)).sum() / sxx) if sxx > 0 else 0.0
        row = {k: pdf[k].iloc[0] for k in keys}
        row.update(n_events=len(pdf), slope=slope,
                   intercept=float(ym - slope * xm))
        return pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandas(fit, out_schema)
