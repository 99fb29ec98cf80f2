"""Distributed logistic-regression training — the lightweight
fasttext-style quality-classifier tier of an LLM curation pipeline
(train on heuristic or hand labels, score the whole corpus).  The
reference engine has no analogue; this extends the repo's
LLM-curation surface.

Batch gradient descent with the repo's engine-exact discipline
(cf. ``operators/calibration.py gain_solve``):

* weights live driver-side and bake into each iteration's plan as
  LITERALS — every iteration is one scan + ONE 1-row aggregate
  (map-side partial sums), nothing iterative ever shuffles;
* per-row gradient contributions are int64-quantised BEFORE the
  sum, so training is bit-deterministic under any shuffle order
  and mirrors engine-exactly in SQL;
* ``iters`` is a small constant and the collect is 1 row per
  iteration — bounded driver traffic by construction.

At 100 TB: each iteration is a full corpus scan (unavoidable for
batch GD) with a k-column aggregate; k = len(features) + 1 doubles
cross the wire per task.  Sub-sampling for the gradient is the
usual production lever and composes upstream (``sample_by_hash``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["logistic_train", "logistic_score"]


def logistic_train(df: DataFrame, feature_cols: list,
                   label_col: str, iters: int = 2, lr: float = 1.0,
                   quantize_scale: int = 1 << 20) -> list:
    """Train ``sigma(w0 + sum_j w_j x_j)`` against the 0/1
    ``label_col`` by ``iters`` full-batch GD steps from w = 0.
    Returns ``[w0, w1, ..., wk]`` (intercept first) as plain
    floats — bake them into scoring plans via
    :func:`logistic_score`.
    """
    if iters < 1:
        raise ValueError(f"logistic_train: iters must be >= 1, "
                         f"got {iters}")
    if lr <= 0:
        raise ValueError(f"logistic_train: lr must be > 0, got {lr}")
    if not feature_cols:
        raise ValueError("logistic_train: empty feature list")
    qs = float(quantize_scale)
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(iters):
        z = F.lit(w[0])
        for wj, xj in zip(w[1:], xs):
            z = z + F.lit(wj) * xj
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = y - p
        aggs = [F.count(F.lit(1)).alias("n"),
                F.sum(F.round(resid * F.lit(qs)).cast("long"))
                .alias("g0")]
        for j, xj in enumerate(xs):
            aggs.append(
                F.sum(F.round(resid * xj * F.lit(qs)).cast("long"))
                .alias(f"g{j + 1}"))
        row = df.agg(*aggs).first()
        n = float(row["n"])
        if n == 0:
            raise ValueError("logistic_train: empty input")
        w = [wj + lr * (row[f"g{j}"] / qs) / n
             for j, wj in enumerate(w)]
    return w


def logistic_score(df: DataFrame, feature_cols: list, weights: list,
                   out_col: str = "score") -> DataFrame:
    """Append ``out_col = sigma(w . x)`` — the trained weights bake
    in as literals, so scoring is a pure map over the scan."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"logistic_score: got {len(weights)} weights for "
            f"{len(feature_cols)} features (need intercept + one "
            f"per feature)")
    z = F.lit(float(weights[0]))
    for wj, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(wj)) * F.col(c).cast("double")
    return df.withColumn(out_col,
                         F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
