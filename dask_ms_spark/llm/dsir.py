"""DSIR-style importance resampling: select pretraining documents
whose hashed n-gram feature distribution looks like a target corpus
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — public).  The reference engine has no analogue; this is
part of the LLM-curation surface the repo adds on top of the dask-ms
data model.

Method: hash every token into ``n_buckets`` feature buckets, estimate
bucket unigram distributions for the raw corpus and the target corpus
(add-``smoothing`` estimates), and score each raw document by the sum
over its token occurrences of ``log p_target(b) - log p_raw(b)``.
High scores = "reads like the target".

Scale shape (the repo's standard text-plan invariants):

* payload text never shuffles — the explode emits (id, bucket) pairs,
  and the two distribution estimates are bucket-bounded aggregates
  (<= n_buckets rows each, regardless of corpus size);
* the per-bucket log-ratio table is joined back as a BROADCAST (it is
  at most ``n_buckets`` rows);
* per-bucket log-ratios are quantised to int64 (1e-6 steps) BEFORE the
  per-document sum, so the reduction is shuffle-order deterministic
  and cross-engine exact (the dyadic-sum rule used across the repo);
* resampling is a deterministic top-n with an id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


from ..session import ensure_parallelism
from ..functions.text import portable_hash64, tokens

__all__ = ["dsir_log_ratios", "dsir_weights", "dsir_resample"]

_Q = 1_000_000  # fixed-point quantisation for log-ratios


def _bucketed_tokens(docs: DataFrame, text_col: str, id_col: str,
                     n_buckets: int,
                     flag=None) -> DataFrame:
    """(id, bucket[, __tgt]) per token occurrence; text stays
    map-side.  ``flag`` optionally carries a boolean Column through
    the explode (the single-tokenize target path of
    :func:`dsir_weights`)."""
    toks = tokens(F.lower(F.col(text_col)))
    head = [F.col(id_col).alias("id")]
    if flag is not None:
        head.append(flag.alias("__tgt"))
    out = (ensure_parallelism(docs)
           .select(*head, F.explode(toks).alias("__tok")))
    keep = ["id"] + (["__tgt"] if flag is not None else [])
    return out.select(*keep, (portable_hash64(F.col("__tok"))
                              % F.lit(n_buckets)).alias("bucket"))


def dsir_log_ratios(raw: DataFrame, target: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = 8192,
                    smoothing: float = 1.0) -> DataFrame:
    """Per-bucket quantised importance log-ratio table:
    ``(bucket, lam_q)`` with ``lam_q = round(1e6 * (log p_target(b)
    - log p_raw(b)))`` under add-``smoothing`` estimates
    ``p(b) = (c_b + s) / (N + s * B)``.

    Both distribution estimates are bucket-bounded aggregates; the
    result is at most ``n_buckets`` rows — broadcast-sized by
    construction.
    """
    if n_buckets <= 0:
        raise ValueError(f"dsir: n_buckets must be > 0, got {n_buckets}")
    if smoothing <= 0:
        raise ValueError(f"dsir: smoothing must be > 0 (the estimator "
                         f"must cover unseen buckets), got {smoothing}")
    occ = _bucketed_tokens(raw, text_col, id_col, n_buckets)
    return _log_ratio_table(occ, target, text_col, id_col,
                            n_buckets, smoothing)


def _log_ratio_table(raw_occ: DataFrame, target: DataFrame,
                     text_col: str, id_col: str, n_buckets: int,
                     smoothing: float) -> DataFrame:
    """Build the (bucket, lam_q) table from an already-exploded
    raw (id, bucket) frame — lets callers that ALSO need the
    per-occurrence frame (dsir_weights) tokenize the corpus once."""
    s = float(smoothing)
    rc = (raw_occ.groupBy("bucket")
          .agg(F.count(F.lit(1)).alias("c_raw")))
    if target is None:
        # the raw occurrence frame already carries the target flag
        # (single-tokenize path): the target distribution is a
        # filtered aggregate of the SAME materialised explode,
        # instead of a second scan + tokenize of the target slice
        tc = (raw_occ.where(F.col("__tgt"))
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("c_tgt")))
    else:
        tc = (_bucketed_tokens(target, text_col, id_col, n_buckets)
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("c_tgt")))
    r_tot = rc.agg(F.sum("c_raw").alias("n_raw"))
    t_tot = tc.agg(F.sum("c_tgt").alias("n_tgt"))
    sb = F.lit(s * n_buckets)
    lam = (rc.join(tc, "bucket", "full_outer")
           .select("bucket",
                   F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
                   F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"))
           .crossJoin(F.broadcast(r_tot))
           .crossJoin(F.broadcast(t_tot))
           .select("bucket",
                   F.round(
                       (F.log((F.col("c_tgt") + F.lit(s))
                              / (F.col("n_tgt") + sb))
                        - F.log((F.col("c_raw") + F.lit(s))
                                / (F.col("n_raw") + sb)))
                       * F.lit(float(_Q))).cast("long")
                   .alias("lam_q")))
    return lam


def dsir_weights(raw: DataFrame, target: DataFrame | None = None,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 8192,
                 smoothing: float = 1.0,
                 target_pred=None) -> DataFrame:
    """Per-document importance scores against the target corpus:
    ``(id, n_tokens, log_weight)`` where ``log_weight`` is the sum of
    the quantised per-bucket log-ratios over the document's token
    occurrences, de-quantised back to a double.

    Documents with zero tokens are kept with ``n_tokens = 0`` and
    ``log_weight = 0`` (a no-evidence document is neither promoted
    nor demoted).

    Pass the target as EITHER ``target`` (a separate DataFrame —
    tokenized in its own pass) or ``target_pred`` (a boolean Column
    over ``raw`` rows — r12 optimization: when the target is a slice
    of the raw corpus, the predicate rides through the one
    materialised explode as a flag and the target distribution is a
    filtered aggregate of the same frame, identical to tokenizing
    ``raw.where(target_pred)`` separately but one tokenize pass
    cheaper).
    """
    if n_buckets <= 0:
        raise ValueError(f"dsir: n_buckets must be > 0, got {n_buckets}")
    if smoothing <= 0:
        raise ValueError(f"dsir: smoothing must be > 0 (the estimator "
                         f"must cover unseen buckets), got {smoothing}")
    if (target is None) == (target_pred is None):
        raise ValueError("dsir_weights: pass exactly one of target "
                         "(a DataFrame) or target_pred (a Column "
                         "over raw)")
    # tokenize the raw corpus ONCE: the exploded (id, bucket) frame
    # feeds both distribution estimates and the per-doc scoring
    # join (the repo's measured lineage-reuse rule)
    occ = _bucketed_tokens(raw, text_col, id_col, n_buckets,
                           flag=target_pred) \
        .localCheckpoint(eager=False)  # persist A/B-rejected r13 (1.06x)
    lam = _log_ratio_table(occ, target, text_col, id_col,
                           n_buckets, smoothing)
    scored = (occ.join(F.broadcast(lam), "bucket")
              .groupBy("id")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.sum("lam_q").alias("__lw_q")))
    ids = raw.select(F.col(id_col).alias("id")).distinct()
    return (ids.join(scored, "id", "left")
            .select("id",
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                    .alias("n_tokens"),
                    (F.coalesce("__lw_q", F.lit(0)) / F.lit(float(_Q)))
                    .alias("log_weight")))


def dsir_resample(raw: DataFrame, target: DataFrame, n: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_buckets: int = 8192,
                  smoothing: float = 1.0,
                  per_token: bool = False) -> DataFrame:
    """Deterministic top-``n`` selection by importance score
    (``per_token=True`` ranks by score per token, removing the
    length bias).  Ties break on id, so the selection is stable
    across runs and engines; the sort is a global top-n
    (TakeOrdered — no full-sort shuffle)."""
    if n <= 0:
        raise ValueError(f"dsir_resample: n must be > 0, got {n}")
    w = dsir_weights(raw, target, text_col, id_col, n_buckets,
                     smoothing)
    score = (F.col("log_weight")
             / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
             if per_token else F.col("log_weight"))
    return (w.withColumn("score", score)
            .orderBy(F.col("score").desc(), F.col("id"))
            .limit(n))
