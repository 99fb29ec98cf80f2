"""Train/eval contamination detection (decontamination).

A training-corpus operator with no reference analogue: before
training, every document that shares long n-gram shingles with a
benchmark/eval set must be found (and usually dropped) — otherwise
eval scores measure memorisation.  Standard practice is exact long
n-gram collision (e.g. the 13-word-gram rule of GPT-3's appendix, or
character-k-gram variants for tokeniser independence).

The 100 TB shape matters more than the operator itself: eval sets are
tiny (thousands of docs) while the train side is the corpus.  So the
eval shingle-hash set is built once, ``distinct``-ed, and
**broadcast**; the train side then never shuffles its payload — each
scan task hashes its shingles, probes the broadcast set map-side, and
only (doc_id, hit-count) aggregates move.  One wide scan, zero
train-side shuffle before the final partial-merged groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams, portable_hash64
from .dedup import normalize_text

__all__ = ["contamination_report"]


def _gram_hashes(text: Column, n: int) -> Column:
    """Distinct character-n-gram hashes of normalised text."""
    return F.array_distinct(F.transform(
        char_ngrams(normalize_text(text), n),
        lambda g: portable_hash64(g)))


def contamination_report(train: DataFrame, eval_docs: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 20,
                         min_hits: int = 1) -> DataFrame:
    """Per-train-document overlap with an eval corpus.

    Returns ``(doc_id, n_hits, n_grams, contamination)`` for train
    documents whose distinct character-``n``-gram shingles collide
    with the eval set at least ``min_hits`` times; ``contamination``
    is the collided fraction of the document's shingles.

    Plan shape: eval grams -> distinct -> broadcast; train grams
    probe it with a broadcast LEFT SEMI join (map-side, no train
    shuffle), then one partial-merged count per document.
    """
    eval_grams = (eval_docs
                  .select(F.explode(_gram_hashes(F.col(text_col), n))
                          .alias("g"))
                  .distinct())
    train_grams = train.select(
        F.col(id_col),
        F.size(_gram_hashes(F.col(text_col), n)).cast("long")
         .alias("n_grams"),
        F.explode(_gram_hashes(F.col(text_col), n)).alias("g"))
    hits = (train_grams
            .join(F.broadcast(eval_grams), "g", "left_semi")
            .groupBy(id_col, "n_grams")
            .agg(F.count(F.lit(1)).alias("n_hits")))
    return (hits.where(F.col("n_hits") >= min_hits)
                .select(id_col, "n_hits", "n_grams",
                        F.round(F.col("n_hits") / F.col("n_grams"), 6)
                         .alias("contamination")))
