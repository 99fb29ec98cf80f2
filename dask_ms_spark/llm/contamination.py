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

from ..functions.text import portable_hash64
from ..session import ensure_parallelism
from .dedup import normalize_text

__all__ = ["contamination_report"]


def _raw_grams(text: Column, n: int) -> Column:
    """Character n-grams of normalised text, NOT deduplicated.

    Strings, not hashes: hashing happens *after* the explode so md5
    runs in whole-stage codegen (inside a higher-order ``transform``
    it is interpreted, ~10x slower — the explode-then-hash discipline
    of ``llm.dedup.minhash_table``).  No ``array_distinct`` either:
    per-doc dedup is O(|grams|^2) string compares *inside* the scan
    projection, and Catalyst's generate-filter inference
    (InferFiltersFromGenerate) can clone the whole chain into the
    scan filter — dedup happens post-explode on (id, hash) instead,
    where it is one partial-merged aggregation.

    Round-10 HOF audit: the text splits to a codepoint array once and
    each gram is an O(n) slice+join — ``substr(i, n)`` per window was
    O(len^2) (UTF8String walks bytes from offset 0 per call), and the
    expression-typed ``text`` (normalize_text's regex chain) now binds
    once instead of re-evaluating per gram."""
    from ..functions.vector import _bind_once

    def run(t, chars):
        count = F.size(chars) - F.lit(n - 1)
        return F.when(count <= 0, F.array(t)).otherwise(
            F.transform(F.sequence(F.lit(1), count),
                        lambda i: F.array_join(F.slice(chars, i, n),
                                               "")))

    return _bind_once(run, t=text, chars=F.split(text, ""))


def contamination_report(train: DataFrame, eval_docs: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 20,
                         min_hits: int = 1) -> DataFrame:
    """Per-train-document overlap with an eval corpus.

    Returns ``(doc_id, n_hits, n_grams, contamination)`` for train
    documents whose distinct character-``n``-gram shingles collide
    with the eval set at least ``min_hits`` times; ``contamination``
    is the collided fraction of the document's shingles.

    Plan shape: eval grams -> hash -> distinct -> broadcast.  Train
    side: explode raw grams, hash post-explode (codegen), dedup on
    (id, hash) with one partial-merged aggregation, mark eval hits
    with a broadcast LEFT join (map-side), then one count/sum per
    document.  The train corpus payload never shuffles — only
    (id, 8-byte hash) pairs move.
    """
    norm = normalize_text(F.col(text_col))
    eval_grams = (eval_docs
                  .select(F.explode(_raw_grams(norm, n)).alias("s"))
                  .select(portable_hash64(F.col("s")).alias("g"))
                  .distinct())
    deduped = (ensure_parallelism(train)
               .select(F.col(id_col),
                       F.explode(_raw_grams(norm, n)).alias("s"))
               .select(F.col(id_col),
                       portable_hash64(F.col("s")).alias("g"))
               .distinct())
    marked = deduped.join(
        F.broadcast(eval_grams.withColumn("__hit", F.lit(1))),
        "g", "left")
    report = (marked.groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                    .alias("n_hits")))
    return (report.where(F.col("n_hits") >= min_hits)
                  .select(id_col, "n_hits", "n_grams",
                          F.round(F.col("n_hits") / F.col("n_grams"), 6)
                           .alias("contamination")))
