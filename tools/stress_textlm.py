#!/usr/bin/env python
"""10x scale-stress for the text-LM family (SCALE.md experiment #5).

``lm_perplexity`` and ``bm25_search`` carry the repo's only necessary
big-big shuffle joins (the bigram LM keyed on (w1, w2); postings and
doc-length keyed on doc_id/term).  This experiment measures their
scaling curve on the standard synthetic 10x corpus (10 id-shifted
copies of sf0.1 documents with copy-prefixed words — 10x the rows AND
~10x the vocabulary, so the LM table grows with the corpus the way a
real crawl's does), and profiles the (w1, w2) key distribution to
quantify stopword-bigram skew.

Usage: python tools/stress_textlm.py [sf_dir]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dask_ms_spark.session import get_spark  # noqa: E402


def build_10x(spark, sf_dir, out):
    docs = spark.read.parquet(os.path.join(sf_dir,
                                           "documents.parquet"))
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = []
    for c in range(10):
        prefix = chr(97 + c)
        copies.append(docs.select(
            (F.col("doc_id") + c * n).alias("doc_id"),
            F.regexp_replace("text", r"(\b\w)", prefix + r"$1")
             .alias("text"),
            "lang", "source"))
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.write.mode("overwrite").parquet(out)


def timed(label, make_df):
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s")
    return dt


def bm25(docs):
    """The registered bm25 shape (q_bm25_search) over a frame."""
    K1, B = 1.2, 0.75
    terms = ["spark", "merge", "vector"]
    tok = docs.select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
         .alias("term"))
    tf_all = (tok.groupBy("doc_id", "term")
                 .agg(F.count(F.lit(1)).alias("tf")).persist())
    dl = tf_all.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    consts = dl.agg(F.avg("dl").alias("avgdl"),
                    F.count(F.lit(1)).alias("n_docs"))
    tf = tf_all.where(F.col("term").isin(terms))
    df_ = F.broadcast(tf.groupBy("term")
                        .agg(F.count(F.lit(1)).alias("df")))
    return (tf.join(dl, "doc_id").join(df_, "term")
            .join(F.broadcast(consts))
            .withColumn("idf", F.log(
                (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0))
            .withColumn("score", F.col("idf") * F.col("tf") * (K1 + 1)
                        / (F.col("tf") + K1 * (1 - B + B * F.col("dl")
                                               / F.col("avgdl"))))
            .groupBy("doc_id").agg(F.sum("score").alias("score")))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-textlm", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from dask_ms_spark.llm.corpus import lm_perplexity

    ten_x = "/tmp/stress_textlm_10x.parquet"
    build_10x(spark, sf_dir, ten_x)
    docs1 = spark.read.parquet(os.path.join(sf_dir,
                                            "documents.parquet"))
    docs10 = spark.read.parquet(ten_x)
    print(f"rows: 1x={docs1.count()}, 10x={docs10.count()}")

    # --- bigram key-skew profile: how hot is the hottest LM key?
    toks = F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    grams = docs10.select(F.explode(F.expr(
        "transform(sequence(1, size(regexp_extract_all(lower(text), "
        "'[a-z]+', 0)) - 1), i -> struct("
        "element_at(regexp_extract_all(lower(text), '[a-z]+', 0), i) "
        "as w1, "
        "element_at(regexp_extract_all(lower(text), '[a-z]+', 0), i+1)"
        " as w2))")).alias("g")).select("g.w1", "g.w2")
    prof = (grams.groupBy("w1", "w2").count()
            .agg(F.max("count").alias("max_key"),
                 F.sum("count").alias("total"),
                 F.count(F.lit(1)).alias("n_keys")).collect()[0])
    print(f"bigram keys at 10x: n_keys={prof.n_keys} "
          f"total={prof.total} hottest={prof.max_key} "
          f"({100.0 * prof.max_key / prof.total:.3f}% of instances)")

    for name, fn in (
        ("lm_perplexity", lambda d: lm_perplexity(d)),
        ("bm25", bm25),
    ):
        spark.catalog.clearCache()
        t1 = timed(f"{name} 1x", lambda: fn(docs1))
        spark.catalog.clearCache()
        t10 = timed(f"{name} 10x", lambda: fn(docs10))
        print(f"{name}: 10x/1x wall ratio = {t10 / t1:.2f}")

    spark.stop()


if __name__ == "__main__":
    main()
