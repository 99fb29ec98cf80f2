#!/usr/bin/env python
"""Structural guard for the HOF lambda re-expansion class (r9 review,
r9 verdict item 1).

Catalyst subexpression elimination stops at lambda scopes: an
expression referenced inside a ``transform`` / ``zip_with`` /
``aggregate`` lambda body re-evaluates PER ELEMENT.  A kernel that
folds or slices an O(n) subexpression n times is therefore O(n^2) —
invisible to plan_audit (expression-level, not a plan node) and to
the narrow sf testdata (64-channel / 200-char rows), catastrophic at
the reference's own big_ms stress shape (4096 channels,
daskms/conftest.py:35-86) and on multi-KB documents.

The r9 ``_bind_once`` fixes were point-wise; this harness makes the
class structural:

1. **Completeness**: every public Column-returning kernel in
   ``functions/{vector,text,complexf}.py`` and ``llm/dedup.py``
   (enumerated by AST scan, so new kernels are picked up
   automatically) MUST have a wide-fixture invocation registered in
   ``INVOCATIONS`` below — adding a kernel without one fails pytest.
2. **Wall budget**: each invocation runs on a purpose-built wide
   fixture (4096-element arrays / 64 KB documents) with
   EXPRESSION-typed array inputs — an O(n) expression per input, so
   a kernel that fails to bind an input before using it inside a
   lambda goes quadratic — under a per-kernel wall budget enforced
   by job-group cancellation.  Bound kernels finish in well under
   half the budget; a re-expanded kernel overshoots it by orders of
   magnitude (measured 40x for the derived-scalar ``normalize``
   class and 233x for ``spectral_moments`` input binding at 2048
   channels).
3. **Negative controls**: deliberately unbound twins of
   ``spectral_moments`` (unbound INPUT) and ``normalize`` (unbound
   DERIVED scalar — binding the input does not help; the O(n) fold
   rebuilt from the bound input inside the lambda still re-expands)
   must BLOW the budget, proving the harness separates the classes
   on this host rather than rubber-stamping.
4. **Advisory scan**: nested HOFs inside lambda bodies are reported
   (not failed — bounded per-element windows are legitimate).

Usage:
    python tools/audit_hof.py              # full audit + report
    python tools/audit_hof.py --controls   # negative controls only

pytest wiring: tests/test_hof_audit.py runs the completeness check,
the budget sweep, and one negative control per class.
"""

from __future__ import annotations

import ast
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import Column  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# ---------------------------------------------------------------- shapes
WIDTH = 4096          # vector elements — the big_ms channel count
N_CPLX = WIDTH // 2   # complex channels in an interleaved array
DOC_BYTES = 64 * 1024
N_ROWS_VEC = 1000
N_ROWS_TXT = 120
BUDGET_S = 20.0       # per-kernel wall budget on the wide fixture
# phase_rotate bakes one literal per channel into the plan; audit it
# at a narrower comb so plan construction stays cheap while the
# per-element re-expansion (which scales with data width) would
# still overshoot: 512 channels quadratic ~= 30s+ vs ~1s bound.
PHASE_CHANNELS = 512

KERNEL_SOURCES = {
    "vector": "dask_ms_spark/functions/vector.py",
    "text": "dask_ms_spark/functions/text.py",
    "complexf": "dask_ms_spark/functions/complexf.py",
    "dedup": "dask_ms_spark/llm/dedup.py",
}


def exported_kernels() -> dict[str, list[str]]:
    """Public module-level functions with a Column return annotation,
    per module — the enumeration the completeness check runs on."""
    out = {}
    for mod, rel in KERNEL_SOURCES.items():
        tree = ast.parse(open(os.path.join(ROOT, rel)).read())
        names = []
        for node in tree.body:
            if isinstance(node, ast.FunctionDef) \
                    and not node.name.startswith("_"):
                ret = getattr(node, "returns", None)
                if ret is not None and ast.unparse(ret) == "Column":
                    names.append(node.name)
        out[mod] = names
    return out


# ------------------------------------------------------------- fixtures
def wide_vector_df(spark):
    """1000 rows of deterministic 4096-wide arrays + masks + scalars.
    Persisted so fixture construction is excluded from kernel time."""
    df = spark.range(N_ROWS_VEC).select(
        "id",
        F.transform(F.sequence(F.lit(1), F.lit(WIDTH)),
                    lambda i: ((F.col("id") + i) % 97).cast("double")
                    + 1.0).alias("v"),
        F.transform(F.sequence(F.lit(1), F.lit(WIDTH)),
                    lambda i: ((F.col("id") * 3 + i) % 89).cast("double")
                    + 1.0).alias("v2"),
        F.transform(F.sequence(F.lit(1), F.lit(WIDTH)),
                    lambda i: (F.col("id") + i) % 7 != 0).alias("m"),
        F.transform(F.sequence(F.lit(1), F.lit(2 * PHASE_CHANNELS)),
                    lambda i: ((F.col("id") + i) % 83).cast("double")
                    / 41.0 - 1.0).alias("ph"),
        F.transform(F.sequence(F.lit(1), F.lit(8)),
                    lambda i: ((F.col("id") + i) % 13).cast("double")
                    - 6.0).alias("corr8"),
        ((F.col("id") % 100).cast("double") / 50.0 - 1.0).alias("sc"))
    df = df.persist()
    df.count()
    return df


def wide_text_df(spark):
    """120 rows of ~64 KB deterministic documents."""
    sent = ("the quick brown fox jumps over the lazy dog while "
            "radio interferometers average visibilities across "
            "channels and correlators emit spectral windows ")
    reps = DOC_BYTES // len(sent) + 1
    df = spark.range(N_ROWS_TXT).select(
        "id",
        F.concat(F.concat_ws(" ", F.lit("doc"),
                             F.col("id").cast("string")),
                 F.lit(" "),
                 F.repeat(F.lit(sent), reps)).alias("text"))
    df = df.persist()
    df.count()
    return df


def _ex(c: Column) -> Column:
    """Wrap an array column as an O(n) EXPRESSION (identity transform)
    so any kernel that re-evaluates an unbound input inside a lambda
    body goes quadratic instead of merely re-reading a column."""
    return F.transform(c, lambda x: x)


def _exs(c: Column) -> Column:
    """Cheap non-trivial scalar expression input."""
    return c * 1.0 + 0.0


# ----------------------------------------------------- invocation table
def _invocations():
    from dask_ms_spark.functions import complexf as cf
    from dask_ms_spark.functions import text as tx
    from dask_ms_spark.functions import vector as vec
    from dask_ms_spark.llm import dedup as dd

    # (rank, a, b, count) rows, the learn_bpe_merges output shape
    bpe_merges = [(i, a, b, 100 - i) for i, (a, b) in enumerate(
        [("t", "h"), ("th", "e"), ("a", "n"),
         ("an", "d"), ("o", "v"), ("e", "r")])]
    import math
    xs = [100.0 + 0.5 * i for i in range(WIDTH)]
    freqs = [1.0e9 + 1.0e6 * k for k in range(PHASE_CHANNELS)]
    del math

    c = F.col
    return {
        # ---- vector (fixture: wide_vector_df) --------------------
        "vector.dot": lambda: vec.dot(_ex(c("v")), _ex(c("v2"))),
        "vector.norm": lambda: vec.norm(_ex(c("v"))),
        "vector.cosine": lambda: vec.cosine(_ex(c("v")), _ex(c("v2"))),
        "vector.l2_distance":
            lambda: vec.l2_distance(_ex(c("v")), _ex(c("v2"))),
        "vector.normalize": lambda: vec.normalize(_ex(c("v"))),
        "vector.masked_bin_average":
            lambda: vec.masked_bin_average(_ex(c("v")), _ex(c("m")), 64),
        "vector.weighted_bin_average":
            lambda: vec.weighted_bin_average(_ex(c("v")), _ex(c("v2")),
                                             64),
        "vector.masked_bin_average_dyn":
            lambda: vec.masked_bin_average_dyn(_ex(c("v")), _ex(c("m")),
                                               F.lit(32) + F.lit(32)),
        "vector.log_log_fit": lambda: vec.log_log_fit(_ex(c("v")), xs),
        "vector.channel_regrid":
            lambda: vec.channel_regrid(_ex(c("v")), _exs(c("sc")),
                                       WIDTH),
        "vector.spectral_moments":
            lambda: vec.spectral_moments(_ex(c("v")), _ex(c("m"))),
        "vector.hanning_smooth": lambda: vec.hanning_smooth(_ex(c("v"))),
        "vector.uvcontsub": lambda: vec.uvcontsub(_ex(c("v")),
                                                  _ex(c("m"))),
        # ---- complexf (fixture: wide_vector_df; interleaved) ------
        "complexf.c_make": lambda: cf.c_make(_ex(c("v")), _ex(c("v2"))),
        "complexf.c_add": lambda: cf.c_add(_ex(c("v")), _ex(c("v2"))),
        "complexf.c_sub": lambda: cf.c_sub(_ex(c("v")), _ex(c("v2"))),
        "complexf.c_mul": lambda: cf.c_mul(_ex(c("v")), _ex(c("v2"))),
        "complexf.c_conj": lambda: cf.c_conj(_ex(c("v"))),
        "complexf.c_scale": lambda: cf.c_scale(_ex(c("v")), _exs(c("sc"))),
        "complexf.c_abs2": lambda: cf.c_abs2(_ex(c("v"))),
        "complexf.c_abs": lambda: cf.c_abs(_ex(c("v"))),
        "complexf.c_real": lambda: cf.c_real(_ex(c("v"))),
        "complexf.c_imag": lambda: cf.c_imag(_ex(c("v"))),
        "complexf.c_sum": lambda: cf.c_sum(_ex(c("v"))),
        "complexf.c_expand_mask": lambda: cf.c_expand_mask(_ex(c("m"))),
        "complexf.phase_rotate":
            lambda: cf.phase_rotate(_ex(c("ph")), _exs(c("sc")),
                                    _exs(c("sc")), _exs(c("sc")),
                                    0.05, -0.08, freqs),
        "complexf.stokes_from_corrs":
            lambda: cf.stokes_from_corrs(_ex(c("corr8"))),
        "complexf.corrs_from_stokes":
            lambda: cf.corrs_from_stokes(_ex(c("corr8"))),
        # ---- text (fixture: wide_text_df) --------------------------
        "text.portable_hash64": lambda: tx.portable_hash64(c("text")),
        "text.tokens": lambda: tx.tokens(c("text")),
        "text.token_count": lambda: tx.token_count(c("text")),
        "text.char_ngrams": lambda: tx.char_ngrams(c("text"), 3),
        "text.word_shingles": lambda: tx.word_shingles(c("text"), 3),
        "text.langid_scores": lambda: F.struct(
            *[v.alias(k) for k, v in
              sorted(tx.langid_scores(c("text")).items())]),
        "text.langid": lambda: tx.langid(c("text")),
        "text.quality_features": lambda: F.struct(
            *[v.alias(k) for k, v in
              sorted(tx.quality_features(c("text")).items())]),
        "text.fingerprint": lambda: tx.fingerprint(c("text")),
        "text.stopword_ratio": lambda: tx.stopword_ratio(c("text")),
        "text.bpe_tokens": lambda: tx.bpe_tokens(c("text")),
        "text.bpe_token_count": lambda: tx.bpe_token_count(c("text")),
        "text.apply_bpe_merges":
            lambda: tx.apply_bpe_merges(c("text"), bpe_merges),
        # ---- llm.dedup Column helpers (fixture: wide_text_df) ------
        "dedup.normalize_text": lambda: dd.normalize_text(c("text")),
        "dedup.shingle_base_hashes":
            lambda: dd.shingle_base_hashes(c("text"), 5),
        "dedup.minhash_signature":
            lambda: dd.minhash_signature(c("text"), 32, 5),
        "dedup.minhash_from_base":
            lambda: dd.minhash_from_base(
                dd.shingle_base_hashes(c("text"), 5), 32),
        "dedup.simhash": lambda: dd.simhash(c("text"), 4, 60),
    }


def invocations():
    """name -> (fixture_kind, column_thunk)."""
    inv = _invocations()
    return {k: ("text" if k.split(".")[0] in ("text", "dedup")
                else "vector", fn) for k, fn in inv.items()}


# --------------------------------------------- DataFrame-op audit
# Explode-based document operators are outside the Column-kernel
# enumeration but carry the same quadratic classes (the r10 audit
# found post-explode ``substr(pos, w)`` — an O(pos) byte walk per
# window, O(len^2) per document — in substring_dedup and
# chunk_documents).  Curated list (no return-type rule separates
# kernels from orchestrators here); each runs on the wide text
# fixture under the same budget.
DF_BUDGET_S = 20.0


def df_ops():
    from dask_ms_spark.functions import text as tx
    from dask_ms_spark.llm import corpus, dedup

    def with_id(df):
        return df.select(F.col("id").alias("doc_id"), "text")

    return {
        "corpus.substring_dedup":
            lambda df: corpus.substring_dedup(with_id(df)),
        "corpus.chunk_documents":
            lambda df: corpus.chunk_documents(with_id(df)),
        "corpus.char_entropy":
            lambda df: corpus.char_entropy(with_id(df)),
        "dedup.exact_dedup":
            lambda df: dedup.exact_dedup(with_id(df)),
        "dedup.with_minhash":
            lambda df: dedup.with_minhash(with_id(df)),
        "dedup.with_simhash":
            lambda df: dedup.with_simhash(with_id(df)),
        "text.with_fingerprint":
            lambda df: tx.with_fingerprint(with_id(df)),
    }


def neg_substring_dedup_substr(df):
    """The pre-r10 substring_dedup spelling: window text via
    ``substr(pos, w)`` POST-explode — each call walks pos bytes, so a
    document costs O(len^2 / stride)."""
    from dask_ms_spark.functions.text import portable_hash64
    from dask_ms_spark.session import ensure_parallelism

    window, stride = 40, 10
    t = F.col("text")
    n = F.length(t)
    starts = F.when(n <= window, F.array(F.lit(1))).otherwise(
        F.sequence(F.lit(1), n - F.lit(window) + 1, F.lit(stride)))
    hashed = (ensure_parallelism(
        df.select(F.col("id").alias("doc_id"), "text"))
        .select(F.col("doc_id").alias("id"), t.alias("t"),
                F.explode(starts).alias("pos"))
        .select("id", portable_hash64(
            F.col("t").substr(F.col("pos"), F.lit(window)))
            .alias("wh"))
        .distinct())
    per_hash = hashed.groupBy("wh").agg(F.count(F.lit(1)).alias("nd"))
    return hashed.join(per_hash, "wh")         .groupBy("id").agg(F.count(F.lit(1)).alias("n"))


DF_NEGATIVE_CONTROLS = {
    "neg.substring_dedup_substr": neg_substring_dedup_substr,
}


def run_df_with_budget(spark, out_df, budget_s: float = DF_BUDGET_S):
    """Force a full noop write of ``out_df`` in a cancellable job
    group; returns (completed, elapsed_s, err)."""
    from pyspark import InheritableThread

    # a driver GC fires Spark's ContextCleaner, releasing broadcast/
    # shuffle blocks accumulated by earlier audit jobs — without it a
    # long sweep in one JVM pays rising heap pressure and late ops
    # blow their budgets for reasons unrelated to their own plan
    # (the bench.py discipline)
    jvm_system = getattr(getattr(spark, "_jvm", None), "System", None)
    if jvm_system is not None:
        jvm_system.gc()
    group = f"hof_audit_df_{time.monotonic_ns()}"
    state: dict = {}

    def work():
        try:
            spark.sparkContext.setJobGroup(group, "hof df audit",
                                           interruptOnCancel=True)
            t0 = time.monotonic()
            out_df.write.format("noop").mode("overwrite").save()
            state["t"] = time.monotonic() - t0
        except Exception as e:
            state["err"] = e

    t = InheritableThread(target=work)
    t.daemon = True
    start = time.monotonic()
    t.start()
    t.join(budget_s)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        t.join(30.0)
        _drain_cancelled(spark)
        return False, time.monotonic() - start, None
    if "err" in state:
        return False, time.monotonic() - start, state["err"]
    return True, state["t"], None


# ---------------------------------------------------- host calibration
# Budgets are wall-clock, so a contended host (another Spark suite on
# the same 32 cores) inflates every measurement uniformly and would
# false-fail the sweep.  A quick reference run of a known-bound
# kernel scales the budgets: steady state for vector.norm on the
# wide fixture is ~0.2 s; the factor is clamped to [1, 6] so a
# pathological host still cannot let a 40x quadratic pass.
NORM_STEADY_S = 0.25


def host_factor(spark, vdf) -> float:
    from dask_ms_spark.functions import vector as vec

    best = None
    for _ in range(2):
        t0 = time.monotonic()
        vdf.select(F.xxhash64(vec.norm(F.col("v"))).alias("h"))             .agg(F.sum(F.col("h").cast("double"))).collect()
        t1 = time.monotonic() - t0
        best = t1 if best is None else min(best, t1)
    return max(1.0, min(best / NORM_STEADY_S, 6.0))


# ------------------------------------------------------ negative controls
def neg_spectral_moments_unbound(v, m):
    """The PRE-r9 spelling of spectral_moments: per-index
    ``element_at`` over the EXPRESSION inputs inside the fold lambdas
    — every element access re-evaluates the O(n) input expression, so
    the moments cost O(n^2) per row.  (A zip_with over the inputs
    would NOT reproduce the bug: HOF *targets* evaluate once; only
    references inside lambda BODIES re-expand.)"""
    idx = F.sequence(F.lit(1), F.size(v))
    w = F.aggregate(
        idx, F.lit(0.0),
        lambda a, i: a + F.when(F.element_at(m, i),
                                F.element_at(v, i))
        .otherwise(F.lit(0.0)))
    mom1 = F.aggregate(
        idx, F.lit(0.0),
        lambda a, i: a + F.when(F.element_at(m, i),
                                F.element_at(v, i) * i.cast("double"))
        .otherwise(F.lit(0.0)))
    return F.struct((w / F.size(v)).alias("mean_w"),
                    F.when(w != 0, mom1 / w).alias("centroid"))


def neg_normalize_unbound(v):
    """The PRE-round-10 spelling of normalize: the derived O(n) norm
    fold is referenced inside the transform lambda — re-evaluated per
    element, O(n^2) even when the INPUT is a plain column."""
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


NEGATIVE_CONTROLS = {
    "neg.spectral_moments_unbound":
        lambda: neg_spectral_moments_unbound(
            _ex(F.col("v")), _ex(F.col("m"))),
    "neg.normalize_unbound":
        lambda: neg_normalize_unbound(_ex(F.col("v"))),
}


def _drain_cancelled(spark, timeout_s: float = 90.0) -> None:
    """Wait for the JVM to actually stop burning a cancelled job's
    tasks: cancelJobGroup interrupts, but whole-stage-codegen loops
    only notice at row boundaries, and a deliberately-quadratic row
    takes a while to reach one — anything measured while those
    threads still spin is contended and meaningless."""
    tracker = spark.sparkContext.statusTracker()
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        if not tracker.getActiveJobsIds():
            return
        time.sleep(0.5)


# ------------------------------------------------------------ the runner
def run_with_budget(spark, df, col, budget_s: float = BUDGET_S):
    """Force full evaluation of ``col`` over ``df`` in a cancellable
    job group; returns (completed, elapsed_s, err).  ``xxhash64``
    serialises the whole result value, so every array element is
    computed (``size`` alone would not evaluate elements)."""
    from pyspark import InheritableThread

    # a driver GC fires Spark's ContextCleaner, releasing broadcast/
    # shuffle blocks accumulated by earlier audit jobs — without it a
    # long sweep in one JVM pays rising heap pressure and late ops
    # blow their budgets for reasons unrelated to their own plan
    # (the bench.py discipline)
    jvm_system = getattr(getattr(spark, "_jvm", None), "System", None)
    if jvm_system is not None:
        jvm_system.gc()
    group = f"hof_audit_{time.monotonic_ns()}"
    state: dict = {}

    def work():
        try:
            spark.sparkContext.setJobGroup(group, "hof audit",
                                           interruptOnCancel=True)
            t0 = time.monotonic()
            df.select(F.xxhash64(col).alias("h")) \
                .agg(F.sum(F.col("h").cast("double"))).collect()
            state["t"] = time.monotonic() - t0
        except Exception as e:  # cancelled or failed
            state["err"] = e

    t = InheritableThread(target=work)
    t.daemon = True
    start = time.monotonic()
    t.start()
    t.join(budget_s)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        t.join(30.0)
        _drain_cancelled(spark)
        return False, time.monotonic() - start, None
    if "err" in state:
        return False, time.monotonic() - start, state["err"]
    return True, state["t"], None


# ---------------------------------------------------- advisory HOF scan
def nested_hof_report(df, col) -> int:
    """Count HOF invocations nested inside lambdafunction bodies in
    the analyzed plan — ADVISORY (bounded per-element windows are
    legitimate); the wall budget is the enforced gate."""
    plan = df.select(col.alias("r"))._jdf.queryExecution() \
        .analyzed().toString()
    hofs = ("aggregate(", "transform(", "zip_with(", "filter(",
            "exists(", "forall(", "reduce(")
    count = 0
    i = 0
    while True:
        j = plan.find("lambdafunction(", i)
        if j < 0:
            break
        depth, k = 0, j + len("lambdafunction(")
        start = k - 1
        # paren-match the lambdafunction body
        depth = 1
        while k < len(plan) and depth:
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        body = plan[start:k]
        count += sum(body.count(h) for h in hofs)
        i = j + 1
    return count


def main(argv):
    from dask_ms_spark import get_spark
    from dask_ms_spark.cache import release_caches

    spark = get_spark("hof_audit")
    spark.sparkContext.setLogLevel("ERROR")
    vdf = wide_vector_df(spark)
    tdf = wide_text_df(spark)
    fixtures = {"vector": vdf, "text": tdf}
    hf = host_factor(spark, vdf)
    if hf > 1.05:
        print(f"host contention factor {hf:.2f} — budgets scaled")

    failed = []
    if "--controls" not in argv:
        # completeness first — cheap, structural
        inv = invocations()
        missing = []
        for mod, names in exported_kernels().items():
            for n in names:
                if f"{mod}.{n}" not in inv:
                    missing.append(f"{mod}.{n}")
        if missing:
            print("MISSING wide-fixture invocations:", missing)
            return 2
        for name, (kind, thunk) in sorted(inv.items()):
            ok, t, err = run_with_budget(spark, fixtures[kind], thunk(),
                                         BUDGET_S * hf)
            nested = nested_hof_report(fixtures[kind], thunk())
            flag = "" if nested == 0 else f"  [nested-hof x{nested}]"
            if not ok:
                failed.append(name)
                why = f"ERROR {err}" if err else "BUDGET EXCEEDED"
                print(f"{name:40s} {why} after {t:.1f}s{flag}")
            else:
                print(f"{name:40s} {t:6.2f}s{flag}")

    if "--controls" not in argv:
        for name, thunk in sorted(df_ops().items()):
            ok, t, err = run_df_with_budget(spark, thunk(tdf),
                                            DF_BUDGET_S * hf)
            if not ok:
                failed.append(name)
                why = f"ERROR {err}" if err else "BUDGET EXCEEDED"
                print(f"df:{name:37s} {why} after {t:.1f}s")
            else:
                print(f"df:{name:37s} {t:6.2f}s")

    print("\nnegative controls (must exceed the budget):")
    for name, thunk in NEGATIVE_CONTROLS.items():
        ok, t, err = run_with_budget(spark, vdf, thunk(),
                                     BUDGET_S * hf)
        if ok:
            failed.append(name)
            print(f"{name:40s} COMPLETED in {t:.1f}s — harness cannot "
                  "separate bound from unbound at this shape!")
        else:
            print(f"{name:40s} cancelled at {t:.1f}s as expected")

    for name, fn in DF_NEGATIVE_CONTROLS.items():
        ok, t, err = run_df_with_budget(spark, fn(tdf),
                                        DF_BUDGET_S * 0.6 * hf)
        if ok:
            failed.append(name)
            print(f"{name:40s} COMPLETED in {t:.1f}s — df harness "
                  "cannot separate the classes at this shape!")
        else:
            print(f"{name:40s} cancelled at {t:.1f}s as expected")

    release_caches()
    if failed:
        print("\nFAILED:", failed)
        return 1
    print("\nall kernels within budget; controls separated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
