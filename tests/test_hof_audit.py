"""Structural guard for the HOF lambda re-expansion class (r9 verdict
item 1): Catalyst subexpression elimination stops at lambda scopes, so
an expression referenced inside a transform/zip_with/aggregate lambda
re-evaluates per ELEMENT — O(n^2) kernels that the narrow sf testdata
(64-channel arrays, 200-char docs) can never see.  tools/audit_hof.py
is the harness; these tests wire it into the suite so the class
cannot silently recur as kernels are added:

* completeness — every public Column-returning kernel in the four
  kernel modules must have a wide-fixture invocation registered;
* wall budget — every registered invocation runs on the wide fixture
  (4096-element arrays / 64 KB documents, expression-typed inputs)
  and must finish within the per-kernel budget;
* negative controls — deliberately unbound twins of spectral_moments
  (unbound INPUT) and normalize (unbound DERIVED scalar) must blow a
  reduced budget, proving the harness separates bound from unbound on
  this host instead of rubber-stamping.

The round-10 audit caught three real members of the class before the
harness landed: normalize's derived norm fold (40x at 4096 elements),
and the substr-per-window O(len^2) spellings of char_ngrams /
fingerprint / char_entropy (27x at 128 KB documents).
"""

import pytest
from pyspark.sql import functions as F

from tools.audit_hof import (BUDGET_S, DF_BUDGET_S, DF_NEGATIVE_CONTROLS,
                             NEGATIVE_CONTROLS, df_ops, exported_kernels,
                             host_factor, invocations,
                             run_df_with_budget, run_with_budget,
                             wide_text_df, wide_vector_df)

# bound twins finish in < 1 s at this shape; the unbound controls need
# 40 s+ — a reduced control budget keeps the proof cheap
CONTROL_BUDGET_S = 10.0


def test_every_exported_kernel_has_wide_invocation():
    """Adding a Column kernel without registering a wide-fixture
    invocation must fail: the budget sweep cannot guard what it does
    not run.  (Pure AST scan — no Spark.)"""
    inv = invocations()
    missing = [f"{mod}.{name}"
               for mod, names in exported_kernels().items()
               for name in names if f"{mod}.{name}" not in inv]
    assert not missing, (
        f"kernels without a wide-fixture invocation in "
        f"tools/audit_hof.py INVOCATIONS: {missing} — register one "
        f"so the re-expansion budget sweep covers them")


@pytest.fixture(scope="module")
def wide_fixtures(spark):
    v = wide_vector_df(spark)
    t = wide_text_df(spark)
    # budgets scale by measured host contention (clamped 1-6x) so a
    # busy CI box inflates walls without false-failing the sweep,
    # while a 40x quadratic still cannot sneak under
    hf = host_factor(spark, v)
    yield {"vector": v, "text": t, "hf": hf}
    v.unpersist()
    t.unpersist()


def test_kernels_within_wall_budget(spark, wide_fixtures):
    """Every kernel evaluates the wide fixture within the budget.  A
    re-expanded kernel overshoots by orders of magnitude (measured
    40-233x), so this is a class detector, not a perf benchmark."""
    failures = []
    for name, (kind, thunk) in sorted(invocations().items()):
        ok, t, err = run_with_budget(spark, wide_fixtures[kind],
                                     thunk(),
                                     BUDGET_S * wide_fixtures["hf"])
        if not ok:
            failures.append((name, round(t, 1),
                             str(err)[:200] if err else "budget"))
    assert not failures, (
        f"kernels exceeding the {BUDGET_S}s wide-fixture budget "
        f"(likely HOF re-expansion — bind inputs AND derived values "
        f"via _bind_once): {failures}")


def test_df_ops_within_wall_budget(spark, wide_fixtures):
    """Explode-based document operators (curated list — the
    Column-kernel enumeration cannot see them) evaluate the 64 KB-doc
    fixture within budget; the r10 audit found O(len^2) post-explode
    substr walks in two of them."""
    # a third of the rows: total-volume ops (char explode) track
    # row count, but the quadratic classes under test track PER-DOC
    # length, which stays 64 KB; the pytest session is local[4]
    # where the full 120-row fixture is volume-bound, not class-bound
    docs = wide_fixtures["text"].where(F.col("id") % 3 == 0)
    failures = []
    for name, thunk in sorted(df_ops().items()):
        ok, t, err = run_df_with_budget(
            spark, thunk(docs),
            DF_BUDGET_S * wide_fixtures["hf"])
        if not ok:
            failures.append((name, round(t, 1),
                             str(err)[:200] if err else "budget"))
    assert not failures, (
        f"DataFrame ops exceeding the {DF_BUDGET_S}s wide-doc budget "
        f"(likely a per-row O(position) byte walk or re-expansion): "
        f"{failures}")


def test_df_negative_control_blows_budget(spark, wide_fixtures):
    docs = wide_fixtures["text"].where(F.col("id") % 3 == 0)
    for name, fn in DF_NEGATIVE_CONTROLS.items():
        ok, t, err = run_df_with_budget(
            spark, fn(docs),
            DF_BUDGET_S * 0.6 * wide_fixtures["hf"])
        assert err is None, (name, err)
        assert not ok, (
            f"{name} completed in {t:.1f}s — the df harness no "
            f"longer separates the classes at this shape")


# cancellation-based tests LAST: a cancelled quadratic job's tasks
# keep burning executor threads past the cancel (codegen loops only
# poll interrupts at row boundaries), contending any measurement
# that follows in the same JVM
def test_negative_controls_blow_budget(spark, wide_fixtures):
    """The deliberately unbound twins must FAIL the budget: if they
    pass, the fixture/budget no longer separates the classes and the
    sweep above is vacuous."""
    for name, thunk in NEGATIVE_CONTROLS.items():
        ok, t, err = run_with_budget(spark, wide_fixtures["vector"],
                                     thunk(),
                                     CONTROL_BUDGET_S
                                     * wide_fixtures["hf"])
        assert err is None, (name, err)
        assert not ok, (
            f"{name} completed in {t:.1f}s — the harness can no "
            f"longer separate bound from unbound at this shape; "
            f"widen the fixture or lower the budget")
