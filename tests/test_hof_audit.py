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

from tools.audit_hof import (BUDGET_S, NEGATIVE_CONTROLS, exported_kernels,
                             invocations, run_with_budget, wide_text_df,
                             wide_vector_df)

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
    yield {"vector": v, "text": t}
    v.unpersist()
    t.unpersist()


def test_kernels_within_wall_budget(spark, wide_fixtures):
    """Every kernel evaluates the wide fixture within the budget.  A
    re-expanded kernel overshoots by orders of magnitude (measured
    40-233x), so this is a class detector, not a perf benchmark."""
    failures = []
    for name, (kind, thunk) in sorted(invocations().items()):
        ok, t, err = run_with_budget(spark, wide_fixtures[kind],
                                     thunk(), BUDGET_S)
        if not ok:
            failures.append((name, round(t, 1),
                             str(err)[:200] if err else "budget"))
    assert not failures, (
        f"kernels exceeding the {BUDGET_S}s wide-fixture budget "
        f"(likely HOF re-expansion — bind inputs AND derived values "
        f"via _bind_once): {failures}")


def test_negative_controls_blow_budget(spark, wide_fixtures):
    """The deliberately unbound twins must FAIL the budget: if they
    pass, the fixture/budget no longer separates the classes and the
    sweep above is vacuous."""
    for name, thunk in NEGATIVE_CONTROLS.items():
        ok, t, err = run_with_budget(spark, wide_fixtures["vector"],
                                     thunk(), CONTROL_BUDGET_S)
        assert err is None, (name, err)
        assert not ok, (
            f"{name} completed in {t:.1f}s — the harness can no "
            f"longer separate bound from unbound at this shape; "
            f"widen the fixture or lower the budget")
