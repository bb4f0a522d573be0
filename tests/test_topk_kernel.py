"""Property tests for the vectorized top-k selector that backs
i4/i4c/i8: must equal a naive full-lexsort reference on arbitrary
matrices, ESPECIALLY under heavy ties (the argpartition window's
fallback path)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_to_clickhouse_spark.operators.llmops import _np_topk_sel


def _naive_topk(cos_w: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    out = []
    for row in cos_w:
        order = np.lexsort((ids, -row))
        out.append(order[: min(k, len(ids))])
    return np.array(out)


@given(
    nq=st.integers(min_value=1, max_value=12),
    n=st.integers(min_value=1, max_value=40),
    k=st.integers(min_value=1, max_value=10),
    n_distinct=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_topk_sel_matches_naive_under_ties(nq, n, k, n_distinct, seed):
    rng = np.random.RandomState(seed)
    # few distinct values → massive tie groups, often wider than the
    # argpartition window
    vals = rng.randn(n_distinct)
    cos = vals[rng.randint(0, n_distinct, size=(nq, n))].astype(np.float64)
    ids = rng.permutation(np.arange(n, dtype=np.int64) * 3 + 1)
    got = _np_topk_sel(cos.copy(), ids, k)
    want = _naive_topk(cos, ids, k)
    np.testing.assert_array_equal(got, want)


@given(
    nq=st.integers(min_value=1, max_value=8),
    n=st.integers(min_value=2, max_value=30),
    k=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_topk_sel_with_neginf_exclusions(nq, n, k, seed):
    """-inf-masked columns (self-exclusion) must sort last, exactly as
    in the naive reference."""
    rng = np.random.RandomState(seed)
    cos = rng.randn(nq, n)
    mask = rng.rand(nq, n) < 0.3
    cos[mask] = -np.inf
    ids = np.arange(n, dtype=np.int64)
    got = _np_topk_sel(cos.copy(), ids, k)
    want = _naive_topk(cos, ids, k)
    np.testing.assert_array_equal(got, want)
