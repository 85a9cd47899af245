"""Property-based test: the vectorized first-mismatch kernel vs a plain
Python reference, over arbitrary list pairs (Hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from log_anomaly_detector_spark.rules.token_equality import _first_mismatch_numpy

pairs = st.lists(
    st.tuples(
        st.lists(st.integers(0, 5), max_size=8),
        st.lists(st.integers(0, 5), max_size=8),
    ),
    min_size=1,
    max_size=20,
)


def _reference(a: list[int], b: list[int]) -> tuple[int, int, int]:
    for i in range(min(len(a), len(b))):
        if a[i] != b[i]:
            return i, a[i], b[i]
    if len(a) != len(b):
        i = min(len(a), len(b))
        return i, (a[i] if len(a) > len(b) else -1), (b[i] if len(b) > len(a) else -1)
    return -1, -1, -1


def _to_buffers(lists):
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in lists], out=offsets[1:])
    values = np.array([v for x in lists for v in x], dtype=np.int32)
    return values, offsets


@settings(max_examples=300, deadline=None)
@given(pairs)
def test_first_mismatch_matches_reference(rows):
    a_lists = [a for a, _ in rows]
    b_lists = [b for _, b in rows]
    av, ao = _to_buffers(a_lists)
    bv, bo = _to_buffers(b_lists)
    idx, obs, exp = _first_mismatch_numpy(av, ao, bv, bo)
    for i, (a, b) in enumerate(rows):
        assert (idx[i], obs[i], exp[i]) == _reference(a, b), (i, a, b)
