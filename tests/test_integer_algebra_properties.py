"""Property tests for the integer-algebra identities the monitoring
operators rely on: the rearrangements must be EXACTLY equivalent to their
float definitions for all inputs, not just the testdata — these identities
are why q94/q97/q107 can promise bit-identical cross-engine results.

Pure Python (no Spark): the identities are arithmetic facts; the Spark
translation is covered by the oracle comparisons.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

cents = st.integers(min_value=-10_000_000, max_value=10_000_000)


@settings(max_examples=300, deadline=None)
@given(st.lists(cents, min_size=2, max_size=24))
def test_q94_integer_test_equals_float_zscore(window):
    """(n·x − S)² > 9·(n·Q − S²)  ⟺  |x − μ| > 3σ (population σ), with
    x = the window's last element — modulo exact-boundary ties, which the
    integer form decides exactly and floats cannot (so we only require
    agreement when the float comparison is not razor-thin)."""
    n = len(window)
    x = window[-1]
    s = sum(window)
    q = sum(v * v for v in window)
    lhs = (n * x - s) ** 2
    rhs = 9 * (n * q - s * s)
    int_flag = lhs > rhs

    mu = s / n
    var = q / n - mu * mu
    var = max(var, 0.0)
    dev = abs(x - mu)
    bound = 3.0 * math.sqrt(var)
    # skip razor-thin float boundaries: the integer form IS the truth there
    if abs(dev - bound) <= 1e-9 * max(1.0, bound):
        return
    assert int_flag == (dev > bound)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=720), cents),
        min_size=2,
        max_size=50,
    )
)
def test_q107_sufficient_stats_slope_equals_ols(points):
    """β from (n, Σx, Σy, Σxy, Σx²) equals the normal-equations OLS slope
    computed the long way (float), whenever the slope is defined."""
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    n = len(points)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    den = n * sxx - sx * sx
    if den == 0:
        return
    beta_int = (n * sxy - sx * sy) / den
    mx, my = sx / n, sy / n
    num_f = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den_f = sum((a - mx) ** 2 for a in xs)
    beta_float = num_f / den_f
    assert math.isclose(beta_int, beta_float, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_q106_byte_histogram_conserves_and_bins(data):
    from spark_state_provider_spark.operators.multimodal import (
        _MEDIA_BINS,
        _byte_histogram,
    )

    h = _byte_histogram(data)
    assert len(h) == _MEDIA_BINS
    assert sum(h) == len(data)
    for v in data:
        assert h[v >> 4] >= 1
