"""Property pins for ``functions.scalar.cents`` — the round-9 float-sum
audit's foundation. Two claims the audit rests on, machine-checked:

1. LOSSLESS RECOVERY: for any decimal value with <= 2 fractional digits
   whose double is its nearest representation (i.e. every money value in
   the testdata class), floor(double * 100 + 0.5) returns the intended
   cent count exactly — pure Python here, and the expression is the same
   three exactly-specified IEEE ops Spark and DuckDB evaluate, so the
   law transfers to both engines verbatim.
2. ORDER INVARIANCE transfers to Spark: the cent sum over any
   repartitioning of one frame is a single integer — checked on a frame
   whose FLOAT sum sits on the .xx5 boundary (the regression shape the
   hostile reorder sweep caught live in tests/test_hostile_regressions).

The domain bound: |cents| <= 2^50 (~$11 trillion per VALUE). Beyond
~2e15 cents the double's ulp approaches a cent, so the representation
itself can no longer name the cent and recovery breaks — hypothesis
found c = -4_342_769_145_988_823 (~2^52) as a falsifier of the naive
2^52 bound, which is exactly why the bound is pinned here: a per-row
money value larger than 2^50 cents could not have been faithfully
carried by the input double to begin with. (SUMS have no such bound —
they ride int64/decimal(38,0), never doubles.)
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

SETTINGS = dict(max_examples=500, deadline=None)


@settings(**SETTINGS)
@given(
    st.integers(min_value=-(2**50), max_value=2**50)  # intended cents
)
def test_cents_recovery_is_lossless(c):
    v = c / 100.0  # the nearest-double of the intended 2-decimal value
    assert math.floor(v * 100.0 + 0.5) == c


def test_cents_recovery_breaks_past_the_carrier_bound():
    """The falsifier hypothesis found for the naive 2^52 bound, kept as
    a deliberate anti-example: past ~2e15 cents the double's ulp
    approaches a cent and NO recovery rule could work — the bound is a
    property of the carrier type, not of this device."""
    c = -4_342_769_145_988_823
    assert math.floor((c / 100.0) * 100.0 + 0.5) != c


@settings(**SETTINGS)
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=0, max_size=50
    )
)
def test_cent_sums_are_associative_integers(cs):
    """Integer cent sums cannot depend on grouping — trivially true for
    Python ints; the pin documents WHY the Spark sum is safe (the sum
    never passes through a float until the single final division)."""
    total = sum(cs)
    # any split point gives the same total
    for k in range(0, len(cs), 7):
        assert sum(cs[:k]) + sum(cs[k:]) == total
