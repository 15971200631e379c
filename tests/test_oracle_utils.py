"""Pins for the oracle-comparison canonicalizer (tests/oracle_utils.py).

canon_rows moved from per-cell ``.iloc[i][c]`` to ``itertuples`` in
round 10 (the old form cost ~30 us per CELL — a million-row sf0.1 frame
took half an hour to canonicalize). The rewrite is NOT value-equivalent
(ADVICE r10): .iloc row extraction upcast ints to float64 in any frame
containing a float column, so an int cell canonicalized as ('f', 3.0)
and int-vs-float divergence between engines was silently masked;
itertuples preserves per-column dtypes, which is stricter and mirrors
the driver's type-tagged hash. These pins hold the exact canonical forms
the driver's value-hash depends on, across every cell type the 205
queries emit — including the strictness pin below."""

from __future__ import annotations

import pandas as pd

from tests.oracle_utils import _canon_value, canon_rows


def test_canon_rows_mixed_frame():
    df = pd.DataFrame(
        {
            "b": [1.5, float("nan"), None, 2.0],
            "a": [3, 4, 5, 6],
            "c": ["x", None, "z", "w"],
            "d": [
                pd.Timestamp("2024-01-01"),
                None,
                pd.Timestamp("2024-01-02"),
                pd.Timestamp("2024-01-03"),
            ],
            "e": [[1, 2], [3], None, [4, 5]],
        }
    )
    rows = canon_rows(df)
    # columns sorted (a, b, c, d, e); rows sorted by repr
    assert rows[0] == (3, ("f", 1.5), "x", "2024-01-01T00:00:00", (1, 2))
    # float column: None became NaN (pandas float storage) -> "NaN" tag
    assert rows[1] == (4, "NaN", None, "NaT", (3,))
    assert len(rows) == 4


def test_canon_value_type_tags():
    # floats are type-tagged so 52 (BIGINT) vs 52.0 (HUGEINT->float64)
    # stays a FAIL, mirroring the driver's stringified value-hash
    assert _canon_value(52.0) == ("f", 52.0)
    assert _canon_value(52) == 52
    assert _canon_value(None) is None
    assert _canon_value(b"\x01\xff") == "01ff"
    assert _canon_value((1, 2.0)) == (1, ("f", 2.0))


def test_canon_rows_is_order_insensitive():
    a = pd.DataFrame({"x": [2, 1], "y": ["b", "a"]})
    b = pd.DataFrame({"y": ["a", "b"], "x": [1, 2]})
    assert canon_rows(a) == canon_rows(b)


def test_canon_int_stays_untagged_beside_float_column():
    """Strictness pin (ADVICE r10): in a mixed int+float frame the int
    column must canonicalize as a bare int, NOT the ('f', x) float tag the
    old per-cell .iloc path produced via its common-dtype upcast. If this
    ever regresses to the lenient form, an engine pair returning 3 (BIGINT)
    vs 3.0 (float64) would wrongly compare equal here while the driver's
    type-tagged hash fails it."""
    df = pd.DataFrame({"i": [3], "f": [1.5]})
    assert canon_rows(df) == [(("f", 1.5), 3)]
    # and the upcast really was the old behavior: a common-dtype row
    # extraction loses the int dtype
    assert _canon_value(df.iloc[0]["i"]) == ("f", 3.0)
