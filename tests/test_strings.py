"""Kernel parity tests: bit-parallel LCS vs DP, JW/edit-ratio known
values, metaphone sanity (FIXTURES.md §4 string_pairs_golden)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution__spark.functions import strings as K


@given(st.text(alphabet="abcde", max_size=40), st.text(alphabet="abcde", max_size=40))
@settings(max_examples=300, deadline=None)
def test_lcs_bitparallel_matches_dp(a, b):
    assert K.lcs_len(a, b) == K.lcs_len_dp(a, b)


def test_lcs_known():
    assert K.lcs_len("abcde", "ace") == 3
    assert K.lcs_len("", "abc") == 0
    assert K.lcs_len("abc", "abc") == 3
    assert K.lcs_len("abc", "cba") == 1
    # > 64 chars exercises multi-word bigints
    a = "ab" * 80
    b = "ba" * 80
    assert K.lcs_len(a, b) == K.lcs_len_dp(a, b)


def test_edit_ratio_known():
    # fuzz.ratio semantics: 2*LCS/(la+lb)
    assert K.edit_ratio("abcd", "abcd") == 1.0
    assert K.edit_ratio("", "") == 1.0
    assert K.edit_ratio("abc", "") == 0.0
    assert math.isclose(K.edit_ratio("kitten", "sitting"), 2 * 4 / 13)


def test_jaro_winkler_known():
    # canonical published examples (Winkler 1990)
    assert math.isclose(K.jaro("MARTHA", "MARHTA"), 0.9444444444, rel_tol=1e-9)
    assert math.isclose(K.jaro_winkler("MARTHA", "MARHTA"), 0.9611111111, rel_tol=1e-9)
    assert math.isclose(K.jaro("DWAYNE", "DUANE"), 0.8222222222, rel_tol=1e-9)
    assert math.isclose(K.jaro_winkler("DWAYNE", "DUANE"), 0.84, rel_tol=1e-9)
    assert K.jaro_winkler("", "") == 1.0
    assert K.jaro_winkler("a", "") == 0.0
    assert K.jaro_winkler("same", "same") == 1.0


def test_lcs_ratio():
    assert K.lcs_ratio("abcde", "ace") == 3 / 5
    assert K.lcs_ratio("", "") == 1.0
    assert K.lcs_ratio("a", "") == 0.0


def test_metaphone_basic():
    # deterministic, stable keys; equal words → equal keys
    assert K.metaphone("Thompson") == K.metaphone("Thompson")
    assert K.metaphone("smith") == K.metaphone("Smith")
    assert K.metaphone("knight")[0] == "N"  # KN- → N
    assert K.metaphone("xavier")[0] == "S"  # X- → S
    assert K.metaphone("phone")[0] == "F"  # PH → F
    assert K.metaphone("") == ""
    assert K.metaphone("123") == ""


def test_metaphone_match_series():
    import pandas as pd

    s = K.metaphone_match_series(
        pd.Series(["smith corp", "alpha", ""]), pd.Series(["smyth inc", "beta", ""])
    )
    assert s.iloc[0] == 1.0  # smith/smyth same phonetic key
    assert s.iloc[1] == 0.0
    assert s.iloc[2] == 1.0  # both empty first tokens
