"""Differential tests: JAX ESA builder vs brute-force oracle."""

import numpy as np
import pytest

from conftest import random_dna_text
from oracle.naive import naive_lcp_table, naive_suffix_array

from vstree_tpu.index.build import (
    bck_table,
    bwt_table,
    lcp_table,
    suffix_sort,
)


CASES = [
    ("plain", dict(n=200, n_wild=0, n_sep=0)),
    ("wildcards", dict(n=300, n_wild=12, n_sep=0)),
    ("separators", dict(n=300, n_wild=6, n_sep=5)),
    ("tiny", dict(n=3, n_wild=0, n_sep=0)),
    ("allsame", None),  # handled specially
    ("bigger", dict(n=5000, n_wild=20, n_sep=10)),
]


@pytest.mark.parametrize("name,spec", CASES, ids=[c[0] for c in CASES])
def test_suffix_sort_matches_oracle(rng, name, spec):
    if name == "allsame":
        text = np.zeros(64, np.uint8)
    else:
        text = random_dna_text(rng, **spec)
    suftab, stitab = suffix_sort(text)
    expected = naive_suffix_array(text)
    np.testing.assert_array_equal(suftab, expected)
    # inverse property
    np.testing.assert_array_equal(
        stitab[suftab], np.arange(text.size + 1, dtype=np.int32)
    )
    assert suftab[-1] == text.size  # sentinel is largest


@pytest.mark.parametrize("name,spec", CASES, ids=[c[0] for c in CASES])
def test_lcp_matches_oracle(rng, name, spec):
    if name == "allsame":
        text = np.zeros(64, np.uint8)
    else:
        text = random_dna_text(rng, **spec)
    suftab, _ = suffix_sort(text)
    lcp = lcp_table(text, suftab)
    np.testing.assert_array_equal(lcp, naive_lcp_table(text, suftab))


def test_bwt(rng):
    text = random_dna_text(rng, 500, n_wild=10, n_sep=5)
    suftab, _ = suffix_sort(text)
    bwt = bwt_table(text, suftab)
    for r in range(text.size + 1):
        p = suftab[r]
        if p > 0:
            assert bwt[r] == text[p - 1]
        else:
            assert bwt[r] == 253  # UNDEFBWTCHAR


def test_bck_table(rng):
    text = random_dna_text(rng, 800, n_wild=15, n_sep=6)
    pl = 3
    k = 4
    suftab, _ = suffix_sort(text)
    bck = bck_table(text, k, pl)
    n = text.size
    numofcodes = k**pl

    def code_of(p):
        """Rolling-code semantics: digits from first special onward are k-1."""
        c = 0
        seen = False
        for j in range(pl):
            if p + j >= n or text[p + j] >= 254:
                seen = True
            d = (k - 1) if seen else int(text[p + j])
            c = c * k + d
        return c, not seen

    # check every bucket's [left, mid) holds exactly the fully-regular
    # suffixes spelling that code, in suffix order
    for c in range(numofcodes):
        left, mid = int(bck[2 * c]), int(bck[2 * c + 1])
        right = int(bck[2 * c + 2]) if c + 1 < numofcodes else n + 1
        assert left <= mid <= right
        for r in range(left, right):
            cc, full = code_of(int(suftab[r]))
            assert cc == c
            assert full == (r < mid)
