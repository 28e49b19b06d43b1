"""Karlin-Altschul parameter computation vs the compiled reference
(kurtz/karlin.c karlinpp/karlinunitcostpp/significance).  Golden
values generated from a C harness linking the reference source."""

import math

import pytest

from vstree_tpu.stats.karlin import (
    karlinpp,
    karlinunitcostpp,
    significance,
)

# printf("%.15g") outputs of the reference functions
GOLDEN = [
    ((-1, 2, [0.75, 0.0, 0.0, 0.25]),
     (0.264497071504593, 0.0532229268559328)),
    ((-2, 2, [0.4, 0.3, 0.0, 0.1, 0.2]),
     (0.4456807076931, 0.164074117874891)),
    ((-3, 2, [0.5, 0.0, 0.2, 0.0, 0.0, 0.3]),
     (0.455125689506531, 0.251695968267812)),
    ((-2, 1, [0.6, 0.1, 0.05, 0.25]),
     (1.24934607744217, 0.531211148723161)),
]


@pytest.mark.parametrize("args,want", GOLDEN)
def test_karlinpp_reference_values(args, want):
    low, high, pr = args
    lam, K = karlinpp(low, high, pr)
    assert math.isclose(lam, want[0], rel_tol=1e-13)
    assert math.isclose(K, want[1], rel_tol=1e-13)


def test_unitcost_and_significance():
    lam, K = karlinunitcostpp()
    assert math.isclose(lam, 0.264497071504593, rel_tol=1e-13)
    assert math.isclose(K, 0.0532229268559328, rel_tol=1e-13)
    assert math.isclose(significance(lam, K, 1000.0, 40),
                        0.998647864452966, rel_tol=1e-13)


def test_karlinpp_errors():
    with pytest.raises(ValueError):
        karlinpp(0, 2, [0.5, 0.25, 0.25])
    with pytest.raises(ValueError):
        karlinpp(-2, 2, [0.2, 0.3, 0.0, 0.1, 0.4])  # E >= 0
