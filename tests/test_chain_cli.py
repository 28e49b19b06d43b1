"""Differential tests for chain2dim (reference
kurtz-basic/chain2dim.c via its bruteforcechainingscores spec).

Both tools chain the SAME match file: the chaining DP's tie-breaks
depend on fragment array order, so feeding each tool its own match
file only guarantees score equality, not identical chain membership.
"""

import os
import subprocess
import sys

import pytest

from tests.test_complete_cli import MKVTREE, TESTDATA, VMATCH, needs_ref

CHAIN2DIM = "/root/repo/.ref-build/src/Vmatch/chain2dim.x"
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")


@pytest.fixture(scope="module")
def matchfile(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chain")
    src = os.path.join(TESTDATA, "at100K1")
    subprocess.run(
        [MKVTREE, "-db", src, "-dna", "-pl", "-allout",
         "-indexname", str(tmp / "ref")],
        check=True, capture_output=True,
    )
    m = subprocess.run(
        [VMATCH, "-l", "30", str(tmp / "ref")],
        capture_output=True, text=True,
    ).stdout
    p = tmp / "m.match"
    p.write_text(m)
    return str(p)


@needs_ref
@pytest.mark.parametrize("args", [
    ["-global"],
    ["-global", "gc"],
    ["-global", "ov"],
    ["-local"],
    ["-local", "100"],
    ["-local", "3b"],
    ["-local", "20p"],
    ["-maxgap", "1000", "-global"],
    ["-silent", "-local"],
    ["-wf", "2.0", "-local"],
])
def test_chain2dim_parity(matchfile, args):
    r = subprocess.run(
        [CHAIN2DIM] + args + [matchfile],
        capture_output=True, text=True,
    ).stdout
    o = subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.chain2dim"]
        + args + [matchfile],
        capture_output=True, text=True, env=ENV,
    ).stdout
    assert r == o
    assert len(r) > 0


def test_sweep_equals_bruteforce_fuzz(rng):
    """fastchaining sweep (Fenwick prefix-max) == brute-force scorer
    (chain2dim.c:776-890, the reference's own oracle) across modes."""
    import numpy as np

    from vstree_tpu.engine.match import MatchTable
    from vstree_tpu.postprocess.chain import (
        GLOBAL, GLOBALGC, LOCALBEST, LOCALMAX, LOCALPERCENT,
        LOCALTHRESH, ChainMode, chain_fragments,
    )

    def mk(n):
        p1 = rng.integers(0, 50000, n).astype(np.int64)
        l1 = rng.integers(5, 150, n).astype(np.int64)
        p2 = rng.integers(0, 50000, n).astype(np.int64)
        l2 = rng.integers(5, 150, n).astype(np.int64)
        return MatchTable(
            length1=l1, position1=p1, length2=l2, position2=p2,
            distance=rng.integers(-3, 4, n).astype(np.int64),
            flag=np.zeros(n, np.int64),
            seqnum1=np.zeros(n, np.int64), relpos1=p1.copy(),
            seqnum2=np.zeros(n, np.int64), relpos2=p2.copy(),
            evalue=np.zeros(n, float),
            idnumber=np.zeros(n, np.int64),
            transnum=np.full(n, -1, np.int64),
        )

    modes = [ChainMode(GLOBAL), ChainMode(GLOBALGC),
             ChainMode(LOCALMAX), ChainMode(LOCALTHRESH, minscore=80),
             ChainMode(LOCALBEST, howmanybest=4),
             ChainMode(LOCALPERCENT, percentaway=25)]
    for _ in range(12):
        mt = mk(int(rng.integers(2, 250)))
        for m in modes:
            a = chain_fragments(mt, m)
            b = chain_fragments(mt, m, _force_brute=True)
            assert a.scores == b.scores, m.kind
            assert all(np.array_equal(x, y)
                       for x, y in zip(a.fragments, b.fragments)), m.kind
