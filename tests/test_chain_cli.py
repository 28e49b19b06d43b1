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
