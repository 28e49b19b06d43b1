"""Differential tests for match masking and inverse output
(-dbmaskmatch/-qmaskmatch, -dbnomatch/-qnomatch) against the
reference binary (reference Vmatch/markmat.c, nomatch.c,
showmasked.c)."""

import os
import subprocess
import sys

import pytest

REF_SRC = "/root/repo/.ref-build/src"
MKVTREE = os.path.join(REF_SRC, "Mkvtree/mkvtree.x")
VMATCH = os.path.join(REF_SRC, "Vmatch/vmatch.x")
TESTDATA = "/root/reference/src/testdata"

needs_ref = pytest.mark.skipif(
    not os.path.exists(VMATCH), reason="reference binaries not built"
)


@pytest.fixture(scope="module")
def indexes(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mask")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    db = os.path.join(TESTDATA, "at100K1")
    subprocess.run(
        [MKVTREE, "-db", db, "-dna", "-pl", "-allout",
         "-indexname", str(tmp / "ref_at")],
        check=True, capture_output=True,
    )
    subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.mkvtree", "-db", db,
         "-dna", "-pl", "-allout", "-indexname", str(tmp / "our_at")],
        check=True, capture_output=True, env=env, cwd=str(tmp),
    )
    return tmp


def run_pair(tmp, args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    ref = subprocess.run(
        [VMATCH] + args + [str(tmp / "ref_at")],
        capture_output=True, text=True,
    ).stdout
    ours = subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.vmatch"] + args
        + [str(tmp / "our_at")],
        capture_output=True, text=True, env=env, cwd=str(tmp),
    ).stdout
    return (
        [l for l in ref.splitlines() if not l.startswith("#")],
        [l for l in ours.splitlines() if not l.startswith("#")],
    )


@needs_ref
@pytest.mark.parametrize("args", [
    ["-l", "30", "-dbnomatch", "1000"],
    ["-l", "30", "-dbnomatch", "1000", "keepleft"],
    ["-l", "30", "-dbnomatch", "1000", "-absolute"],
    ["-l", "30", "-dbmaskmatch", "X"],
    ["-l", "30", "-dbmaskmatch", "toupper"],
    ["-l", "25", "-dbmaskmatch", "N", "keeprightifsamesequence"],
])
def test_self_mask_nomatch_parity(indexes, args):
    ref, ours = run_pair(indexes, args)
    assert ref == ours


@needs_ref
@pytest.mark.parametrize("args", [
    ["-l", "20", "-qnomatch", "50"],
    ["-l", "20", "-dbnomatch", "1000"],
    ["-l", "20", "-qmaskmatch", "N"],
    ["-l", "20", "-qmaskmatch", "toupper"],
])
def test_query_mask_nomatch_parity(indexes, args):
    q = os.path.join(TESTDATA, "U89959.fna")
    full = args[:2] + ["-q", q] + args[2:]
    ref, ours = run_pair(indexes, full)
    assert ref == ours
