"""Differential tests for seed-extended approximate matching
(-l L -h/-e k, self and query) against the reference binary
(reference: extendHD.c, extendED.c, frontSEP.c, extendgen.c)."""

import os
import subprocess
import sys

import pytest

from tests.test_complete_cli import (
    MKVTREE, TESTDATA, VMATCH, body, make_queries, needs_ref, run_ref,
    run_ours,
)


@pytest.fixture(scope="module")
def indexes(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ext")
    src = os.path.join(TESTDATA, "at100K1")
    subprocess.run(
        [MKVTREE, "-db", src, "-dna", "-pl", "-allout",
         "-indexname", str(tmp / "ref")],
        check=True, capture_output=True,
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.mkvtree", "-db", src,
         "-dna", "-pl", "-allout", "-indexname", str(tmp / "ours")],
        check=True, capture_output=True, env=env, cwd=str(tmp),
    )
    qpath = tmp / "q.fna"
    make_queries(src, str(qpath), num=30, seed=77)
    return tmp, str(qpath)


@needs_ref
@pytest.mark.parametrize("task", [
    ["-l", "30", "-h", "1"],
    ["-l", "30", "-h", "2"],
    ["-l", "30", "-e", "1"],
    ["-l", "30", "-e", "2"],
    ["-l", "45", "-e", "3"],
])
def test_self_extension_parity(indexes, task):
    tmp, _ = indexes
    ref = run_ref(task + [str(tmp / "ref")])
    ours = run_ours(task + [str(tmp / "ours")], cwd=str(tmp))
    assert sorted(body(ref)) == sorted(body(ours))
    assert len(body(ref)) > 0


@needs_ref
@pytest.mark.parametrize("task", [
    ["-l", "25", "-h", "1"],
    ["-l", "25", "-e", "2"],
    ["-l", "25", "-e", "1", "-p"],
])
def test_query_extension_parity(indexes, task):
    tmp, qpath = indexes
    ref = run_ref(task + ["-q", qpath, str(tmp / "ref")])
    ours = run_ours(task + ["-q", qpath, str(tmp / "ours")],
                    cwd=str(tmp))
    assert sorted(body(ref)) == sorted(body(ours))


@needs_ref
@pytest.mark.parametrize("task", [
    ["-exdrop", "2", "-l", "40"],
    ["-exdrop", "4", "-l", "35"],
    ["-hxdrop", "3", "-l", "35"],
    ["-exdrop", "3", "-l", "40", "-seedlength", "25"],
])
def test_self_xdrop_parity(indexes, task):
    """x-drop extended repeats (xdrop.gen, xdropext.c)."""
    tmp, _ = indexes
    ref = run_ref(task + [str(tmp / "ref")])
    ours = run_ours(task + [str(tmp / "ours")], cwd=str(tmp))
    assert sorted(body(ref)) == sorted(body(ours))
    assert len(body(ref)) > 0


@needs_ref
@pytest.mark.parametrize("task", [
    ["-exdrop", "4", "-l", "35"],
    ["-hxdrop", "2", "-l", "30"],
    ["-exdrop", "3", "-l", "35", "-p", "-d"],
])
def test_query_xdrop_parity(indexes, task):
    tmp, qpath = indexes
    ref = run_ref(task + ["-q", qpath, str(tmp / "ref")])
    ours = run_ours(task + ["-q", qpath, str(tmp / "ours")],
                    cwd=str(tmp))
    assert sorted(body(ref)) == sorted(body(ours))


@needs_ref
@pytest.mark.parametrize("task", [
    ["-l", "20", "0", "100"],
    ["-l", "20", "-5", "50"],
    ["-l", "25", "100", "5000"],
    ["-l", "30", "-e", "2", "-allmax"],
    ["-l", "30", "-h", "2", "-allmax"],
    ["-l", "40", "-e", "3", "-allmax"],
])
def test_boundedgap_and_allmax_parity(indexes, task):
    """-l lower/upper gap bounds (parsevm.c:536-585 + mokay.c:78-111)
    and -allmax containment (mcontain.c matchcontainer, two-level
    container of fself.c:131-142) — byte-identical output."""
    tmp, _ = indexes
    ref = run_ref(task + [str(tmp / "ref")])
    ours = run_ours(task + [str(tmp / "ours")], cwd=str(tmp))
    assert body(ref) == body(ours)
    assert len(body(ref)) > 0
