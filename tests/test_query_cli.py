"""Differential tests for -q substring matching (MEMs, MUM candidates,
MUMs) against the reference binary (reference engines: fquery.c,
matchsub.c, cleanMUMcand.c)."""

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
    tmp = tmp_path_factory.mktemp("qry")
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
    make_queries(src, str(qpath), num=40, seed=23)
    return tmp, str(qpath)


@needs_ref
@pytest.mark.parametrize("task", [
    ["-l", "20"],
    ["-l", "20", "-p"],
    ["-l", "20", "-p", "-d"],
    ["-l", "15", "-mum", "cand"],
    ["-l", "15", "-mum"],
    ["-l", "20", "-absolute"],
    ["-l", "25", "-evalue", "1e-5"],
])
def test_query_parity(indexes, task):
    tmp, qpath = indexes
    ref = run_ref(task + ["-q", qpath, str(tmp / "ref")])
    ours = run_ours(task + ["-q", qpath, str(tmp / "ours")],
                    cwd=str(tmp))
    # exact emission order: the speedup-2 witness state machine
    # (matchsub.c:353-539) is replayed probe-for-probe
    assert body(ref) == body(ours)


@needs_ref
def test_mum_emission_order(indexes):
    """-mum output order is fully specified (sorted by dbstart/length
    in the cleanMUMcand post-pass) — raw rows must match."""
    tmp, qpath = indexes
    task = ["-l", "15", "-mum"]
    ref = run_ref(task + ["-q", qpath, str(tmp / "ref")])
    ours = run_ours(task + ["-q", qpath, str(tmp / "ours")],
                    cwd=str(tmp))
    assert body(ref) == body(ours)
    assert len(body(ref)) > 0


@needs_ref
@pytest.mark.parametrize("speed", ["0", "2"])
def test_query_qspeedup_exact_order(indexes, speed):
    """Both retained reference algorithms (0 and the default 2) have
    their within-run emission rotation reproduced exactly — the
    rotation differs between them, so this pins both witnesses."""
    tmp, qpath = indexes
    task = ["-l", "15", "-qspeedup", speed]
    ref = run_ref(task + ["-q", qpath, str(tmp / "ref")])
    ours = run_ours(task + ["-q", qpath, str(tmp / "ours")],
                    cwd=str(tmp))
    assert body(ref) == body(ours)


@needs_ref
@pytest.mark.parametrize("task", [
    ["-p", "-l", "11"],
    ["-p", "-d", "-l", "12"],
    ["-p", "-h", "2", "-l", "20"],
    ["-p", "-e", "2", "-l", "22"],
    ["-p", "-exdrop", "2", "-seedlength", "14", "-l", "20"],
    ["-p", "-l", "12", "-best", "10"],
    ["-p", "-l", "12", "-s"],
])
def test_selfpalindromic_parity(indexes, task):
    """Self -p comparison (runself.c:128-180: the db matched against
    its own reverse complement, FLAGSELFPALINDROMIC dedup keeps
    (seq1,rel1) <= (seq2,rel2))."""
    tmp, _ = indexes
    ref = run_ref(task + [str(tmp / "ref")])
    ours = run_ours(task + [str(tmp / "ours")], cwd=str(tmp))
    assert body(ref) == body(ours)
