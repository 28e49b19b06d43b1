"""Differential tests for -online -complete matching (index-free)
against the reference binary (reference: exactcompl.c:277-325 BMH,
hamcompl.c sliding count, edistcompl.c Myers/Ukkonen-cutoff scans).
Mirrors the reference's own Cmponl.sh differential strategy."""

import os
import random
import subprocess
import sys

import pytest

from tests.test_complete_cli import (
    MKVTREE, TESTDATA, VMATCH, body, needs_ref, run_ref, run_ours,
)


def make_mutated_queries(src, out, num=20, seed=11, wildcards=True):
    raw = open(src).read()
    seq = "".join(l for l in raw.split("\n") if not l.startswith(">"))
    rng = random.Random(seed)
    with open(out, "w") as f:
        i = 0
        while i < num:
            s = rng.randrange(0, len(seq) - 200)
            frag = list(seq[s : s + rng.randrange(40, 180)])
            if not wildcards and any(c not in "acgtACGT" for c in frag):
                continue
            for _ in range(rng.randrange(0, 5)):
                p = rng.randrange(len(frag))
                frag[p] = rng.choice("acgt")
            f.write(f">q{i}\n{''.join(frag)}\n")
            i += 1


@pytest.fixture(scope="module")
def indexes(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("onl")
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
    make_mutated_queries(src, str(qpath))
    return tmp, str(qpath)


@needs_ref
@pytest.mark.parametrize("task", [
    ["-online", "-complete"],
    ["-online", "-complete", "-h", "1"],
    ["-online", "-complete", "-h", "3"],
    ["-online", "-complete", "-e", "1"],
    ["-online", "-complete", "-e", "3"],
])
def test_online_complete_parity(indexes, task):
    """Byte-identical rows INCLUDING emission order (the reference
    scans are deterministic: BMH left-to-right, hamming/edit
    right-to-left)."""
    tmp, qpath = indexes
    ref = run_ref(task + ["-q", qpath, str(tmp / "ref")])
    ours = run_ours(task + ["-q", qpath, str(tmp / "ours")],
                    cwd=str(tmp))
    assert body(ref) == body(ours)


@needs_ref
def test_online_vs_index_same_set(indexes):
    """Cmponl.sh analog: our -online and our index-based -complete
    agree as SETS for wildcard-free queries.  (On queries containing
    wildcards the two REFERENCE modes themselves disagree — online
    detection is byte-permissive while the index piece search is not
    — so the invariant only holds wildcard-free.)"""
    tmp, _ = indexes
    qpath = tmp / "qclean.fna"
    make_mutated_queries(os.path.join(TESTDATA, "at100K1"),
                         str(qpath), seed=23, wildcards=False)
    on = run_ours(["-online", "-complete", "-e", "2", "-q",
                   str(qpath), str(tmp / "ours")], cwd=str(tmp))
    off = run_ours(["-complete", "-e", "2", "-q", str(qpath),
                    str(tmp / "ours")], cwd=str(tmp))
    assert sorted(body(on)) == sorted(body(off))
    assert len(body(on)) > 0


@needs_ref
@pytest.mark.parametrize("task", [
    ["-online", "-l", "11"],
    ["-online", "-l", "11", "-mum", "cand"],
    ["-online", "-l", "13", "-e", "1"],
    ["-online", "-l", "12", "-h", "1"],
])
def test_online_query_byte_identical(online_setup, task):
    """-online -q: per-query-sequence throwaway index, database
    scanned against it (procmatch.c:34-133) — byte-identical."""
    tmp, qf = online_setup
    ref, ours = run_pair_online(tmp, task + ["-q", qf])
    assert body(ref) == body(ours)
    assert len(body(ref)) > 0


@needs_ref
@pytest.mark.parametrize("task", [
    ["-online", "-l", "11", "-p"],
    ["-online", "-l", "11", "-p", "-d"],
])
def test_online_query_palindromic_sets(online_setup, task):
    """Palindromic online pass: identical match sets; within
    equal-LCE tie blocks (poly-A runs) the emission pivot depends on
    the reference's stateful witness (matchsub.c:353-539)."""
    tmp, qf = online_setup
    ref, ours = run_pair_online(tmp, task + ["-q", qf])
    assert sorted(body(ref)) == sorted(body(ours))
    assert len(body(ref)) > 0


@pytest.fixture(scope="module")
def online_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("onlineq")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    src = os.path.join(TESTDATA, "at100K1")
    subprocess.run(
        [MKVTREE, "-db", src, "-dna", "-pl", "-allout",
         "-indexname", str(tmp / "ref")],
        check=True, capture_output=True)
    subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.mkvtree", "-db", src,
         "-dna", "-pl", "-allout", "-indexname", str(tmp / "ours")],
        check=True, capture_output=True, env=env, cwd=str(tmp))
    # first ~2 KB of U89959 + a short second sequence
    with open(os.path.join(TESTDATA, "U89959.fna")) as fh:
        lines = fh.read(2200).splitlines()[:-1]
    qf = tmp / "q.fna"
    qf.write_text("\n".join(lines)
                  + "\n>second\nacgtacgtacgGGGATCGATCGacgtacctgaacctga\n")
    return tmp, str(qf)


def run_pair_online(tmp, args):
    ref = subprocess.run(
        [VMATCH] + args + [str(tmp / "ref")],
        capture_output=True, text=True, cwd=str(tmp)).stdout
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.vmatch"] + args
        + [str(tmp / "ours")],
        capture_output=True, text=True, env=env, cwd=str(tmp))
    assert r.returncode == 0, r.stderr
    return ref, r.stdout
