"""Differential tests for `vmatch -complete` against the reference
binary (SURVEY.md §4: index-vs-reference oracle)."""

import os
import random
import subprocess
import sys

import numpy as np
import pytest

REF_SRC = "/root/repo/.ref-build/src"
MKVTREE = os.path.join(REF_SRC, "Mkvtree/mkvtree.x")
VMATCH = os.path.join(REF_SRC, "Vmatch/vmatch.x")
TESTDATA = "/root/reference/src/testdata"

needs_ref = pytest.mark.skipif(
    not os.path.exists(VMATCH), reason="reference binaries not built"
)


def make_queries(fasta: str, path: str, num=25, seed=11) -> None:
    rnd = random.Random(seed)
    data = open(fasta, "rb").read()
    entries = data.split(b">")[1:]
    out = []
    for i in range(num):
        e = rnd.choice(entries)
        seq = b"".join(e.split(b"\n")[1:])
        if len(seq) < 60:
            continue
        start = rnd.randrange(0, len(seq) - 50)
        ln = rnd.randrange(12, 50)
        s = seq[start:start + ln]
        if not s or any(c not in b"acgtACGT" for c in s):
            continue
        out.append(b">mq%d\n" % i + s + b"\n")
    # non-matching random queries
    for i in range(5):
        out.append(
            b">r%d\n" % i
            + bytes(rnd.choice(b"acgt") for _ in range(20)) + b"\n"
        )
    with open(path, "wb") as fh:
        fh.write(b"".join(out))


@pytest.fixture(scope="module")
def indexes(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cmpl")
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
    make_queries(src, str(qpath))
    return tmp, str(qpath)


def run_ref(args):
    return subprocess.run(
        [VMATCH] + args, capture_output=True, text=True
    ).stdout


def run_ours(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    return subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.vmatch"] + args,
        capture_output=True, text=True, env=env, cwd=cwd,
    ).stdout


def body(s):
    return [l for l in s.splitlines() if not l.startswith("#")]


@needs_ref
@pytest.mark.parametrize("extra", [
    [], ["-p"], ["-p", "-d"], ["-absolute"],
    ["-noevalue", "-noscore"], ["-evalue", "1e-8"], ["-nodist"],
])
def test_complete_parity(indexes, extra):
    tmp, qpath = indexes
    ref = run_ref(["-complete"] + extra + ["-q", qpath, str(tmp / "ref")])
    ours = run_ours(
        ["-complete"] + extra + ["-q", qpath, str(tmp / "ours")],
        cwd=str(tmp),
    )
    assert body(ref) == body(ours)
    if extra == []:
        assert len(body(ref)) > 0
