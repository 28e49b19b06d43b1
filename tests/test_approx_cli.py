"""Differential tests for approximate complete matching
(-complete -h/-e) against the reference binary (reference engines:
esahamming.c, esaapm.c, splitesaapm.c, longestmatch.c)."""

import os
import random
import subprocess
import sys

import pytest

from tests.test_complete_cli import (
    MKVTREE, TESTDATA, VMATCH, body, needs_ref, run_ref, run_ours,
)


def make_mutated_queries(fasta: str, path: str, num=20, seed=31) -> None:
    """Queries with injected substitutions/indels so approximate
    matches differ from exact ones."""
    rnd = random.Random(seed)
    data = open(fasta, "rb").read()
    entries = data.split(b">")[1:]
    out = []
    for i in range(num):
        e = rnd.choice(entries)
        seq = b"".join(e.split(b"\n")[1:])
        if len(seq) < 80:
            continue
        start = rnd.randrange(0, len(seq) - 60)
        ln = rnd.randrange(20, 45)
        s = bytearray(seq[start:start + ln])
        if any(c not in b"acgtACGT" for c in s):
            continue
        for _ in range(rnd.randrange(0, 3)):
            op = rnd.randrange(3)
            p = rnd.randrange(len(s))
            if op == 0:
                s[p] = rnd.choice(b"acgt")
            elif op == 1 and len(s) > 21:
                del s[p]
            else:
                s.insert(p, rnd.choice(b"acgt"))
        out.append(b">mq%d\n" % i + bytes(s) + b"\n")
    with open(path, "wb") as fh:
        fh.write(b"".join(out))


@pytest.fixture(scope="module")
def indexes(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("apx")
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
    ["-complete", "-h", "1"],
    ["-complete", "-h", "3"],
    ["-complete", "-e", "1"],
    ["-complete", "-e", "2"],
    ["-complete", "-e", "2", "-p"],
    ["-complete", "-e", "3", "-evalue", "1e-3"],
])
def test_approx_parity(indexes, task):
    tmp, qpath = indexes
    ref = run_ref(task + ["-q", qpath, str(tmp / "ref")])
    ours = run_ours(task + ["-q", qpath, str(tmp / "ours")],
                    cwd=str(tmp))
    assert sorted(body(ref)) == sorted(body(ours))


@needs_ref
def test_approx_finds_matches(indexes):
    tmp, qpath = indexes
    ref = run_ref(["-complete", "-e", "2", "-q", qpath,
                   str(tmp / "ref")])
    assert len(body(ref)) > 0
