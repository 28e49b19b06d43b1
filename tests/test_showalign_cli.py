"""Differential tests for -s alignment display (reference
src/kurtz/showalign.c block renderer + src/Vmatch/echomatch.c
echostringoutput / abbrev modes / vmechoexactmatch) and for the
approx-complete emission order (splitesaapm region pipeline,
src/Vmengine/splitesaapm.c:380-560).

Complete-match tasks are compared BYTE-FOR-BYTE (their emission order
is reproduced exactly); self-match tasks, whose traversal order is not
yet reproduced, are compared as sorted multisets of match blocks."""

import os
import random
import re
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
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("showalign")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    src = os.path.join(TESTDATA, "at100K1")
    subprocess.run(
        [MKVTREE, "-db", src, "-dna", "-pl", "-allout",
         "-indexname", str(tmp / "ref_idx")],
        check=True, capture_output=True,
    )
    subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.mkvtree", "-db", src,
         "-dna", "-pl", "-allout", "-indexname", str(tmp / "our_idx")],
        check=True, capture_output=True, env=env, cwd=str(tmp),
    )
    # mutated substrings of the database as queries
    rng = random.Random(5)
    seq = re.sub(r"[^acgtACGT]", "", open(src).read().split("\n", 1)[1])
    with open(tmp / "q.fna", "w") as f:
        for i in range(40):
            off = rng.randrange(0, len(seq) - 80)
            s = list(seq[off:off + 60])
            for _ in range(rng.randrange(0, 3)):
                p = rng.randrange(len(s))
                op = rng.random()
                if op < 0.5:
                    s[p] = rng.choice("acgt")
                elif op < 0.75:
                    del s[p]
                else:
                    s.insert(p, rng.choice("acgt"))
            f.write(f">q{i}\n{''.join(s)}\n")
    return tmp


def run_pair(tmp, args):
    ref = subprocess.run(
        [VMATCH] + args + [str(tmp / "ref_idx")],
        capture_output=True, text=True,
    ).stdout.replace(str(tmp / "ref_idx"), "IDX")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    ours = subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.vmatch"] + args
        + [str(tmp / "our_idx")],
        capture_output=True, text=True, env=env, cwd=str(tmp),
    ).stdout.replace(str(tmp / "our_idx"), "IDX")
    return ref, ours


COMPLETE_TASKS = [
    ["-complete", "-q", "q.fna", "-s"],
    ["-complete", "-e", "3", "-q", "q.fna", "-s"],
    ["-complete", "-e", "3", "-q", "q.fna", "-s", "45"],
    ["-complete", "-h", "2", "-q", "q.fna", "-s"],
    ["-complete", "-e", "2", "-q", "q.fna", "-s", "abbrev"],
    ["-complete", "-h", "2", "-q", "q.fna", "-s", "abbrev"],
    ["-complete", "-h", "2", "-q", "q.fna", "-s", "abbreviub"],
    ["-complete", "-e", "2", "-q", "q.fna", "-p", "-s"],
    ["-complete", "-e", "1", "-q", "q.fna"],
    ["-complete", "-h", "1", "-q", "q.fna"],
    ["-complete", "-e", "4", "-q", "q.fna"],
]


@needs_ref
@pytest.mark.parametrize(
    "task", COMPLETE_TASKS, ids=[" ".join(t) for t in COMPLETE_TASKS]
)
def test_complete_showalign_byte_parity(setup, task):
    ref, ours = run_pair(setup, [a.replace("q.fna",
                                           str(setup / "q.fna"))
                                 for a in task])
    ref = ref.replace(str(setup / "q.fna"), "QRY")
    ours = ours.replace(str(setup / "q.fna"), "QRY")
    assert ref == ours


def match_blocks(txt):
    """Split -s output into per-match blocks (row + its alignment),
    robust to the emission order differing."""
    body = [l for l in txt.splitlines() if not l.startswith("#")]
    blks, cur, empties = [], [], 0
    for l in body:
        cur.append(l)
        empties = empties + 1 if l == "" else 0
        if empties == 2:
            blks.append("\n".join(cur).rstrip("\n"))
            cur, empties = [], 0
    if any(x.strip() for x in cur):
        blks.append("\n".join(cur).rstrip("\n"))
    return sorted(blks)


SELF_TASKS = [
    ["-l", "30", "-s"],
    ["-l", "25", "-e", "2", "-s"],
    ["-l", "25", "-h", "2", "-s"],
    ["-l", "30", "-s", "40"],
]


@needs_ref
@pytest.mark.parametrize(
    "task", SELF_TASKS, ids=[" ".join(t) for t in SELF_TASKS]
)
def test_selfmatch_showalign_block_parity(setup, task):
    ref, ours = run_pair(setup, task)
    assert match_blocks(ref) == match_blocks(ours)


def _body(s):
    return [l for l in s.splitlines() if not l.startswith("#")]


@needs_ref
@pytest.mark.parametrize("task", [
    ["-l", "40", "-exdrop", "3", "-s"],
    ["-l", "30", "-hxdrop", "2", "-s"],
    ["-l", "40", "-exdrop", "5", "-s", "abbrev"],
])
def test_xdrop_alignment_display_parity(setup, task):
    """-exdrop/-hxdrop -s alignment blocks byte-identical
    (output/xdropalign.py vs xdropal2.c onexdropalignment2)."""
    ref, ours = run_pair(setup, task)
    assert _body(ref) == _body(ours)


@needs_ref
@pytest.mark.parametrize("task", [
    ["-supermax", "-l", "25", "-showdesc", "10"],
    ["-l", "40", "-showdesc", "(2,8)"],
    ["-supermax", "-l", "25", "-f"],
])
def test_showdesc_and_filename_parity(setup, task):
    ref, ours = run_pair(setup, task)
    assert _body(ref) == _body(ours)


@needs_ref
@pytest.mark.parametrize("task", [
    ["-l", "40", "-s", "xml"],
    ["-l", "35", "-e", "2", "-s", "xml"],
    ["-supermax", "-l", "25", "-s", "xml"],
    ["-l", "30", "-exdrop", "3", "-s", "xml"],
    ["-l", "40", "-s", "xml", "-showdesc", "10"],
])
def test_xml_output_parity(setup, task):
    """-s xml (xmlfunc.c + showeditopinxml), byte-identical modulo
    the index path inside <Vmatchindex>."""
    ref, ours = run_pair(setup, task)
    assert ref.replace("IDX", "") == ours.replace("IDX", "")
    assert "<Vmatchoutput>" in ours
