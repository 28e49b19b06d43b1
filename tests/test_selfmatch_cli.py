"""Differential tests for self-match tasks (-supermax, -l maximal
repeats, -tandem) against the reference binary (SURVEY.md §4 oracle
pattern; reference engines: fsuper.c, vmatfind.c, ftandem.c)."""

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

CORPORA = [
    ("at100K1", "-dna"),
    ("Grumbach/Wildcards.fna", "-dna"),
    ("swiss10K", "-protein"),
]


@pytest.fixture(scope="module")
def indexes(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("selfm")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    built = {}
    for rel, alpha in CORPORA:
        src = os.path.join(TESTDATA, rel)
        name = os.path.basename(rel).replace(".fna", "")
        subprocess.run(
            [MKVTREE, "-db", src, alpha, "-pl", "-allout",
             "-indexname", str(tmp / f"ref_{name}")],
            check=True, capture_output=True,
        )
        subprocess.run(
            [sys.executable, "-m", "vstree_tpu.cli.mkvtree", "-db", src,
             alpha, "-pl", "-allout",
             "-indexname", str(tmp / f"our_{name}")],
            check=True, capture_output=True, env=env, cwd=str(tmp),
        )
        built[name] = tmp
    return built


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


def body_sorted(s):
    return sorted(l for l in s.splitlines() if not l.startswith("#"))


def body(s):
    return [l for l in s.splitlines() if not l.startswith("#")]


@needs_ref
@pytest.mark.parametrize("name", [n for (r, a) in CORPORA
                                  for n in [os.path.basename(r).replace(".fna", "")]])
@pytest.mark.parametrize("task", [
    ["-supermax", "-l", "15"],
    ["-l", "15"],
    ["-tandem", "-l", "8"],
    ["-supermax", "-l", "15", "-absolute"],
])
def test_selfmatch_parity(indexes, name, task):
    tmp = indexes[name]
    ref = run_ref(task + [str(tmp / f"ref_{name}")])
    ours = run_ours(task + [str(tmp / f"our_{name}")], cwd=str(tmp))
    # all self-match tasks emit in the reference's exact traversal
    # order (fsuper.c right-boundary order; vmatfind.c computed
    # emission key; ftandem.c witness-scan replay in engine/tandem.py)
    assert body(ref) == body(ours)


@needs_ref
def test_supermax_emission_order(indexes):
    """Supermax intervals complete in right-boundary order, so even the
    unsorted emission should match the reference exactly."""
    tmp = indexes["at100K1"]
    ref = run_ref(["-supermax", "-l", "20", str(tmp / "ref_at100K1")])
    ours = run_ours(["-supermax", "-l", "20", str(tmp / "our_at100K1")],
                    cwd=str(tmp))
    ref_b = [l for l in ref.splitlines() if not l.startswith("#")]
    our_b = [l for l in ours.splitlines() if not l.startswith("#")]
    assert ref_b == our_b
    assert len(ref_b) > 0


@pytest.fixture(scope="module")
def dbq_indexes(tmp_path_factory):
    """Indexes built over db + query files (mkvtree -q) for the
    indexed-query self tasks (fmumself.c, fself.c:33-36)."""
    tmp = tmp_path_factory.mktemp("mumself")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    db = os.path.join(TESTDATA, "at100K1")
    q = os.path.join(TESTDATA, "U89959.fna")
    subprocess.run(
        [MKVTREE, "-db", db, "-q", q, "-dna", "-pl", "-allout",
         "-indexname", str(tmp / "ref_dbq")],
        check=True, capture_output=True,
    )
    subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.mkvtree", "-db", db,
         "-q", q, "-dna", "-pl", "-allout",
         "-indexname", str(tmp / "our_dbq")],
        check=True, capture_output=True, env=env, cwd=str(tmp),
    )
    return tmp


@needs_ref
@pytest.mark.parametrize("task", [
    ["-mum", "-l", "15"],
    ["-mum", "-l", "20", "-absolute"],
    ["-l", "20"],          # crossing filter (fself.c:33-36)
    ["-l", "30", "-e", "3"],
])
def test_mumself_and_crossing_parity(dbq_indexes, task):
    tmp = dbq_indexes
    ref = run_ref(task + [str(tmp / "ref_dbq")])
    ours = run_ours(task + [str(tmp / "our_dbq")], cwd=str(tmp))
    if task[0] == "-l" and len(task) == 2:
        assert body(ref) == body(ours)
    else:
        assert body_sorted(ref) == body_sorted(ours)


def test_ref_order_computed_key_equals_simulator(rng):
    """The vectorized computed-emission-key path (repeats.py
    maximal_pairs_ref_order_vec) must replicate the stack simulator
    (the differential oracle for vmatfind.c order) exactly, including
    deep nesting and special chars."""
    import numpy as np

    from vstree_tpu.core.alphabet import dna_alphabet
    from vstree_tpu.core.multiseq import Multiseq
    from vstree_tpu.engine.repeats import (
        find_maximal_pairs_ref,
        find_maximal_pairs_ref_sim,
    )
    from vstree_tpu.index.build import build_esa

    for sig in (2, 4):
        n = 2000
        text = rng.integers(0, sig, size=n).astype(np.uint8)
        text[rng.choice(n, 8, replace=False)] = 254
        text[rng.choice(n, 3, replace=False)] = 255
        ms = Multiseq(
            sequence=text,
            markpos=np.flatnonzero(text == 255).astype(np.int64),
        )
        ms.totallength = n
        esa = build_esa(ms, dna_alphabet(),
                        demand=("suf", "lcp", "bwt", "bck", "sti"))
        for L in (2, 3, 6):
            a = find_maximal_pairs_ref_sim(esa, L)
            b = find_maximal_pairs_ref(esa, L)
            for f in ("length1", "position1", "position2", "length2"):
                assert np.array_equal(getattr(a, f), getattr(b, f)), \
                    (sig, L, f)


@needs_ref
@pytest.mark.parametrize("task", [
    ["-l", "25", "-i"],
    ["-l", "10", "-i"],
    ["-supermax", "-l", "20", "-i"],
    ["-tandem", "-l", "10", "-i"],
])
def test_preinfo_histogram_parity(indexes, task):
    """-i match-count distribution (vmatcount.c via distri.c) —
    byte-identical header + per-length counts."""
    tmp = indexes["at100K1"]
    ref = run_ref(task + [str(tmp / "ref_at100K1")])
    ours = run_ours(task + ["our_at100K1"], str(tmp))
    assert body_sorted(ref) == body_sorted(ours)
    assert body(ref) == body(ours)
