"""q-gram hits + on-the-fly chaining (reference kurtz/produceqhits.c,
kurtz/onflychain.c): differential tests against the reference's
libtest driver chainqhits.c compiled on the fly against the
.ref-build libraries, plus a brute-force self-check."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/src"
REF_BUILD = "/root/repo/.ref-build/src"
MKVTREE = os.path.join(REF_BUILD, "Mkvtree", "mkvtree.x")

needs_ref = pytest.mark.skipif(
    not os.path.exists(MKVTREE) or shutil.which("gcc") is None,
    reason="reference build or gcc not available",
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("qhits")
    oracle = tmp / "chainqhits.x"
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(oracle),
         f"-I{REF_SRC}/include", f"-I{REF_BUILD}/include", "-DDEBUG",
         f"{REF_SRC}/kurtz/libtest/chainqhits.c",
         f"-L{REF_BUILD}/lib/64bit",
         "-lkurtz.dbg", "-lkurtz-basic.dbg", "-lm", "-lz"],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[:200]}")
    with open(f"{REF_SRC}/testdata/at1MB", "rb") as fp:
        data = fp.read(20000)
    (tmp / "db.fna").write_bytes(data)
    with open(f"{REF_SRC}/testdata/at1MB", "rb") as fp:
        fp.seek(30000)
        q = fp.read(8000)
    (tmp / "q.fna").write_bytes(b">q\n" + q.split(b"\n", 1)[1][:6000])
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    subprocess.run(
        [MKVTREE, "-indexname", str(tmp / "refidx"), "-db",
         str(tmp / "db.fna"), "-tis", "-suf", "-bck", "-lcp",
         "-sti1", "-dna", "-pl"],
        check=True, capture_output=True, cwd=str(tmp))
    subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.mkvtree", "-indexname",
         str(tmp / "ouridx"), "-db", str(tmp / "db.fna"), "-tis",
         "-suf", "-bck", "-lcp", "-sti1", "-dna", "-pl"],
        check=True, capture_output=True, env=env, cwd=str(tmp))
    return tmp, str(oracle)


def _chains(output: str):
    return [ln for ln in output.splitlines() if ln.startswith("chain ")]


@needs_ref
@pytest.mark.parametrize("mode,L,d", [
    ("nocheckqhit", 10, 5),
    ("nocheckleast", 10, 5),
    ("nocheckqhit", 12, 8),
    ("nocheckleast", 14, 3),
])
def test_chainqhits_parity(setup, mode, L, d):
    tmp, oracle = setup
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    ref = subprocess.run(
        [oracle, str(L), str(d), str(tmp / "refidx"),
         str(tmp / "q.fna"), mode],
        capture_output=True, text=True, cwd=str(tmp))
    ours = subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.chainqhits", str(L),
         str(d), str(tmp / "ouridx"), str(tmp / "q.fna"), mode],
        capture_output=True, text=True, env=env, cwd=str(tmp))
    assert ours.returncode == 0, ours.stderr
    assert _chains(ref.stdout) == _chains(ours.stdout)


@needs_ref
@pytest.mark.parametrize("mode", ["checkqhit", "checkleast"])
def test_chainqhits_brute_check(setup, mode):
    tmp, _ = setup
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    ours = subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.chainqhits", "11", "6",
         str(tmp / "ouridx"), str(tmp / "q.fna"), mode],
        capture_output=True, text=True, env=env, cwd=str(tmp))
    assert ours.returncode == 0, ours.stderr
    assert "check okay" in ours.stdout
