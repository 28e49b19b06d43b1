"""Differential tests for match postprocessing and aux tools:
vmatchselect, vmatch -i/-best/-sort, vseqinfo/vseqselect/vsubseqselect
(reference: vmatsel.mn.c, matsort.c, bestmatch.c, smcontain.c,
vmatcount.c, Mkvtree/vseq*.c)."""

import os
import subprocess
import sys

import pytest

from tests.test_complete_cli import MKVTREE, TESTDATA, VMATCH, needs_ref

REF_SRC = "/root/repo/.ref-build/src"
VMATCHSELECT = os.path.join(REF_SRC, "Vmatch/vmatchselect.x")
VSEQINFO = os.path.join(REF_SRC, "Mkvtree/vseqinfo.x")
VSEQSELECT = os.path.join(REF_SRC, "Mkvtree/vseqselect.x")
VSUBSEQSELECT = os.path.join(REF_SRC, "Mkvtree/vsubseqselect.x")

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")


def ours(mod, args, cwd):
    return subprocess.run(
        [sys.executable, "-m", f"vstree_tpu.cli.{mod}"] + args,
        capture_output=True, text=True, env=ENV, cwd=cwd,
    ).stdout


def ref(binary, args):
    return subprocess.run(
        [binary] + args, capture_output=True, text=True
    ).stdout


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pp")
    src = os.path.join(TESTDATA, "swiss10K")
    subprocess.run(
        [MKVTREE, "-db", src, "-protein", "-pl", "-allout",
         "-indexname", str(tmp / "ref")],
        check=True, capture_output=True,
    )
    subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.mkvtree", "-db", src,
         "-protein", "-pl", "-allout", "-indexname",
         str(tmp / "ours")],
        check=True, capture_output=True, env=ENV, cwd=str(tmp),
    )
    # match files for vmatchselect
    rm = ref(VMATCH, ["-l", "15", str(tmp / "ref")])
    (tmp / "ref.match").write_text(rm)
    om = ours("vmatch", ["-l", "15", str(tmp / "ours")], str(tmp))
    (tmp / "our.match").write_text(om)
    return tmp


def rows(s):
    return [l for l in s.splitlines() if not l.startswith("#")]


@needs_ref
@pytest.mark.parametrize("args", [
    [], ["-sort", "la"], ["-sort", "ia", "-best", "5"],
    ["-sort", "ed"], ["-best", "10"], ["-sort", "idd"],
])
def test_vmatchselect(setup, args):
    tmp = setup
    r = ref(VMATCHSELECT, args + [str(tmp / "ref.match")])
    o = ours("vmatchselect", args + [str(tmp / "our.match")],
             str(tmp))
    assert sorted(rows(r)) == sorted(rows(o))


@needs_ref
@pytest.mark.parametrize("args", [
    ["-i", "-l", "15"],
    ["-l", "15", "-best", "5"],
    ["-l", "15", "-best", "40", "-sort", "ld"],
    ["-l", "15", "-best", "40", "-sort", "ia"],
])
def test_vmatch_best_preinfo(setup, args):
    tmp = setup
    r = ref(VMATCH, args + [str(tmp / "ref")])
    o = ours("vmatch", args + [str(tmp / "ours")], str(tmp))
    r_b = [l for l in r.splitlines() if not l.startswith("# args")]
    o_b = [l for l in o.splitlines() if not l.startswith("# args")]
    assert r_b == o_b


@needs_ref
def test_vseqinfo(setup):
    tmp = setup
    r = ref(VSEQINFO, [str(tmp / "ref")])
    o = ours("vseqinfo", [str(tmp / "ours")], str(tmp))
    assert r == o


@needs_ref
def test_vseqselect(setup):
    tmp = setup
    r = ref(VSEQSELECT,
            ["-minlength", "100", "-maxlength", "150",
             str(tmp / "ref")])
    o = ours("vseqselect",
             ["-minlength", "100", "-maxlength", "150",
              str(tmp / "ours")], str(tmp))
    assert r == o
    nums = tmp / "nums.txt"
    nums.write_text("5\n2\n9\n")
    r = ref(VSEQSELECT, ["-seqnum", str(nums), str(tmp / "ref")])
    o = ours("vseqselect", ["-seqnum", str(nums), str(tmp / "ours")],
             str(tmp))
    assert r == o


@needs_ref
def test_vsubseqselect(setup):
    tmp = setup
    r = ref(VSUBSEQSELECT,
            ["-seq", "25", "4", "7", str(tmp / "ref")])
    o = ours("vsubseqselect",
             ["-seq", "25", "4", "7", str(tmp / "ours")], str(tmp))
    assert (r.replace(str(tmp / "ref"), "X")
            == o.replace(str(tmp / "ours"), "X"))
    r = ref(VSUBSEQSELECT, ["-range", "50", "120", str(tmp / "ref")])
    o = ours("vsubseqselect", ["-range", "50", "120",
                               str(tmp / "ours")], str(tmp))
    assert (r.replace(str(tmp / "ref"), "X")
            == o.replace(str(tmp / "ours"), "X"))
