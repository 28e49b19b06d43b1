"""Differential tests: matchcluster + vmatch -pp {chain,matchcluster}
+ -dbcluster/-nonredundant vs the reference binaries.

Reference drivers: src/Vmatch/matchcl.mn.c, allmclust.c, clpos.c,
cluedist.c, chainvm.c, vmcluster.c.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = os.path.join(REPO, ".ref-build/src")
MKVTREE = os.path.join(REF_SRC, "Mkvtree/mkvtree.x")
VMATCH = os.path.join(REF_SRC, "Vmatch/vmatch.x")
MATCHCLUSTER = os.path.join(REF_SRC, "Vmatch/matchcluster.x")
TESTDATA = "/root/reference/src/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MATCHCLUSTER), reason="reference not built")


def ours(mod, args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", f"vstree_tpu.cli.{mod}"] + args,
        capture_output=True, text=True, cwd=cwd, env=env)
    assert r.returncode == 0, r.stderr
    return r.stdout


def ref(binary, args, cwd):
    r = subprocess.run([binary] + args, capture_output=True, text=True,
                       cwd=cwd)
    assert r.returncode == 0, r.stderr
    return r.stdout


def cluster_lines(s):
    return [ln for ln in s.splitlines()
            if ln.startswith("# cluster") or ln.startswith("# create")
            or ln.startswith("# chain")]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mcl")
    idx = str(tmp / "at1")
    ref(MKVTREE, ["-db", os.path.join(TESTDATA, "at100K1"), "-dna",
                  "-pl", "-allout", "-indexname", idx], str(tmp))
    mfile = str(tmp / "self30.match")
    with open(mfile, "w") as fh:
        fh.write(ref(VMATCH, ["-l", "30", idx], str(tmp)))
    idxe = str(tmp / "atE")
    ref(MKVTREE, ["-db", os.path.join(TESTDATA, "at1MB"), "-dna",
                  "-pl", "-allout", "-indexname", idxe], str(tmp))
    return tmp, idx, mfile, idxe


def _cmp_files(refdir, ourdir, prefix):
    reffiles = sorted(f for f in os.listdir(refdir)
                      if f.startswith(prefix))
    ourfiles = sorted(f for f in os.listdir(ourdir)
                      if f.startswith(prefix))
    assert reffiles == ourfiles
    assert reffiles, f"no {prefix}* files produced"
    for f in reffiles:
        with open(os.path.join(refdir, f)) as a, \
                open(os.path.join(ourdir, f)) as b:
            assert a.read() == b.read(), f


@pytest.mark.parametrize("args", [
    ["-gapsize", "100"],
    ["-gapsize", "0"],
    ["-overlap", "50"],
    ["-overlap", "90"],
    ["-erate", "10"],
])
def test_matchcluster_standalone(setup, args):
    tmp, idx, mfile, _ = setup
    tag = "".join(a.strip("-") for a in args)
    rdir = tmp / f"ref_{tag}"
    odir = tmp / f"our_{tag}"
    rdir.mkdir()
    odir.mkdir()
    r = ref(MATCHCLUSTER, args + ["-outprefix", "cl", mfile],
            str(rdir))
    o = ours("matchcluster", args + ["-outprefix", "cl", mfile],
             str(odir))
    assert cluster_lines(r) == cluster_lines(o)
    _cmp_files(str(rdir), str(odir), "cl.")


def test_vmatch_pp_matchcluster(setup):
    tmp, idx, mfile, _ = setup
    rdir = tmp / "ref_ppmcl"
    odir = tmp / "our_ppmcl"
    rdir.mkdir()
    odir.mkdir()
    args = ["-l", "30", "-pp", "matchcluster", "gapsize", "100",
            "outprefix", "vcl", idx]
    r = ref(VMATCH, args, str(rdir))
    o = ours("vmatch", args, str(odir))
    assert cluster_lines(r) == cluster_lines(o)
    _cmp_files(str(rdir), str(odir), "vcl.")


@pytest.mark.parametrize("chainargs", [
    ["global"],
    ["global", "gc"],
    ["local"],
    ["local", "silent"],
])
def test_vmatch_pp_chain(setup, chainargs):
    tmp, idx, mfile, _ = setup
    args = ["-l", "30", "-pp", "chain"] + chainargs + [idx]
    r = ref(VMATCH, args, str(tmp))
    o = ours("vmatch", args, str(tmp))
    # normalize the absolute index path in the header
    rl = r.splitlines()
    ol = o.splitlines()
    assert rl[1:] == ol[1:], (rl[:5], ol[:5])


def test_vmatch_pp_chain_outprefix(setup):
    tmp, idx, mfile, _ = setup
    rdir = tmp / "ref_chout"
    odir = tmp / "our_chout"
    rdir.mkdir()
    odir.mkdir()
    args = ["-l", "30", "-pp", "chain", "local", "outprefix", "ch",
            idx]
    r = ref(VMATCH, args, str(rdir))
    o = ours("vmatch", args, str(odir))
    reffiles = sorted(f for f in os.listdir(str(rdir))
                      if f.endswith(".chain"))
    ourfiles = sorted(f for f in os.listdir(str(odir))
                      if f.endswith(".chain"))
    assert reffiles == ourfiles and reffiles
    for f in reffiles:
        with open(os.path.join(str(rdir), f)) as a, \
                open(os.path.join(str(odir), f)) as b:
            ra = [ln for ln in a.read().splitlines()
                  if not ln.startswith("# args=")]
            rb = [ln for ln in b.read().splitlines()
                  if not ln.startswith("# args=")]
            assert ra == rb, f


@pytest.mark.parametrize("dbargs,nonred", [
    (["-l", "400", "-dbcluster", "30", "30"], False),
    (["-l", "300", "-dbcluster", "50", "50"], False),
    (["-l", "400", "-dbcluster", "30", "30"], True),
])
def test_vmatch_dbcluster(setup, dbargs, nonred):
    tmp, idx, mfile, idxe = setup
    tag = "".join(a.strip("-") for a in dbargs) + ("nr" if nonred else "")
    rdir = tmp / f"ref_db{tag}"
    odir = tmp / f"our_db{tag}"
    rdir.mkdir()
    odir.mkdir()
    args = list(dbargs)
    if nonred:
        args += ["-nonredundant", "nr.fna"]
    args += [idxe]
    r = ref(VMATCH, args, str(rdir))
    o = ours("vmatch", args, str(odir))
    rl = [ln for ln in r.splitlines() if not ln.startswith("# args=")]
    ol = [ln for ln in o.splitlines() if not ln.startswith("# args=")]
    assert rl == ol
    if nonred:
        with open(rdir / "nr.fna") as a, open(odir / "nr.fna") as b:
            assert a.read() == b.read()


def test_vmatch_dbcluster_prefix_files(setup):
    tmp, idx, mfile, idxe = setup
    rdir = tmp / "ref_dbpfx"
    odir = tmp / "our_dbpfx"
    rdir.mkdir()
    odir.mkdir()
    args = ["-l", "400", "-dbcluster", "30", "30", "dbc", idxe]
    r = ref(VMATCH, args, str(rdir))
    o = ours("vmatch", args, str(odir))
    rl = [ln for ln in r.splitlines() if not ln.startswith("# args=")]
    ol = [ln for ln in o.splitlines() if not ln.startswith("# args=")]
    assert rl == ol
    reffiles = sorted(f for f in os.listdir(str(rdir))
                      if f.startswith("dbc."))
    ourfiles = sorted(f for f in os.listdir(str(odir))
                      if f.startswith("dbc."))
    assert reffiles == ourfiles and reffiles
    for f in reffiles:
        with open(os.path.join(str(rdir), f)) as a, \
                open(os.path.join(str(odir), f)) as b:
            ra = [ln for ln in a.read().splitlines()
                  if not ln.startswith("# args=")]
            rb = [ln for ln in b.read().splitlines()
                  if not ln.startswith("# args=")]
            assert ra == rb, f
