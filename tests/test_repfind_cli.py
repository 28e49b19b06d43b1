"""repfind emulation (reference Emulate/repfind.pl): differential
tests running the Perl original (with mkvtree.x/vmatch.x shims on
PATH) against our repfind CLI in separate directories."""

import os
import shutil
import subprocess
import sys

import pytest

REF = "/root/repo/.ref-build/src"
PERL = "/root/reference/src/Emulate/repfind.pl"
DATA = "/root/reference/src/testdata/at1MB"

needs_ref = pytest.mark.skipif(
    not (os.path.exists(os.path.join(REF, "Vmatch", "vmatch.x"))
         and os.path.exists(PERL)),
    reason="reference binaries not built",
)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("repfind")
    ra, rb, shim = base / "ref", base / "ours", base / "bin"
    for d in (ra, rb, shim):
        d.mkdir()
    os.symlink(os.path.join(REF, "Mkvtree", "mkvtree.x"),
               shim / "mkvtree")
    os.symlink(os.path.join(REF, "Vmatch", "vmatch.x"),
               shim / "vmatch")
    with open(DATA, "rb") as fp:
        data = fp.read(20000)
    (ra / "db.fna").write_bytes(data)
    (rb / "db.fna").write_bytes(data)
    return ra, rb, shim


def _run_ref(ra, shim, opts):
    env = dict(os.environ)
    env["PATH"] = f"{shim}:{env['PATH']}"
    return subprocess.run(
        ["perl", PERL] + opts + ["db.fna"], cwd=str(ra), env=env,
        capture_output=True, text=True)


def _run_ours(rb, opts):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    return subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.repfind"] + opts
        + ["db.fna"], cwd=str(rb), env=env, capture_output=True,
        text=True)


def _norm(s, d):
    return s.replace(str(d) + "/", "").replace(
        "/root/reference/src/Emulate/repfind.pl", "repfind.pl")


@needs_ref
@pytest.mark.parametrize("opts", [
    ["-f", "-l", "15"],
    ["-p", "-l", "14"],
    ["-f", "-h", "3", "-l", "30"],
    ["-f", "-e", "3", "-l", "30", "-best", "20"],
    ["-f", "-l", "20", "-s", "-lw", "60"],
    ["-f", "-l", "40", "-s", "-iub"],
    ["-f", "-allmax", "-l", "25"],       # errors: -allmax needs -h/-e
    ["-f", "-l", "15", "-nodistance", "-noevalue"],
    ["-f", "-l", "15", "-i"],            # errors: -i excludes -absolute
    ["-f", "-h", "-l", "30"],            # Perl arg-consumption quirk
    ["-p", "-f", "-l", "13"],
])
def test_repfind_parity(dirs, opts):
    ra, rb, shim = dirs
    ref = _run_ref(ra, shim, opts)
    ours = _run_ours(rb, opts)
    assert _norm(ref.stdout, ra) == _norm(ours.stdout, rb)
    # stderr: compare everything except the "# cmd" echo lines
    def errlines(s, d):
        return [ln for ln in _norm(s, d).splitlines()
                if not ln.startswith("# ")]
    assert errlines(ref.stderr, ra) == errlines(ours.stderr, rb)
    assert (ref.returncode == 0) == (ours.returncode == 0)


@needs_ref
def test_repfind_help_and_version(dirs):
    ra, rb, shim = dirs
    ref = _run_ref(ra, shim, ["-help"])
    ours = _run_ours(rb, ["-help"])
    assert ref.stdout == ours.stdout
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    bad = subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.repfind"],
        cwd=str(rb), env=env, capture_output=True, text=True)
    assert bad.returncode == 1
    assert "Missing Arguments" in bad.stderr
