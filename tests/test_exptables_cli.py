"""Differential tests for the experimental-table builders
(SURVEY §2.4 row: mksti/mkcld/mkiso/mklsf/mkcfr): byte-identical
output files vs the reference binaries, including the reference's
buffer-reuse quirk in mkcfr (.crf inherits unwritten .cfr entries)
and the release-mode unrefined suffix-link brackets of mklsf."""

import os
import subprocess
import sys

import pytest

REF_SRC = "/root/repo/.ref-build/src"
MK = os.path.join(REF_SRC, "Mkvtree")
TESTDATA = "/root/reference/src/testdata"

needs_ref = pytest.mark.skipif(
    not os.path.exists(os.path.join(MK, "mkcld.x")),
    reason="reference binaries not built")

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("exptab")
    src = os.path.join(TESTDATA, "at100K1")
    for args in (["-dna"], ["-dna", "-rev"]):
        subprocess.run(
            [os.path.join(MK, "mkvtree.x"), "-db", src] + args
            + ["-pl", "-allout", "-indexname", str(tmp / "ref")],
            check=True, capture_output=True, cwd=str(tmp))
        subprocess.run(
            [sys.executable, "-m", "vstree_tpu.cli.mkvtree", "-db",
             src] + args + ["-pl", "-allout", "-indexname",
                            str(tmp / "ours")],
            check=True, capture_output=True, env=ENV, cwd=str(tmp))
    return tmp


def _run(tool, ref_args, our_args, tmp):
    subprocess.run([os.path.join(MK, tool + ".x")] + ref_args,
                   check=True, capture_output=True, cwd=str(tmp))
    subprocess.run(
        [sys.executable, "-m", f"vstree_tpu.cli.{tool}"] + our_args,
        check=True, capture_output=True, env=ENV, cwd=str(tmp))


@needs_ref
@pytest.mark.parametrize("tool,exts", [
    ("mksti", ["sti"]),
    ("mkcld", ["cld", "cld1"]),
    ("mkiso", ["iso"]),
    ("mklsf", ["lsf"]),
])
def test_builder_byte_identical(idx, tool, exts):
    _run(tool, [str(idx / "ref")], [str(idx / "ours")], idx)
    for ext in exts:
        a = (idx / f"ref.{ext}").read_bytes()
        b = (idx / f"ours.{ext}").read_bytes()
        assert a == b, ext


@needs_ref
def test_mkcfr_byte_identical(idx):
    _run("mkcfr", [str(idx / "ref")], [str(idx / "ours")], idx)
    for name in ("ref.cfr", "ours.cfr"):
        assert (idx / name).exists()
    assert (idx / "ref.cfr").read_bytes() == \
        (idx / "ours.cfr").read_bytes()
    assert (idx / "ref.rev.crf").read_bytes() == \
        (idx / "ours.rev.crf").read_bytes()


@needs_ref
@pytest.mark.parametrize("flags,ext", [
    (["-rev"], "rev"), (["-cpl"], "cpl"), (["-rev", "-cpl"], "rcp"),
])
def test_mkvtree_transform_naming(idx, tmp_path, flags, ext):
    """mkvtree output-name policy + transform semantics
    (addindexsuffix, mkvtree.c:143-161): -rev reverses, -cpl
    complements (NOT reverse-complement), both combine."""
    src = os.path.join(TESTDATA, "at100K1")
    subprocess.run(
        [os.path.join(MK, "mkvtree.x"), "-db", src, "-dna"] + flags
        + ["-pl", "-allout", "-indexname", str(tmp_path / "r")],
        check=True, capture_output=True, cwd=str(tmp_path))
    subprocess.run(
        [sys.executable, "-m", "vstree_tpu.cli.mkvtree", "-db", src,
         "-dna"] + flags + ["-pl", "-allout", "-indexname",
                            str(tmp_path / "o")],
        check=True, capture_output=True, env=ENV, cwd=str(tmp_path))
    for tab in ("suf", "tis", "lcp"):
        a = (tmp_path / f"r.{ext}.{tab}").read_bytes()
        b = (tmp_path / f"o.{ext}.{tab}").read_bytes()
        assert a == b, (ext, tab)
