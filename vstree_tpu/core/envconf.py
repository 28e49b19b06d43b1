"""Environment-variable configuration layer (reference
doc/virtman.tex:4629ff): checkenvvaronoff semantics (kurtz-basic/
checkonoff.c: value must be "on" or "off"), MKVTREESMAPDIR symbol-map
search path (mkvprocess.c:523 scanpathsforfile), VMATCHSHOWTIMESPACE
(vmatch.mn.c:44-52,91-96), VMATCHRELATIVEINDEXPATH (procargs.c:61),
QUERYSPEEDUP (parsevm.c:466-483)."""

from __future__ import annotations

import os


def check_env_on_off(varname: str) -> bool:
    """checkenvvaronoff (checkonoff.c:20-39)."""
    v = os.environ.get(varname)
    if v is None:
        return False
    if v == "on":
        return True
    if v == "off":
        return False
    raise SystemExit(
        f'environment variable {varname} must set "on" or "off"')


def scan_paths_for_file(envvar: str, filename: str) -> str:
    """scanpathsforfile: the file itself, else each :-separated
    directory of the environment variable."""
    if os.path.exists(filename):
        return filename
    for p in os.environ.get(envvar, "").split(":"):
        if p:
            cand = os.path.join(p, filename)
            if os.path.exists(cand):
                return cand
    raise SystemExit(
        f'cannot find file "{filename}" (also searched ${envvar})')


def configure_compile_cache() -> None:
    """Point JAX at the persistent XLA compile cache so CLI runs
    reuse compilations across processes (pairs with
    ``python -m vstree_tpu.prewarm``; VSTREE_COMPILE_CACHE overrides
    the default ``~/.cache/vstree_tpu/xla``, "off" disables)."""
    cache = os.environ.get(
        "VSTREE_COMPILE_CACHE",
        os.path.expanduser("~/.cache/vstree_tpu/xla"))
    if cache == "off":
        return
    # cache loads can emit C++-side glog chatter (e.g. the AOT
    # cpu-feature advisory) on stderr, which must stay byte-clean for
    # the reference-parity contract of the CLIs
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    try:
        import hashlib

        import jax

        # segregate entries per (platform, XLA_FLAGS): AOT artifacts
        # compiled under one backend configuration trip cpu-feature
        # advisories (stderr noise) when loaded under another
        tag = "%s-%s" % (
            jax.default_backend(),
            hashlib.sha1(os.environ.get("XLA_FLAGS", "")
                         .encode()).hexdigest()[:8])
        cache = os.path.join(cache, tag)
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
