#!/usr/bin/env python
"""Headline benchmark: exact complete-match query throughput.

Workload (BASELINE.md config 1): at1MB index, 100k random substring
queries of length 24-36.  Measures steady-state device throughput of
the batched interval search (the framework's hot query path) in
queries/s and compares against single-core reference `vmatch.x
-complete` wall time on the identical workload.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "queries/s", "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

TESTDATA = "/root/reference/src/testdata/at1MB"
REF_VMATCH = os.path.join(REPO, ".ref-build/src/Vmatch/vmatch.x")
REF_MKVTREE = os.path.join(REPO, ".ref-build/src/Mkvtree/mkvtree.x")
# single-core reference throughput on this workload, measured on the
# build machine (vmatch.x -complete -q 100k queries vs at1MB index:
# 0.355 s wall); used when the reference binaries are absent
REF_QPS_FALLBACK = 282_000.0

B = 100_000
MINLEN, MAXLEN = 24, 37
SEED = 99


def sample_queries(text: np.ndarray, wildcard: int = 250):
    rng = np.random.default_rng(SEED)
    n = text.size
    plens = rng.integers(MINLEN, MAXLEN, size=B).astype(np.int32)
    starts = rng.integers(0, n - MAXLEN, size=B)
    maxplen = MAXLEN - 1
    idx = starts[:, None] + np.arange(maxplen)[None, :]
    pats = text[idx].astype(np.int32)
    # avoid wildcard/separator-containing windows (resample once; the
    # handful left after that just produce empty intervals)
    bad = (pats >= wildcard).any(axis=1)
    if bad.any():
        starts2 = rng.integers(0, n - MAXLEN, size=int(bad.sum()))
        idx2 = starts2[:, None] + np.arange(maxplen)[None, :]
        pats[bad] = text[idx2].astype(np.int32)
    mask = np.arange(maxplen)[None, :] < plens[:, None]
    pats = np.where(mask, pats, -1).astype(np.int32)
    return pats, plens, maxplen


def ref_baseline_qps(tmpdir: str, query_fasta: str) -> float:
    if not (os.path.exists(REF_VMATCH) and os.path.exists(REF_MKVTREE)):
        return REF_QPS_FALLBACK
    idx = os.path.join(tmpdir, "refidx")
    r = subprocess.run(
        [REF_MKVTREE, "-db", TESTDATA, "-dna", "-pl", "-allout",
         "-indexname", idx], capture_output=True)
    if r.returncode != 0:
        return REF_QPS_FALLBACK
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = subprocess.run(
            [REF_VMATCH, "-complete", "-q", query_fasta, idx],
            capture_output=True)
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            return REF_QPS_FALLBACK
        best = min(best, dt)
    return B / best


def main():
    import jax

    # persistent compile cache: repeat bench runs skip XLA compilation
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vstree_tpu.core.alphabet import dna_alphabet
    from vstree_tpu.core.multiseq import read_multiseq
    from vstree_tpu.engine.complete import exact_interval_lookup
    from vstree_tpu.index.build import build_esa

    alpha = dna_alphabet()
    ms = read_multiseq([TESTDATA], alpha)
    text = ms.sequence
    n = int(text.size)
    esa = build_esa(ms, alpha, demand=("suf", "bck"))

    pats, plens, maxplen = sample_queries(text)

    def run():
        return exact_interval_lookup(esa, pats, plens)

    lo, hi = run()  # compile + warm (also builds aux tables)
    nhits = int((hi - lo).clip(0).sum())
    reps = 5
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    qps = B / best

    # reference baseline on the identical workload
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        qf = os.path.join(tmp, "q.fna")
        inv = np.array(["a", "c", "g", "t"])
        with open(qf, "w") as fh:
            for i in range(B):
                s = "".join(inv[c] for c in pats[i, : plens[i]]
                            if 0 <= c < 4)
                fh.write(f">q{i}\n{s}\n")
        ref_qps = ref_baseline_qps(tmp, qf)

    print(json.dumps({
        "metric": "exact_complete_match_throughput",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / ref_qps, 2),
        "detail": {
            "n_queries": B, "text_bp": n, "total_hits": nhits,
            "batch_seconds": round(best, 5),
            "ref_qps": round(ref_qps, 1),
            "device": str(jax.devices()[0].platform),
        },
    }))


if __name__ == "__main__":
    main()
