"""Sharded query matching vs single-device oracle (mirror of the
reference's shard-vs-monolith equality tests, bin/Checkmergeesa.sh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import random_dna_text
from vstree_tpu.index.build import suffix_sort
from vstree_tpu.parallel.mesh import make_mesh, sharded_exact_match


@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
def test_sharded_exact_match_counts(rng, ndev):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    n = 64 * ndev
    text = random_dna_text(rng, n, n_wild=2)
    suftab, _ = suffix_sort(text)
    mesh = make_mesh(jax.devices()[:ndev])
    sp = mesh.shape["sp"]
    dp = mesh.shape["dp"]
    R = ((n + 1 + sp - 1) // sp) * sp
    suf_pad = np.full(R, n, np.int32)
    suf_pad[: n + 1] = suftab

    maxplen = 10
    B = 8 * dp
    plens = rng.integers(4, maxplen + 1, size=B).astype(np.int32)
    patterns = np.full((B, maxplen), -1, np.int32)
    for i in range(B):
        s = int(rng.integers(0, n - maxplen))
        patterns[i, : plens[i]] = text[s : s + plens[i]].astype(np.int32)

    counts, first = sharded_exact_match(
        mesh, jnp.asarray(text), jnp.asarray(suf_pad),
        jnp.asarray(patterns), jnp.asarray(plens),
    )
    counts = np.asarray(counts)
    first = np.asarray(first)

    # oracle: naive scan over all positions
    for i in range(B):
        p = patterns[i, : plens[i]]
        occ = [
            s for s in range(n - plens[i] + 1)
            if (text[s : s + plens[i]].astype(np.int32) == p).all()
            and (text[s : s + plens[i]] < 250).all()
        ]
        assert counts[i] == len(occ), (i, p)
        if occ:
            # first = min global rank among occurrences
            st = suf_pad[: n + 1]
            ranks = sorted(
                r for r in range(n + 1) if st[r] in occ
            )
            assert first[i] == ranks[0]
