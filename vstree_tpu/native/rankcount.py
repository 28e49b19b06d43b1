"""Pallas TPU kernel: exact complete-match interval lookup.

The hot primitive of exact complete-match search (reference
``findsufboundaries``/``computeofflineexactmatches``,
src/Vmengine/exactcompl.c:64-230).  The reference walks the ESA per
pattern with a per-char interval descent; a batched binary search is
the obvious port, but on TPU every probe is a random HBM gather
(~260 ns serialized) — measured 50x slower than this design, which
eliminates searching entirely:

- A packed bucket table at prefix depth ``d`` (one int32 per code:
  ``left | width << shift``) brackets every pattern to a
  <=few-hundred-wide rank window.  The bracket is fetched OUTSIDE the
  kernel with one XLA gather over the query batch (engine/complete.py
  ``_device_rank_lookup``) — keeping it out of the scalar loop more
  than quadruples kernel throughput (the per-query VMEM slice+extract
  chain was the bottleneck, not the window compare).
- Suffix comparison keys for the chars after ``d`` are packed into TWO
  base-(sigma+1) int32 words per rank, stored row-major ``(ROWS,128)``
  in VMEM (8(n+1) bytes; a few MB for megabase texts).
- Per query, ONE aligned dynamic slice of ``rowspan`` rows covers its
  whole bucket; the match interval [lo, hi) falls out of a vectorized
  compare-and-popcount against the query's low/high keys.  O(1) probes
  per query, no gathers anywhere.

The kernel loops over queries in SMEM, unrolled by ``UNROLL`` so
Mosaic overlaps the independent VMEM slice latencies; measured
~23 M queries/s on the build TPU (vs 1.4 M qps for the gather-based
batched binary search it replaces, and ~0.5 M qps single-core for the
reference binary).

Key encoding (must match ESA.rank_words): digit of a regular char c is
c; any special char / past-the-end saturates every following digit to
``sigma`` (specials order by position, which within equal words is the
rank order itself, remainsort.c:73-127 semantics); Horner base
(sigma+1), ``cpw`` chars per word.  Query low keys pad with digit 0
after the pattern end, high keys pad with digit ``sigma``; counting
keys in [qlow, qhigh] then yields exactly the whole-pattern interval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024     # queries per grid step
UNROLL = 64     # independent queries in flight inside the loop


def _kernel(rowspan: int):
    def kern(left_ref, width_ref, q1l_ref, q2l_ref, q1h_ref, q2h_ref,
             t1_ref, t2_ref, lo_out, hi_out):
        jbase = (
            lax.broadcasted_iota(jnp.int32, (rowspan, 128), 0) * 128
            + lax.broadcasted_iota(jnp.int32, (rowspan, 128), 1)
        )

        def one(i):
            left = left_ref[i]
            hiv = left + width_ref[i]
            row = lax.shift_right_logical(left, 7)
            q1l = q1l_ref[i]
            q2l = q2l_ref[i]
            q1h = q1h_ref[i]
            q2h = q2h_ref[i]
            w1 = t1_ref[pl.ds(row, rowspan)]
            w2 = t2_ref[pl.ds(row, rowspan)]
            j = jbase + row * 128
            inwin = (j >= left) & (j < hiv)
            wless = (w1 < q1l) | ((w1 == q1l) & (w2 < q2l))
            wleq = (w1 < q1h) | ((w1 == q1h) & (w2 <= q2h))
            both = (jnp.where(inwin & wless, 1, 0)
                    + jnp.where(inwin & wleq, 1 << 16, 0))
            s = jnp.sum(both)
            lo_out[i] = left + (s & 0xFFFF)
            hi_out[i] = left + lax.shift_right_logical(s, 16)

        def body(it, _):
            base = it * UNROLL
            for u in range(UNROLL):
                one(base + u)
            return 0

        lax.fori_loop(0, TILE // UNROLL, body, 0)

    return kern


@functools.partial(jax.jit, static_argnames=("rowspan", "interpret"))
def bucket_rank_lookup(
    left: jax.Array,   # int32[B] bucket left border (pre-gathered)
    width: jax.Array,  # int32[B] bucket width
    q1l: jax.Array,    # int32[B] query LOW key word 1 (pad digit 0)
    q2l: jax.Array,    # int32[B] query LOW key word 2
    q1h: jax.Array,    # int32[B] query HIGH key word 1 (pad digit sigma)
    q2h: jax.Array,    # int32[B] query HIGH key word 2
    t1: jax.Array,     # int32[ROWS,128] suffix key word-1 table
    t2: jax.Array,     # int32[ROWS,128] suffix key word-2 table
    rowspan: int,
    interpret: bool = False,
):
    """[lo, hi) rank interval of suffixes whose keys lie in
    [qlow, qhigh] within the pre-bracketed bucket — the whole-pattern
    exact match interval.  ``B`` must be a multiple of TILE; every
    bucket must span < rowspan*128 - 127 ranks and have width < 2^16
    hits per query window."""
    B = left.shape[0]
    assert B % TILE == 0, B
    grid = (B // TILE,)
    blk = lambda i: (i,)
    smem = pl.BlockSpec((TILE,), blk, memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _kernel(rowspan),
        out_shape=(jax.ShapeDtypeStruct((B,), jnp.int32),
                   jax.ShapeDtypeStruct((B,), jnp.int32)),
        grid=grid,
        in_specs=[smem] * 6 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((TILE,), blk, memory_space=pltpu.SMEM),
                   pl.BlockSpec((TILE,), blk, memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(left, width, q1l, q2l, q1h, q2h, t1, t2)


@functools.partial(jax.jit, static_argnames=("rowspan",))
def bucket_rank_lookup_xla(left, width, q1l, q2l, q1h, q2h, t1, t2,
                           rowspan: int):
    """Reference/fallback implementation of bucket_rank_lookup in plain
    XLA (windowed gathers) — used on CPU and in differential tests."""
    hiv = left + width
    rows = lax.shift_right_logical(left, 7)
    W = rowspan * 128
    t1f = t1.reshape(-1)
    t2f = t2.reshape(-1)
    j = rows[:, None] * 128 + jnp.arange(W, dtype=jnp.int32)[None, :]
    jc = jnp.minimum(j, t1f.size - 1)
    w1 = t1f[jc]
    w2 = t2f[jc]
    inwin = (j >= left[:, None]) & (j < hiv[:, None])
    wless = ((w1 < q1l[:, None])
             | ((w1 == q1l[:, None]) & (w2 < q2l[:, None])))
    wleq = ((w1 < q1h[:, None])
            | ((w1 == q1h[:, None]) & (w2 <= q2h[:, None])))
    lo = left + jnp.sum(jnp.where(inwin & wless, 1, 0), axis=1)
    hi = left + jnp.sum(jnp.where(inwin & wleq, 1, 0), axis=1)
    return lo, hi
