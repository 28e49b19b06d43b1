"""Pallas TPU kernel: Myers bit-vector edit-distance verification.

The verification workhorse of approximate complete matching (reference
``esaapm``'s Column{Pv,Mv} updates, src/Vmengine/esaapm.c:47-57, and
the re-derivation scan of approxcompl.c:14-66/longestmatch.c): for a
batch of candidate text windows, advance the Myers 32-bit bit-vector
DP one text column at a time, tracking

- the minimum score over all window lengths (the esaapm existence
  test),
- the longest length whose score is <= the stored best (the
  longestmatch.c:6-11 longest-match rule),
- the SEPARATOR cutoff (windows never count past one,
  esaapm.c:266-269).

The per-column data (pattern Eq masks and separator flags) is
pre-gathered OUTSIDE the kernel by one XLA gather — inside, the whole
scan is register-resident VPU bit math over TILE lanes with zero
memory traffic beyond the streamed columns, which is exactly what the
jnp fori_loop version could not promise (its per-step state round-trips
HBM).  32-bit patterns only (w == 1, the overwhelmingly common
``-complete -e`` case); wider patterns stay on the jnp multiword path.

All arithmetic is int32: the single-word Myers update needs no carry
chain, and two's-complement addition has the same bit pattern as the
unsigned addition the algorithm is defined over.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

TILE = 1024


def _kern(L: int):
    def kern(eq_ref, sep_ref, pl_ref, minsc_out, bestlen_out,
             bestsc_out):
        plv = pl_ref[...]
        top_shift = plv - 1

        def body(l, st):
            Pv, Mv, score, minsc, bestlen, bestsc, sepseen = st
            Eq = eq_ref[l]
            is_sep = sep_ref[l]
            t = Eq & Pv
            Xh = ((t + Pv) ^ Pv) | Eq
            Xv = Eq | Mv
            Ph = Mv | ~(Xh | Pv)
            Mh = Pv & Xh
            score = score + (lax.shift_right_logical(Ph, top_shift) & 1)
            score = score - (lax.shift_right_logical(Mh, top_shift) & 1)
            Ph_s = (Ph << 1) | 1
            Mh_s = Mh << 1
            nPv = Mh_s | ~(Xv | Ph_s)
            nMv = Ph_s & Xv
            sepseen = sepseen | is_sep
            notsep = sepseen == 0
            minsc = jnp.where(notsep, jnp.minimum(minsc, score), minsc)
            upd = notsep & (bestsc >= score)
            bestlen = jnp.where(upd, l + 1, bestlen)
            bestsc = jnp.where(upd, score, bestsc)
            return nPv, nMv, score, minsc, bestlen, bestsc, sepseen

        ones = jnp.full_like(plv, -1)
        st = (ones, jnp.zeros_like(plv), plv, plv,
              jnp.zeros_like(plv), plv, jnp.zeros_like(plv))
        st = lax.fori_loop(0, L, body, st)
        minsc_out[...] = st[3]
        bestlen_out[...] = st[4]
        bestsc_out[...] = st[5]

    return kern


@functools.partial(jax.jit, static_argnames=("L", "P", "interpret"))
def myers_verify32(eqT, sepT, plv, L: int, P: int,
                   interpret: bool = False):
    """(minsc, bestlen, bestsc) per lane.

    eqT:  int32[L, P] Eq mask per (column, candidate)
    sepT: int32[L, P] 1 where the column char is a SEPARATOR
    plv:  int32[P] pattern lengths (1..32)
    """
    assert P % TILE == 0, P
    grid = (P // TILE,)
    lane = pl.BlockSpec((TILE,), lambda i: (i,))
    col = pl.BlockSpec((L, TILE), lambda i: (0, i))
    out = jax.ShapeDtypeStruct((P,), jnp.int32)
    return pl.pallas_call(
        _kern(L),
        out_shape=(out, out, out),
        grid=grid,
        in_specs=[col, col, lane],
        out_specs=(lane, lane, lane),
        interpret=interpret,
    )(eqT, sepT, plv)


@functools.partial(
    jax.jit, static_argnames=("L", "n", "interpret"))
def verify_edit_pallas(text, cand, qidx, eqs0, plens, L: int, n: int,
                       interpret: bool = False):
    """Pre-gather the per-column Eq/separator data and run the kernel.

    eqs0: uint32[Q, 256] single-word pattern masks (eqs[:, 0, :]).
    Returns (minsc, bestlen, bestsc) for cand.shape[0] candidates
    (padded internally to a TILE multiple).
    """
    from ..core.chardef import SEPARATOR

    P0 = cand.shape[0]
    P = -(-P0 // TILE) * TILE
    pad = P - P0
    cand = jnp.concatenate([cand, jnp.zeros(pad, cand.dtype)])
    qidx = jnp.concatenate([qidx, jnp.zeros(pad, qidx.dtype)])
    idx = cand[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    inb = idx < n
    window = jnp.where(inb, text[jnp.minimum(idx, n - 1)],
                       jnp.uint8(SEPARATOR)).astype(jnp.int32)
    eq = lax.bitcast_convert_type(
        eqs0[qidx[:, None], window], jnp.int32)       # [P, L]
    sep = (window == SEPARATOR).astype(jnp.int32)
    plv = plens[qidx].astype(jnp.int32)
    minsc, bestlen, bestsc = myers_verify32(
        eq.T, sep.T, plv, L, P, interpret)
    return minsc[:P0], bestlen[:P0], bestsc[:P0]
