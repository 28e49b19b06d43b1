"""Device replay of the reference's maximal-prefix interval search.

``findmaxpref_device`` runs the binary search of reference
kurtz/maxpref.c (``findmaxprefixlen``/``maxprefixmatchbinstep``,
maxpref.c:78-252) for MANY (interval, query-suffix) probes at once as
ONE fused device program: every lane carries the search state
(lo/hi/floors/witness) plus an in-flight suffix comparison, and each
loop trip advances every live comparison by one packed word
(13 chars for DNA — index/sort.py lce_pack_params) and performs the
binary-search bookkeeping for lanes whose comparison just resolved.

The probe-for-probe equivalence with the host replay
(engine/query.py ``_findmaxpref_batch`` + ``_compare_batch``, itself
parity-tested against the reference binary) is asserted by
tests/test_device_engines.py; the host version remains the oracle.

Work per lane is Theta(maxprefixlen / D + log interval) word steps;
lanes drop out by compaction between bounded-trip rounds, so deep
stragglers only pay for their own tail (the same discipline as
index/sort.py device_lce_pairs).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..index.sort import _lce_tables, _nice_size, _smear, lce_pack_params

_DONE = np.int32(3)


def _db_tables(esa):
    """Cached device arrays for the db side: raw text, packed LCE
    word table, suftab."""
    cache = esa._device_cache
    if "qdev" not in cache:
        sigma = esa.alpha.num_regular
        bits, D = lce_pack_params(sigma)
        n = esa.totallength
        text_dev = esa.device("text")
        P = _lce_tables(text_dev, n, bits, D)
        cache["qdev"] = (text_dev, P, esa.device("suftab"), bits, D, n)
    return cache["qdev"]


def query_tables(esa, qtext: np.ndarray):
    """(qtext_dev, Pq, nq) for a query text (one device program)."""
    sigma = esa.alpha.num_regular
    bits, D = lce_pack_params(sigma)
    nq = int(qtext.size)
    qdev = jnp.asarray(qtext)
    Pq = _lce_tables(qdev, nq, bits, D)
    return qdev, Pq, nq


@functools.partial(
    jax.jit,
    static_argnames=("T", "M", "n", "nq", "bits", "D"))
def _fmp_round(text, P, suftab, qtext, Pq, state,
               T: int, M: int, n: int, nq: int, bits: int, D: int):
    """T fused trips of (one-word compare advance + binary-search
    bookkeeping) over M lanes."""
    kmask = jnp.int32((1 << (D * bits)) - 1)
    sh = D * bits

    def trip(_, st):
        (phase, lo, hi, lpref, rpref, cur, wit0, wit1, tgt, cstart,
         l, off0, qpos, qlen, idx) = st
        active = phase < _DONE
        # ---- one packed-word comparison step (maxpref.c COMPARE) ----
        ia = cstart + l
        ib = qpos + l
        pa = P[jnp.minimum(ia, n - 1)]
        pb = Pq[jnp.minimum(ib, nq - 1)]
        offa = jnp.where(ia < n, lax.shift_right_logical(pa, sh), 0)
        offb = jnp.where(ib < nq, lax.shift_right_logical(pb, sh), 0)
        x = (pa ^ pb) & kmask
        msb = lax.population_count(_smear(x)) - 1
        fd = jnp.where(x == 0, jnp.int32(D), D - 1 - msb // bits)
        rem = jnp.minimum(fd, jnp.minimum(offa, offb))
        # the query side never matches past qlen (caller guarantees a
        # special/end sits at qpos+qlen); cap defensively anyway
        rem = jnp.minimum(rem, jnp.maximum(qlen - l, 0))
        l = l + jnp.where(active, rem, 0)
        stopped = active & (rem < D)
        # classification of the stopped comparison (host _compare_batch
        # where-chain: q_over > s_over > neq > both-special)
        ib2 = qpos + l
        ia2 = cstart + l
        qc = qtext[jnp.minimum(ib2, nq - 1)].astype(jnp.int32)
        sc = text[jnp.minimum(ia2, n - 1)].astype(jnp.int32)
        q_over = l >= qlen
        s_over = ia2 >= n
        ret = jnp.where(
            q_over, 0,
            jnp.where(s_over, -1,
                      jnp.where(qc != sc, jnp.sign(qc - sc), -1)))

        # ---- binary-search bookkeeping for stopped lanes ----
        p0 = stopped & (phase == 0)      # compared vs suftab[left]
        p1 = stopped & (phase == 1)      # compared vs suftab[right]
        p2 = stopped & (phase == 2)      # compared vs suftab[mid]

        # phase 0: wit := (l, left); lpref := l; ret>0 -> compare right
        lpref = jnp.where(p0, l, lpref)
        wit0 = jnp.where(p0, l, wit0)
        wit1 = jnp.where(p0, lo, wit1)
        go1 = p0 & (ret > 0)

        # phase 1: maybe take right witness; rpref/cur; enter search
        upd1 = p1 & (lpref < l)
        wit0 = jnp.where(upd1, l, wit0)
        wit1 = jnp.where(upd1, tgt, wit1)
        rpref = jnp.where(p1, l, rpref)
        cur = jnp.where(p1, jnp.minimum(lpref, l), cur)
        go2 = p1 & (ret < 0) & (wit0 < qlen) & (hi > lo + 1)

        # phase 2: witness/floor updates, halve the interval
        upd2 = p2 & (wit0 < l)
        wit0 = jnp.where(upd2, l, wit0)
        wit1 = jnp.where(upd2, tgt, wit1)
        neg = p2 & (ret < 0)
        pos = p2 & (ret > 0)
        rpref = jnp.where(neg, l, rpref)
        hi = jnp.where(neg, tgt, hi)
        lpref = jnp.where(pos, l, lpref)
        lo = jnp.where(pos, tgt, lo)
        cur = jnp.where(neg, jnp.minimum(lpref, l),
                        jnp.where(pos, jnp.minimum(rpref, l), cur))
        cont2 = p2 & (ret != 0) & (hi > lo + 1)

        # ---- phase transitions + next comparison setup ----
        mid = (lo + hi) // 2
        new_tgt = jnp.where(go1, hi, jnp.where(go2 | cont2, mid, tgt))
        start_cmp = go1 | go2 | cont2
        cstart = jnp.where(
            start_cmp, suftab[jnp.clip(new_tgt, 0, n)], cstart)
        l = jnp.where(go1, off0,
                      jnp.where(go2 | cont2, cur, l))
        tgt = new_tgt
        phase = jnp.where(
            go1, 1,
            jnp.where(go2 | cont2, 2,
                      jnp.where(stopped, _DONE, phase)))
        return (phase, lo, hi, lpref, rpref, cur, wit0, wit1, tgt,
                cstart, l, off0, qpos, qlen, idx)

    state = lax.fori_loop(0, T, trip, state)
    n_active = jnp.sum((state[0] < _DONE).astype(jnp.int32))
    return state, n_active


@functools.partial(jax.jit, static_argnames=("M", "M2"),
                   donate_argnums=(1, 2))
def _fmp_compact(state, res0, res1, M: int, M2: int):
    """Harvest finished lanes into (res0, res1) by original index and
    compact the live lanes to the front, padded to M2."""
    phase = state[0]
    idx = state[14]
    done = (phase >= _DONE) & (idx >= 0)
    cap = res0.shape[0]
    res0 = res0.at[jnp.where(done, idx, cap)].set(state[6], mode="drop")
    res1 = res1.at[jnp.where(done, idx, cap)].set(state[7], mode="drop")
    live = phase < _DONE
    dst = jnp.cumsum(live.astype(jnp.int32)) - 1
    dst = jnp.where(live, dst, M2)
    out = []
    for j, arr in enumerate(state):
        fill = _DONE if j == 0 else (-1 if j == 14 else 0)
        out.append(jnp.full(M2, fill, arr.dtype).at[dst].set(
            arr, mode="drop"))
    return tuple(out), res0, res1


@functools.partial(jax.jit, static_argnames=("L", "levels", "n1"))
def _mem_bounds(table, w, L: int, levels: int, n1: int):
    """Run bounds [A, B] of the lcp>=L run containing each witness
    (scanleft/scanright descents over the cached sparse-min table) +
    exclusive record offsets."""
    t = w
    for e in range(levels - 1, -1, -1):
        lo = t - (1 << e) + 1
        mn = table[e, jnp.clip(lo, 0, n1 - 1)]
        t = jnp.where((lo >= 0) & (mn >= L), t - (1 << e), t)
    A = t
    t = w
    nmax = n1 - 1
    for e in range(levels - 1, -1, -1):
        mn = table[e, jnp.clip(t + 1, 0, n1 - 1)]
        t = jnp.where((t + (1 << e) <= nmax) & (mn >= L), t + (1 << e),
                      t)
    B = t
    cnt = B - A + 1
    offs = jnp.cumsum(cnt) - cnt
    return A, B, offs, offs[-1] + cnt[-1]


@functools.partial(
    jax.jit, static_argnames=("E", "K", "n", "nq", "n1", "levels"))
def _mem_expand(text, suftab, qtext, table, log2tab, A, B, offs, w,
                maxlcp, qp, qo, E: int, K: int, n: int, nq: int,
                n1: int, levels: int):
    """Expand K witness runs into <=E (rank, dbpos, length) records in
    the reference emission rotation (witness..A desc, then
    witness+1..B), RMQ-derived lengths, left-maximality filtered and
    compacted (PROCESSSUFFIX fquery.c:53-81)."""
    # group id per record slot via boundary scatter + running max
    gseed = jnp.zeros(E, jnp.int32).at[
        jnp.minimum(offs, E)].max(jnp.arange(K, dtype=jnp.int32),
                                  mode="drop")
    g = lax.associative_scan(jnp.maximum, gseed)
    slot = jnp.arange(E, dtype=jnp.int32)
    step = slot - offs[g]
    wk = w[g]
    Ak = A[g]
    nleft = wk - Ak + 1
    is_left = step < nleft
    ranks = jnp.where(is_left, wk - step, Ak + step)
    live = slot < (offs[K - 1] + (B[K - 1] - A[K - 1] + 1))
    ranks = jnp.clip(ranks, 0, n1 - 1)
    # match length = min(maxlcp, min lcp over (min(r,w), max(r,w)])
    lo_r = jnp.minimum(ranks, wk)
    hi_r = jnp.maximum(ranks, wk)
    same = lo_r == hi_r
    q_lo = jnp.minimum(lo_r + 1, n1 - 1)
    q_hi = jnp.maximum(hi_r, q_lo)
    width = q_hi - q_lo + 1
    k = log2tab[jnp.clip(width, 1, n1)]
    mn = jnp.minimum(
        table[k, jnp.clip(q_lo, 0, n1 - 1)],
        table[k, jnp.clip(q_hi - (1 << k) + 1, 0, n1 - 1)])
    mlen = jnp.where(same, maxlcp[g], jnp.minimum(maxlcp[g], mn))
    # left-maximality
    sufstart = suftab[ranks]
    qpg = qp[g]
    leftq = jnp.where(qo[g] > 0,
                      qtext[jnp.clip(qpg - 1, 0, nq - 1)].astype(
                          jnp.int32),
                      jnp.int32(255))
    from ..core.chardef import WILDCARD as _W

    prevc = text[jnp.clip(sufstart - 1, 0, n - 1)].astype(jnp.int32)
    emit = live & ((sufstart == 0) | (leftq >= _W) | (prevc != leftq))
    dst = jnp.cumsum(emit.astype(jnp.int32)) - 1
    dst = jnp.where(emit, dst, E)
    out_pos = jnp.full(E, -1, jnp.int32).at[dst].set(
        sufstart, mode="drop")
    out_len = jnp.zeros(E, jnp.int32).at[dst].set(mlen, mode="drop")
    out_g = jnp.zeros(E, jnp.int32).at[dst].set(g, mode="drop")
    kept = jnp.sum(emit.astype(jnp.int32))
    return out_pos, out_len, out_g, kept


def mem_expand_device(esa, qtext, witness, maxlcp, qpos, qoff,
                      L: int):
    """Reference-order MEM record expansion on device; returns host
    (dbpos, length, lane_index) arrays, left-maximality filtered."""
    from .query import _dev_lcp_rmq

    K = int(witness.size)
    if K == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    table, levels, n1 = _dev_lcp_rmq(esa)
    _, _, suftab, _, _, n = _db_tables(esa)
    text = esa.device("text")
    qdev = jnp.asarray(qtext)
    nq = int(qtext.size)
    cache = esa._device_cache
    if "log2tab" not in cache:
        cache["log2tab"] = jnp.asarray(
            np.floor(np.log2(np.maximum(np.arange(n1 + 2), 1))
                     ).astype(np.int32))
    log2tab = cache["log2tab"]
    w = jnp.asarray(witness.astype(np.int32))
    A, B, offs, total = _mem_bounds(table, w, L, levels, n1)
    E = _nice_size(int(total))
    out_pos, out_len, out_g, kept = _mem_expand(
        text, suftab, qdev, table, log2tab, A, B, offs, w,
        jnp.asarray(maxlcp.astype(np.int32)),
        jnp.asarray(qpos.astype(np.int32)),
        jnp.asarray(qoff.astype(np.int32)),
        E, K, n, nq, n1, levels)
    kept = int(kept)
    return (np.asarray(out_pos[:kept]).astype(np.int64),
            np.asarray(out_len[:kept]).astype(np.int64),
            np.asarray(out_g[:kept]).astype(np.int64))


def findmaxpref_device(esa, qtext, rl, rr, off0, qpos, qlen,
                       qtabs=None):
    """(maxprefixlen, witness_rank) per lane — device fused replay.

    rl/rr: inclusive rank interval per lane; off0: certified common
    prefix depth of the whole interval with the query suffix; qpos:
    query-text position; qlen: remaining sequence length from qpos.
    ``qtabs`` may pass a precomputed :func:`query_tables` result.
    """
    m = int(rl.size)
    if m == 0:
        z = np.zeros(0, np.int64)
        return z, z
    text, P, suftab, bits, D, n = _db_tables(esa)
    if qtabs is None:
        qtabs = query_tables(esa, qtext)
    qdev, Pq, nq = qtabs

    M = _nice_size(m)

    def padded(a, fill):
        out = np.full(M, fill, np.int32)
        out[:m] = a
        return jnp.asarray(out)

    lo = padded(rl, 0)
    hi = padded(rr, 0)
    offd = padded(off0, 0)
    qp = padded(qpos, 0)
    ql = padded(qlen, 0)
    idx = padded(np.arange(m, dtype=np.int32), -1)
    phase = jnp.where(idx >= 0, jnp.int32(0), _DONE)
    zeros = jnp.zeros(M, jnp.int32)
    cstart = suftab[jnp.clip(lo, 0, n)]
    state = (phase, lo, hi, zeros, zeros, offd, zeros, lo + 0, lo + 0,
             cstart, offd + 0, offd, qp, ql, idx)
    res0 = jnp.zeros(m, jnp.int32)
    res1 = jnp.zeros(m, jnp.int32)
    T = 16
    while True:
        state, n_active = _fmp_round(
            text, P, suftab, qdev, Pq, state, T, M, n, nq, bits, D)
        cnt = int(n_active)
        if cnt == 0:
            state, res0, res1 = _fmp_compact(state, res0, res1, M, 1)
            break
        M2 = _nice_size(cnt)
        if M2 <= M - M // 4:
            state, res0, res1 = _fmp_compact(state, res0, res1, M, M2)
            M = M2
        if T < 256:
            T *= 2
    return (np.asarray(res0).astype(np.int64),
            np.asarray(res1).astype(np.int64))
