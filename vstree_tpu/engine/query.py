"""Query substring matching: MEMs and MUM candidates vs an indexed DB
(vmatch -q, reference src/Vmengine/fquery.c + src/kurtz/matchsub.c).

Reference algorithm: for every query suffix, a per-suffix descent into
the ESA finds the maximal matching prefix (findmaxprefixlen,
kurtz/findmaxpref.gen), then scans neighbor ranks while lcp >=
searchlength carrying a running minimum (leftrightsubmatch,
fquery.c:139-269), emitting left-maximal (dbpos, len) pairs.

TPU-native reformulation — all query suffixes processed as one batch:

1. bucket brackets for every query position from a depth-d bucket
   table (d = min(searchlength, affordable depth); suffixes containing
   a special within depth d can never reach searchlength — same
   exclusion as the reference's [left, mid) bucket rule),
2. one batched binary search locates each query suffix's insertion
   rank; its lexicographic neighbors witness the maximal match
   (the max-lce suffix is always adjacent to the insertion point),
3. exact match lengths by two batched LCE sweeps (ops/lce.py),
4. the reference's left/right neighbor scans become pure array ops:
   the scan range is the lcp>=searchlength run containing the witness
   (precomputed run boundaries), per-rank lengths are
   min(maxlcp, RMQ(lcp)) via the sparse-table RMQ, left-maximality is
   an elementwise bwt/left-char comparison.

Emission order reproduces the reference loop nest: query sequences in
input order, offsets ascending; per offset witness->left then
witness+1->right (leftrightsubmatch loop order).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..core.chardef import WILDCARD
from ..core.multiseq import Multiseq
from ..index.build import bucket_codes
from ..index.esa import ESA
from ..ops.lce import lce_two_texts
from .match import FLAGQUERY, MatchTable
from .repeats import LcpRmq, _l_runs

_SPECIAL = 1 << 20


@functools.partial(
    jax.jit,
    static_argnames=("W", "depth", "n", "nq", "nsteps", "maxchunks"),
)
def _qsuffix_lower_bound(
    text, suftab, qtext, qpos, rem, lo0, hi0,
    W: int, depth: int, n: int, nq: int, nsteps: int, maxchunks: int,
):
    """First rank in [lo0, hi0) whose suffix orders >= the query suffix
    (query window of length rem at qpos).  Chunked lexicographic
    compare: the first ``depth`` chars are bucket-equal and skipped."""

    offs = jnp.arange(W, dtype=jnp.int32)

    def rel_fn(spos):
        """sign(suffix - query) per probe, chunked compare."""
        B = spos.shape[0]

        def cond(state):
            c, rel, done = state
            return (c < maxchunks) & ~jnp.all(done)

        def body(state):
            c, rel, done = state
            off = depth + c * W + offs            # [W]
            qi = qpos[:, None] + off[None, :]
            si = spos[:, None] + off[None, :]
            s_in = si < n
            q_in = off[None, :] < rem[:, None]
            sch = text[jnp.minimum(si, n - 1)].astype(jnp.int32)
            qch = qtext[jnp.minimum(qi, nq - 1)].astype(jnp.int32)
            skey = jnp.where(s_in & (sch < WILDCARD), sch,
                             _SPECIAL + si)
            diff = jnp.where(q_in, skey - qch, 0)
            nz = diff != 0
            first = jnp.argmax(nz, axis=1)
            anynz = jnp.any(nz, axis=1)
            d = jnp.take_along_axis(diff, first[:, None], axis=1)[:, 0]
            newrel = jnp.where(anynz, jnp.sign(d), 0)
            exhausted = depth + (c + 1) * W >= rem  # query window done
            rel = jnp.where(done, rel, newrel)
            done = done | anynz | exhausted
            return c + 1, rel, done

        B0 = jnp.zeros(spos.shape[0], jnp.int32)
        _, rel, _ = lax.while_loop(
            cond, body, (jnp.int32(0), B0, jnp.zeros_like(B0, bool))
        )
        return rel

    zero = jnp.zeros_like(lo0)

    def step(_, st):
        lo, hi = st
        open_ = lo < hi
        mid = (lo + hi) // 2
        rel = rel_fn(suftab[mid].astype(jnp.int32))
        lo = jnp.where(open_ & (rel < 0), mid + 1, lo)
        hi = jnp.where(open_ & (rel >= 0), mid, hi)
        return lo, hi

    lo, _ = lax.fori_loop(0, nsteps, step, (lo0 + zero, hi0 + zero))
    return lo






def _lce_host(text, a, qtext, b, cap: int = 16):
    """Host-side batched longest-common-extension between text
    positions ``a`` and query positions ``b`` (chardef match rule:
    specials never match).  Windowed numpy compares with geometric
    window growth (most extensions are short; survivors shrink fast),
    RAM gathers being orders of magnitude cheaper than device random
    gathers."""
    m = int(a.size)
    n = int(text.size)
    nq = int(qtext.size)
    lce = np.zeros(m, np.int64)
    act = np.arange(m)
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    off = 0
    while act.size:
        offs = np.arange(cap)
        ia = a[act][:, None] + off + offs[None, :]
        ib = b[act][:, None] + off + offs[None, :]
        va = ia < n
        vb = ib < nq
        ca = text[np.minimum(ia, n - 1)]
        cb = qtext[np.minimum(ib, nq - 1)]
        match = va & vb & (ca == cb) & (ca < WILDCARD)
        run = np.cumprod(match, axis=1).sum(axis=1)
        lce[act] += run
        act = act[run == cap]
        off += cap
        if cap < 1024:
            cap *= 2
    return lce


def _lower_bounds(esa, qtext, qpos_k, rem_k, lo0_k, hi0_k,
                  W, d, n, nq, nsteps, maxchunks):
    """Insertion rank of every query suffix in its bucket [lo0, hi0).

    Host fast path: a batched binary search over the packed
    base-(sigma+1) rank-word tables (index/esa.py rank_words — two
    int32 words per rank covering 2*cpw chars past the bucket depth,
    saturating-monotone over specials).  The whole probe is numpy
    vector ops: ~log2(maxwidth) iterations of two gathers + compares.
    A query that ties through the full word coverage with a block
    wider than 1 falls back to an exact byte-compare search within
    the tied block (skipping the covered prefix)."""
    B = qpos_k.size
    if B == 0:
        return np.zeros(0, np.int64)
    sigma = esa.alpha.num_regular
    base = sigma + 1
    cpw = esa.chars_per_word()
    w1, w2 = esa.rank_words_host(d)
    # query digit packing, saturation from first special/past-window
    Wc = 2 * cpw
    idx = qpos_k[:, None] + d + np.arange(Wc)[None, :]
    inb = (idx < nq) & ((idx - qpos_k[:, None]) < rem_k[:, None])
    ch = qtext[np.minimum(idx, nq - 1)].astype(np.int64)
    specialc = (~inb) | (ch >= sigma)
    sat = np.maximum.accumulate(specialc, axis=1)
    dig = np.where(sat, sigma, ch)
    q1 = np.zeros(B, np.int64)
    q2 = np.zeros(B, np.int64)
    for j in range(cpw):
        q1 = q1 * base + dig[:, j]
        q2 = q2 * base + dig[:, cpw + j]
    q1 = q1.astype(np.int32)
    q2 = q2.astype(np.int32)

    lo = lo0_k.astype(np.int64).copy()
    hi = hi0_k.astype(np.int64).copy()
    while True:
        open_ = lo < hi
        if not open_.any():
            break
        ia = np.flatnonzero(open_)
        mid = (lo[ia] + hi[ia]) // 2
        m1 = w1[mid]
        m2 = w2[mid]
        lt = (m1 < q1[ia]) | ((m1 == q1[ia]) & (m2 < q2[ia]))
        lo[ia[lt]] = mid[lt] + 1
        hi[ia[~lt]] = mid[~lt]
    lb = lo

    # exact refinement inside word-tie blocks: only queries whose
    # window is regular through the coverage AND continues past it
    # can tie with a block wider than 1
    C = d + Wc
    unsat = ~sat[:, -1]
    deep = unsat & (rem_k > C)
    di = np.flatnonzero(deep)
    if di.size:
        at = np.minimum(lb[di], w1.size - 1)
        tied = (w1[at] == q1[di]) & (w2[at] == q2[di])
        di = di[tied]
    if di.size:
        # tie block [lb, tie_hi): extent of equal words
        thi = lb[di].copy()
        bh = hi0_k[di].astype(np.int64)
        # gallop: find first rank with a different word pair
        lo2 = lb[di].copy()
        hi2 = bh.copy()
        while True:
            open_ = lo2 < hi2
            if not open_.any():
                break
            ia = np.flatnonzero(open_)
            mid = (lo2[ia] + hi2[ia]) // 2
            eq = (w1[mid] == q1[di][ia]) & (w2[mid] == q2[di][ia])
            lo2[ia[eq]] = mid[eq] + 1
            hi2[ia[~eq]] = mid[~eq]
        thi = lo2
        # byte-exact lower bound within [lb, thi), compare from C
        suftab = esa.suftab.astype(np.int64)
        text = esa.text
        lo3 = lb[di].copy()
        hi3 = thi
        start = np.full(di.size, C, np.int64)
        while True:
            open_ = lo3 < hi3
            if not open_.any():
                break
            ia = np.flatnonzero(open_)
            mid = (lo3[ia] + hi3[ia]) // 2
            rel, _ = _compare_batch(
                text, n, suftab[mid], qtext, qpos_k[di][ia],
                rem_k[di][ia], start[ia])
            # suffix < query  <=>  rel > 0
            gt = rel > 0
            lo3[ia[gt]] = mid[gt] + 1
            hi3[ia[~gt]] = mid[~gt]
        lb[di] = lo3
    return lb


def _native_query_matches(esa: ESA, query: Multiseq,
                          searchlength: int, flags_extra: int,
                          qspeedup: int) -> MatchTable:
    """MatchTable assembly over the native per-sequence scans."""
    from ..native import querysub as _qs

    pl = esa.prefixlength
    if searchlength < pl:
        raise ValueError(
            f"searchlength={searchlength} must be >= prefixlength="
            f"{pl}")
    bck = esa.bcktab if esa.bcktab is not None else esa.aux_bck(pl)
    s1 = getattr(esa, "_sti1_cache", None)
    if s1 is None:
        from ..index.io import sti1_table

        s1 = sti1_table(esa.suftab, esa.lcptab, pl)
        esa._sti1_cache = s1
    rows_l = []
    seq_l = []
    start_l = []
    for s in range(query.numofsequences):
        a, b = query.seq_bounds(s)
        if b - a < searchlength:
            continue
        rows = _qs.scan_sequence(
            esa.text, esa.suftab, esa.lcptab, s1, bck,
            esa.alpha.num_regular, pl, query.sequence[a:b],
            searchlength, qspeedup)
        if rows.size:
            rows_l.append(rows)
            seq_l.append(np.full(rows.shape[0], s, np.int64))
            start_l.append(np.full(rows.shape[0], a, np.int64))
    if not rows_l:
        return MatchTable()
    rows = np.concatenate(rows_l)
    qs = np.concatenate(seq_l)
    qstart = np.concatenate(start_l)
    mlens = rows[:, 0]
    sufstart = rows[:, 1]
    qo = rows[:, 2]
    ms = esa.multiseq
    seq1, rel1 = ms.pos_to_pair(sufstart)
    tot = mlens.size
    return MatchTable(
        length1=mlens,
        position1=sufstart,
        length2=mlens.copy(),
        position2=qstart + qo,
        distance=np.zeros(tot, np.int64),
        flag=np.full(tot, FLAGQUERY | flags_extra, np.int64),
        seqnum1=seq1,
        relpos1=rel1,
        seqnum2=qs,
        relpos2=qo,
        evalue=np.zeros(tot, np.float64),
        idnumber=np.zeros(tot, np.int64),
        transnum=np.full(tot, -1, np.int64),
    )


def _query_positions(query: Multiseq, searchlength: int):
    """Flattened (qpos, qseq, qoff, rem) for every query offset with
    remaining length >= searchlength (matchsub.c loop bounds)."""
    pos_l, seq_l, off_l, rem_l = [], [], [], []
    for s in range(query.numofsequences):
        a, b = query.seq_bounds(s)
        ln = b - a
        if ln < searchlength:
            continue
        m = ln - searchlength + 1
        pos_l.append(np.arange(a, a + m, dtype=np.int64))
        seq_l.append(np.full(m, s, np.int64))
        off_l.append(np.arange(m, dtype=np.int64))
        rem_l.append(ln - np.arange(m, dtype=np.int64))
    if not pos_l:
        z = np.zeros(0, np.int64)
        return z, z, z, z
    return (np.concatenate(pos_l), np.concatenate(seq_l),
            np.concatenate(off_l), np.concatenate(rem_l))


def _compare_batch(text, n, sstart, qtext, qpos, querylen, lcplen0):
    """COMPARE (maxpref.c:30-66) vectorized over probes: compare
    query suffixes (qpos, length querylen) against db suffixes
    (sstart) starting at common-prefix length lcplen0; returns
    (sign, final lcplen).  Equal specials and running past the
    sentinel compare as -1; exhausting the query as 0."""
    m = sstart.size
    ret = np.zeros(m, np.int64)
    lcp = lcplen0.astype(np.int64).copy()
    done = np.zeros(m, bool)
    qn = qtext.size
    w = 32
    while not done.all():
        act = np.flatnonzero(~done)
        offs = np.arange(w)
        qi = qpos[act, None] + lcp[act, None] + offs[None, :]
        si = sstart[act, None] + lcp[act, None] + offs[None, :]
        q_over = (qi - qpos[act, None]) >= querylen[act, None]
        s_over = si >= n
        qc = qtext[np.minimum(qi, qn - 1)].astype(np.int64)
        sc = text[np.minimum(si, n - 1)].astype(np.int64)
        both_sp = (qc >= WILDCARD) & (sc >= WILDCARD)
        neq = qc != sc
        stop = q_over | s_over | neq | both_sp
        val = np.where(
            q_over, 0,
            np.where(s_over, -1,
                     np.where(neq, np.sign(qc - sc), -1)))
        first = np.argmax(stop, axis=1)
        any_stop = stop.any(axis=1)
        adv = np.where(any_stop, first, w)
        lcp[act] += adv
        hitv = np.take_along_axis(val, first[:, None], 1)[:, 0]
        fin = act[any_stop]
        ret[fin] = hitv[any_stop]
        done[fin] = True
        if w < 1024:
            w *= 2
    return ret, lcp


def _findmaxpref_batch(text, n, suftab, left, right, offset,
                       qtext, qpos, querylen):
    """findmaxpref.gen replayed probe-for-probe, vectorized over many
    (interval, query-suffix) probes; returns (maxprefix, witness)."""
    m = left.size
    wit0 = np.zeros(m, np.int64)
    wit1 = left.astype(np.int64).copy()
    sufl = suftab[left].astype(np.int64)
    ret1, l1 = _compare_batch(text, n, sufl, qtext, qpos, querylen,
                              offset)
    wit0[:] = l1
    active = ret1 > 0
    lpref = l1.copy()
    rpref = np.zeros(m, np.int64)
    ret2 = np.zeros(m, np.int64)
    cur = l1.copy()
    ia = np.flatnonzero(active)
    if ia.size:
        r2, l2 = _compare_batch(
            text, n, suftab[right[ia]].astype(np.int64), qtext,
            qpos[ia], querylen[ia], offset[ia])
        ret2[ia] = r2
        rpref[ia] = l2
        upd = lpref[ia] < l2
        wit0[ia] = np.where(upd, l2, lpref[ia])
        wit1[ia] = np.where(upd, right[ia], left[ia])
        cur[ia] = np.where(upd, lpref[ia], l2)
    lo = left.astype(np.int64).copy()
    hi = right.astype(np.int64).copy()
    act = active & (ret2 < 0) & (wit0 < querylen) & (hi > lo + 1)
    while act.any():
        ia = np.flatnonzero(act)
        mid = (lo[ia] + hi[ia]) // 2
        r3, l3 = _compare_batch(
            text, n, suftab[mid].astype(np.int64), qtext, qpos[ia],
            querylen[ia], cur[ia])
        upd = wit0[ia] < l3
        wit0[ia] = np.where(upd, l3, wit0[ia])
        wit1[ia] = np.where(upd, mid, wit1[ia])
        neg = r3 < 0
        pos = r3 > 0
        lp = lpref[ia]
        rp = rpref[ia]
        rp2 = np.where(neg, l3, rp)
        lp2 = np.where(pos, l3, lp)
        cur[ia] = np.where(
            neg, np.where(lp2 < rp2, lp2, l3),
            np.where(pos, np.where(rp2 < lp2, rp2, l3), cur[ia]))
        lpref[ia] = lp2
        rpref[ia] = rp2
        hi[ia] = np.where(neg, mid, hi[ia])
        lo[ia] = np.where(pos, mid, lo[ia])
        act[ia] = ~(r3 == 0) & (hi[ia] > lo[ia] + 1)
    return wit0, wit1


def _scan_left_batch(rmq, lcp, idx, depth):
    """scanleft (matchsub.c:59-72) batched: max s in (0, idx] with
    lcp[s] < depth, else 0 — the interval's left boundary."""
    lo = np.zeros(idx.size, np.int64)
    hi = idx.astype(np.int64).copy()
    while True:
        open_ = lo < hi
        if not open_.any():
            break
        ia = np.flatnonzero(open_)
        mid = (lo[ia] + hi[ia] + 1) // 2
        found = rmq.query(mid, idx[ia].astype(np.int64)) < depth[ia]
        lo[ia] = np.where(found, mid, lo[ia])
        hi[ia] = np.where(found, hi[ia], mid - 1)
    return lo


def _scan_right_batch(rmq, lcp, idx, depth):
    """scanright (matchsub.c:89-102) batched: (min s > idx with
    lcp[s] < depth) - 1 — the interval's right boundary."""
    nmax = lcp.size - 1
    lo = idx.astype(np.int64) + 1
    hi = np.full(idx.size, nmax, np.int64)
    while True:
        open_ = lo < hi
        if not open_.any():
            break
        ia = np.flatnonzero(open_)
        mid = (lo[ia] + hi[ia]) // 2
        found = rmq.query(lo[ia], mid) < depth[ia]
        hi[ia] = np.where(found, mid, hi[ia])
        lo[ia] = np.where(found, lo[ia], mid + 1)
    return lo - 1


def _ref_witness_state(esa: ESA, query: Multiseq, searchlength: int,
                       qpos, qseq, qoff, rem, qspeedup: int):
    """The reference's per-query-position state machine
    (matchquerysubstring2, matchsub.c:353-539 / speedup 0
    matchsub.c:165-236): for every scan position compute the maximal
    match length, the canonical lcp-interval and the exact witness
    rank the reference's emission rotates around.

    All interval/length values are canonical (checkvnode,
    matchsub.c:132-160 asserts this in the reference's DEBUG build),
    so they vectorize position-independently; only the witness is
    history-dependent.  Its isomorphic-shortcut chains have the
    closed form w_{a+k} = inv[suftab[w_a] + k] (the rank-successor
    map psi applied k times), breaking only at the sti1 byte
    saturation, which is handled by a sequential fixup."""
    text = esa.text
    n = esa.totallength
    suftab = esa.suftab.astype(np.int64)
    lcp = esa.lcptab
    pl = esa.prefixlength
    numofchars = esa.alpha.num_regular
    qtext = query.sequence
    m = qpos.size

    qcodes, qvalid = bucket_codes(qtext, numofchars, pl)
    valid = qvalid[qpos] == pl
    codes = np.where(valid, qcodes[qpos], 0)
    bck = esa.bcktab if esa.bcktab is not None else esa.aux_bck(pl)
    bl = bck[2 * codes].astype(np.int64)
    br = bck[2 * codes + 1].astype(np.int64)
    nonempty = valid & (br > bl)

    # insertion point + neighbor LCEs -> canonical maxlen and a member
    k_idx = np.flatnonzero(nonempty)
    maxlen = np.zeros(m, np.int64)
    member = np.zeros(m, np.int64)
    if k_idx.size:
        maxw = int(np.max(br[k_idx] - bl[k_idx]))
        nsteps = max(1, int(np.ceil(np.log2(max(maxw, 2)))) + 1)
        maxrem = int(rem[k_idx].max())
        W = 64
        maxchunks = max(1, int(np.ceil((maxrem - pl) / W)) + 1)
        lb = _lower_bounds(esa, qtext, qpos[k_idx], rem[k_idx],
                           bl[k_idx].astype(np.int32),
                           br[k_idx].astype(np.int32),
                           W, pl, n, int(qtext.size), nsteps,
                           maxchunks)
        cand0 = np.clip(lb - 1, bl[k_idx], br[k_idx] - 1)
        cand1 = np.clip(lb, bl[k_idx], br[k_idx] - 1)
        lce0 = _lce_host(text, suftab[cand0], qtext, qpos[k_idx])
        lce1 = _lce_host(text, suftab[cand1], qtext, qpos[k_idx])
        lce0 = np.minimum(lce0, rem[k_idx])
        lce1 = np.minimum(lce1, rem[k_idx])
        use0 = lce0 >= lce1
        member[k_idx] = np.where(use0, cand0, cand1)
        maxlen[k_idx] = np.where(use0, lce0, lce1)
    offset = np.where(nonempty, maxlen, 0)

    rmq = LcpRmq(lcp)
    ileft = np.zeros(m, np.int64)
    iright = np.zeros(m, np.int64)
    if k_idx.size:
        dep = np.maximum(maxlen[k_idx], 1)
        ileft[k_idx] = _scan_left_batch(rmq, lcp, member[k_idx], dep)
        iright[k_idx] = _scan_right_batch(rmq, lcp, member[k_idx],
                                          dep)

    proceed = nonempty & (maxlen >= searchlength)
    witness = member.copy()
    if qspeedup == 0:
        # speedup 0 (matchsub.c:165-236): a fresh findmaxprefixlen
        # replay from the bucket at every position
        fi = np.flatnonzero(proceed)
        if fi.size:
            w0, w1 = _findmaxpref_batch(
                text, n, suftab, bl[fi], br[fi] - 1,
                np.full(fi.size, pl, np.int64), qtext, qpos[fi],
                rem[fi])
            witness[fi] = w1
    else:
        # sti1 byte table (saturating rank-within-bucket) + inverse
        s1 = getattr(esa, "_sti1_cache", None)
        if s1 is None:
            from ..index.io import sti1_table

            s1 = sti1_table(esa.suftab, lcp, pl)
            esa._sti1_cache = s1
        inv = esa.stitab
        if inv is None:
            inv = np.empty(suftab.size, np.int64)
            inv[suftab] = np.arange(suftab.size, dtype=np.int64)
            esa.stitab = inv
        inv = inv.astype(np.int64)

        seq_start = np.empty(m, bool)
        seq_start[0] = True
        if m > 1:
            seq_start[1:] = qseq[1:] != qseq[:-1]
        prev_off = np.roll(offset, 1)
        prev_off[seq_start] = 0
        prev_right = np.roll(iright, 1)
        prev_left = np.roll(ileft, 1)
        prev_ne = np.roll(nonempty, 1)
        prev_ne[seq_start] = False
        nxt = np.minimum(suftab[np.where(prev_ne, prev_right, 0)] + 1,
                         suftab.size - 1)
        capped = s1[nxt] == 255
        fresh = nonempty & ((prev_off <= pl) | capped | seq_start)
        shortcut = nonempty & ~fresh
        iso = np.zeros(m, bool)
        rankl = np.zeros(m, np.int64)
        rankr = np.zeros(m, np.int64)
        si = np.flatnonzero(shortcut)
        if si.size:
            d1 = prev_off[si] - 1
            startl = np.minimum(
                bl[si] + s1[np.minimum(suftab[prev_left[si]] + 1,
                                       suftab.size - 1)],
                lcp.size - 1)
            startr = np.minimum(
                bl[si] + s1[np.minimum(suftab[prev_right[si]] + 1,
                                       suftab.size - 1)],
                lcp.size - 1)
            rankl[si] = _scan_left_batch(rmq, lcp, startl, d1)
            rankr[si] = _scan_right_batch(rmq, lcp, startr, d1)
            iso[si] = (rankr[si] - rankl[si]
                       == prev_right[si] - prev_left[si])

        noniso = shortcut & ~iso
        # witnesses: replay for fresh and non-isomorphic shortcuts —
        # ALL of them, not just emitting ones: any non-isomorphic
        # position with a bucket can anchor a later isomorphic chain
        fi = np.flatnonzero(fresh)
        rep_idx = [fi]
        rep_l = [bl[fi]]
        rep_r = [br[fi] - 1]
        rep_o = [np.full(fi.size, pl, np.int64)]
        ni = np.flatnonzero(noniso)
        rep_idx.append(ni)
        rep_l.append(rankl[ni])
        rep_r.append(rankr[ni])
        rep_o.append(prev_off[ni] - 1)
        ridx = np.concatenate(rep_idx)
        if ridx.size:
            w0, w1 = _findmaxpref_batch(
                text, n, suftab, np.concatenate(rep_l),
                np.concatenate(rep_r), np.concatenate(rep_o),
                qtext, qpos[ridx], rem[ridx])
            witness[ridx] = w1
        # isomorphic chains: witness = inv[suftab[w_anchor] + k]
        ii = np.flatnonzero(iso)
        if ii.size:
            anchor_ok = ~iso & nonempty
            pidx = np.arange(m, dtype=np.int64)
            last_anchor = np.maximum.accumulate(
                np.where(anchor_ok, pidx, -1))
            a = last_anchor[ii]
            dist = ii - a
            wsrc = witness[a]
            raw = inv[np.minimum(suftab[wsrc] + dist,
                                 suftab.size - 1)]
            witness[ii] = raw
            # byte saturation fixup: a chain step whose
            # rank-within-bucket reaches 255 diverges from the closed
            # form (matchsub.c RANKOFNEXTLEAF1 is the saturated byte)
            capfail = (raw - bl[ii]) >= 255
            if capfail.any():
                bad = set()
                first_bad = {}
                for j in ii[capfail]:
                    aj = int(last_anchor[j])
                    if aj not in first_bad or j < first_bad[aj]:
                        first_bad[aj] = int(j)
                for aj, j0 in first_bad.items():
                    w = int(witness[j0 - 1]) if j0 - 1 != aj else \
                        int(witness[aj])
                    p = j0
                    while p < m and iso[p] and last_anchor[p] == aj:
                        nx = min(int(suftab[w]) + 1,
                                 int(suftab.size) - 1)
                        w = int(bl[p]) + int(s1[nx])
                        w = min(w, lcp.size - 1)
                        witness[p] = w
                        p += 1

    return proceed, maxlen, witness


def find_query_matches(
    esa: ESA,
    query: Multiseq,
    searchlength: int,
    mode: str = "mem",          # "mem" | "mumcand" | "mum"
    flags_extra: int = 0,
    qspeedup: int = 2,
) -> MatchTable:
    """All maximal substring matches (or MUM candidates) of every
    query sequence vs the index, length >= searchlength."""
    n = esa.totallength
    numofchars = esa.alpha.num_regular
    text = esa.text
    qtext = query.sequence
    nq = int(qtext.size)
    if searchlength < esa.prefixlength:
        raise ValueError(
            f"searchlength={searchlength} must be >= prefixlength="
            f"{esa.prefixlength}"
        )

    if mode == "mem" and qspeedup in (0, 2):
        # native sequential scan (native/querysub.c): the reference's
        # own O(1)-amortized state machine, fastest on host
        from ..native import querysub as _qs

        if _qs.available():
            return _native_query_matches(esa, query, searchlength,
                                         flags_extra, qspeedup)

    qpos, qseq, qoff, rem = _query_positions(query, searchlength)
    if qpos.size == 0:
        return MatchTable()

    # reference state machine: canonical intervals + the exact
    # emission witness (speedup 2 by default, matchsub.c:353-539)
    proceed, maxlen, wit_all = _ref_witness_state(
        esa, query, searchlength, qpos, qseq, qoff, rem, qspeedup)
    hit = proceed
    if not hit.any():
        return MatchTable()
    witness = wit_all[hit]
    maxlcp = maxlen[hit]
    qpos_h = qpos[hit]
    qseq_h = qseq[hit]
    qoff_h = qoff[hit]

    lcp = esa.lcptab
    if mode in ("mumcand", "mum"):
        # uniqueness of the witness at depth maxlcp
        # (leftrightmaximaluniquematch, fquery.c:297-360)
        left_ok = lcp[witness] < maxlcp
        n1 = lcp.size
        right_lcp = np.where(witness + 1 < n1, lcp[np.minimum(witness + 1, n1 - 1)], 0)
        right_ok = right_lcp < maxlcp
        uniq = left_ok & right_ok
        ranks = witness[uniq]
        mlens = maxlcp[uniq]
        qp = qpos_h[uniq]
        qs = qseq_h[uniq]
        qo = qoff_h[uniq]
        order = None
        mt = _emit(esa, query, ranks, mlens, qp, qs, qo, flags_extra)
        if mode == "mum":
            mt = _unique_in_query(mt, query)
        return mt

    # --- MEM emission: scan range = lcp>=L run containing witness ---
    L = searchlength
    run_left, run_right = _l_runs(lcp, L)
    if run_left.size:
        ri = np.searchsorted(run_left, witness, side="right") - 1
        ric = np.clip(ri, 0, run_left.size - 1)
        in_run = (ri >= 0) & (witness <= run_right[ric])
        A = np.where(in_run, run_left[ric], witness)
        Bnd = np.where(in_run, run_right[ric], witness)
    else:
        A = witness.copy()
        Bnd = witness.copy()

    counts = Bnd - A + 1
    total = int(counts.sum())
    g = np.repeat(np.arange(witness.size), counts)       # group id
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # emission step within group: witness..A (desc), then witness+1..B
    step = np.arange(total) - starts[g]
    wk = witness[g]
    Ak = A[g]
    nleft = wk - Ak + 1
    is_left = step < nleft
    ranks = np.where(is_left, wk - step, Ak + step)
    # match length = min(maxlcp, RMQ(lcp over (rank..witness]))
    rmq = LcpRmq(lcp)
    lo_r = np.minimum(ranks, wk)
    hi_r = np.maximum(ranks, wk)
    same = lo_r == hi_r
    # clamp to a non-empty range for the same-rank rows (their value is
    # discarded by the where)
    q_lo = np.minimum(lo_r + 1, lcp.size - 1)
    q_hi = np.maximum(hi_r, q_lo)
    d_rmq = np.where(
        same, maxlcp[g],
        np.minimum(maxlcp[g], rmq.query(q_lo, q_hi)),
    ).astype(np.int64)

    return _emit(esa, query, ranks, d_rmq, qpos_h[g], qseq_h[g],
                 qoff_h[g], flags_extra)


def _emit(esa, query, ranks, mlens, qp, qs, qo, flags_extra):
    """Left-maximality filter + MatchTable build
    (PROCESSSUFFIX fquery.c:53-81 + processexactquerymatch
    procexqu.c:17-62)."""
    if ranks.size == 0:
        return MatchTable()
    text = esa.text
    qtext = query.sequence
    sufstart = esa.suftab[ranks].astype(np.int64)
    leftq = np.where(qo > 0, qtext[np.maximum(qp - 1, 0)], 255)
    emit = (
        (sufstart == 0)
        | (leftq >= WILDCARD)
        | (text[np.maximum(sufstart - 1, 0)] != leftq)
    )
    sufstart = sufstart[emit]
    mlens = mlens[emit].astype(np.int64)
    qs = qs[emit].astype(np.int64)
    qo = qo[emit].astype(np.int64)
    qp = qp[emit].astype(np.int64)
    tot = sufstart.size
    ms = esa.multiseq
    seq1, rel1 = ms.pos_to_pair(sufstart)
    return MatchTable(
        length1=mlens,
        position1=sufstart,
        length2=mlens.copy(),
        position2=qp,
        distance=np.zeros(tot, np.int64),
        flag=np.full(tot, FLAGQUERY | flags_extra, np.int64),
        seqnum1=seq1,
        relpos1=rel1,
        seqnum2=qs,
        relpos2=qo,
        evalue=np.zeros(tot, np.float64),
        idnumber=np.zeros(tot, np.int64),
        transnum=np.full(tot, -1, np.int64),
    )


def _unique_in_query(mt: MatchTable, query: Multiseq) -> MatchTable:
    """mumuniqueinquery (reference kurtz/cleanMUMcand.c:57-115):
    candidates sorted by (dbstart asc, length desc); a running maximal
    db-interval right end drops contained candidates; equal right ends
    with equal dbstart drop both copies.  Survivors are emitted in the
    sorted order (the reference's global post-pass after all query
    sequences, fquery.c:480-489)."""
    if len(mt) == 0:
        return mt
    order = np.lexsort((-mt.length1, mt.position1))
    s = mt.select(order)
    pos = s.position1
    ln = s.length1
    # the running dbright equals the prefix max of right ends (dropped
    # candidates never exceed it), so the loop vectorizes: keep iff
    # strictly past the prefix max; an equal right end additionally
    # drops an immediately preceding kept copy at the same dbstart
    right = pos + ln - 1
    prefmax = np.concatenate(
        [[0], np.maximum.accumulate(right)[:-1]])
    keep = right > prefmax
    eq = right == prefmax
    drop_prev = np.zeros(len(s), bool)
    if len(s) > 1:
        drop_prev[:-1] = eq[1:] & (pos[:-1] == pos[1:]) & keep[:-1]
    keep &= ~drop_prev
    return s.select(keep)
