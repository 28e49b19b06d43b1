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


def _fmp_trip(text, P, suftab, qtext, Pq, st,
              n: int, nq: int, bits: int, D: int, W: int = 1):
    """One fused trip: advance every live comparison by up to W
    packed words + binary-search bookkeeping for lanes whose
    comparison just resolved."""
    kmask = jnp.int32((1 << (D * bits)) - 1)
    sh = D * bits
    if True:
        (phase, lo, hi, lpref, rpref, cur, wit0, wit1, tgt, cstart,
         l, off0, qpos, qlen, idx) = st
        active = phase < _DONE
        # ---- packed-word comparison steps (maxpref.c COMPARE) ----
        adv = jnp.zeros_like(l)
        cdone = jnp.zeros(l.shape, bool)
        for _w in range(W):
            ia = cstart + l + adv
            ib = qpos + l + adv
            pa = P[jnp.minimum(ia, n - 1)]
            pb = Pq[jnp.minimum(ib, nq - 1)]
            offa = jnp.where(ia < n,
                             lax.shift_right_logical(pa, sh), 0)
            offb = jnp.where(ib < nq,
                             lax.shift_right_logical(pb, sh), 0)
            x = (pa ^ pb) & kmask
            msb = lax.population_count(_smear(x)) - 1
            fd = jnp.where(x == 0, jnp.int32(D), D - 1 - msb // bits)
            rem = jnp.minimum(fd, jnp.minimum(offa, offb))
            # the query side never matches past qlen (caller
            # guarantees a special/end at qpos+qlen); cap defensively
            rem = jnp.minimum(rem,
                              jnp.maximum(qlen - (l + adv), 0))
            adv = adv + jnp.where(cdone, 0, rem)
            cdone = cdone | (rem < D)
        l = l + jnp.where(active, adv, 0)
        stopped = active & cdone
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


@functools.partial(
    jax.jit,
    static_argnames=("T", "M", "n", "nq", "bits", "D"))
def _fmp_round(text, P, suftab, qtext, Pq, state,
               T: int, M: int, n: int, nq: int, bits: int, D: int):
    """T fused trips over M lanes (fori: host drives compaction)."""
    state = lax.fori_loop(
        0, T,
        lambda _, st: _fmp_trip(text, P, suftab, qtext, Pq, st,
                                n, nq, bits, D),
        state)
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


# ---------------------------------------------------------------------------
# fully-async db-vs-itself MEM pipeline (the -q db-vs-self workload):
# classification -> replay -> witness assembly -> emission as chained
# device programs with TWO total host syncs.  Mirrors the host
# _ref_witness_state speedup-2 state machine statement for statement.
# ---------------------------------------------------------------------------


_LSTART = 8   # truncated-descent start level: runs wider than
#               2^(_LSTART+1)-1 escalate to the full-depth pass


def _scan_left_in(table, idx, depth, levels: int, n1: int,
                  top: int | None = None):
    t = idx
    for e in range(min(levels, top if top is not None else levels)
                   - 1, -1, -1):
        lo = t - (1 << e) + 1
        mn = table[e, jnp.clip(lo, 0, n1 - 1)]
        t = jnp.where((lo >= 0) & (mn >= depth), t - (1 << e), t)
    return t


def _scan_right_in(table, idx, depth, levels: int, n1: int,
                   top: int | None = None):
    t = idx
    nmax = n1 - 1
    for e in range(min(levels, top if top is not None else levels)
                   - 1, -1, -1):
        mn = table[e, jnp.clip(t + 1, 0, n1 - 1)]
        t = jnp.where((t + (1 << e) <= nmax) & (mn >= depth),
                      t + (1 << e), t)
    return t


def _scan_sparse(table, idx, dep, levels: int, n1: int, H: int,
                 right: bool):
    """Interval-boundary scan with a singleton fast path: lanes whose
    bounding lcp already breaks the threshold answer immediately (one
    gather); the rest are compacted to H slots, galloped in two
    geometric stages, and scattered back.  Returns (answer,
    n_hard) — n_hard > H means some lanes kept the (wrong) singleton
    answer and the caller must fall back."""
    nq = idx.shape[0]
    col = jnp.clip(idx + 1, 0, n1 - 1) if right \
        else jnp.clip(idx, 0, n1 - 1)
    lcp0 = table[0, col]
    if right:
        singleton = (idx + 1 > n1 - 1) | (lcp0 < dep)
    else:
        singleton = lcp0 < dep
    hard = ~singleton
    n_hard = jnp.sum(hard.astype(jnp.int32))
    dst = jnp.cumsum(hard.astype(jnp.int32)) - 1
    dst = jnp.where(hard & (dst < H), dst, H)
    idxh = jnp.zeros(H, jnp.int32).at[dst].set(idx, mode="drop")
    deph = jnp.full(H, jnp.int32(2**30), jnp.int32).at[dst].set(
        dep, mode="drop")
    posh = jnp.full(H, nq, jnp.int32).at[dst].set(
        jnp.arange(nq, dtype=jnp.int32), mode="drop")
    gallop = _gallop_right if right else _gallop_left
    # stage 1: bounded trips at H; survivors continue at H//8
    th, mh, eh = gallop(table, idxh, deph, levels, n1, max_trips=10)
    unres = mh < 2
    H2 = max(1, H // 8)
    n2 = jnp.sum(unres.astype(jnp.int32))
    d2 = jnp.cumsum(unres.astype(jnp.int32)) - 1
    d2 = jnp.where(unres & (d2 < H2), d2, H2)

    def scat2(a, fill):
        return jnp.full(H2, fill, jnp.int32).at[d2].set(a, mode="drop")

    th2, _, _ = gallop(table, scat2(th, 0), scat2(deph, 2**30),
                       levels, n1, max_trips=2 * levels + 4,
                       m0=scat2(mh, 2), e0=scat2(eh, 0))
    pos2 = scat2(posh, nq)
    ans = idx
    ans = ans.at[jnp.where(posh < nq, posh, nq)].set(th, mode="drop")
    ans = ans.at[jnp.where(pos2 < nq, pos2, nq)].set(th2, mode="drop")
    bad = ((n_hard > H) | (n2 > H2)).astype(jnp.int32)
    return ans, bad


def _gallop_left(table, idx, dep, levels: int, n1: int,
                 max_trips: int | None = None, m0=None, e0=None):
    """max s <= idx with lcp[s] < dep (dep >= 1 for live lanes) —
    adaptive: gallop the window level up until it contains a
    qualifying element (or crosses rank 0), then do the aligned
    top-down descent from that level.  Cost ~2 log2(result interval
    width) gathers per lane instead of the fixed `levels`; on
    high-depth queries the interval is almost always a singleton and
    the loop exits after one trip.  ``max_trips`` bounds the loop (for
    staged compaction); ``m0``/``e0`` resume a bounded run."""
    tflat = table.reshape(-1)
    mode0 = jnp.zeros(idx.shape, jnp.int32) if m0 is None else m0
    e0 = jnp.zeros(idx.shape, jnp.int32) if e0 is None else e0
    cap = jnp.int32(max_trips if max_trips is not None
                    else 2 * levels + 4)

    def cond(st):
        i, m, e, t = st
        return (i < cap) & jnp.any(m < 2)

    def body(st):
        i, m, e, t = st
        w = jnp.left_shift(jnp.int32(1), e)
        lo = t - w + 1
        mn = tflat[e * n1 + jnp.clip(lo, 0, n1 - 1)]
        g = m == 0
        d = m == 1
        found = (lo < 0) | (mn < dep)
        m_g = jnp.where(found, jnp.where(e == 0, 2, 1), 0)
        e_g = jnp.where(found, e - 1, e + 1)
        skip = (lo >= 0) & (mn >= dep)
        t_d = jnp.where(skip, t - w, t)
        m_d = jnp.where(e == 0, jnp.int32(2), jnp.int32(1))
        e_d = e - 1
        m2 = jnp.where(g, m_g, jnp.where(d, m_d, m))
        e2 = jnp.clip(jnp.where(g, e_g, jnp.where(d, e_d, e)),
                      0, levels - 1)
        t2 = jnp.where(d, t_d, t)
        return i + 1, m2, e2, t2

    _, m, e, t = lax.while_loop(cond, body,
                                (jnp.int32(0), mode0, e0, idx))
    return t, m, e


def _gallop_right(table, idx, dep, levels: int, n1: int,
                  max_trips: int | None = None, m0=None, e0=None):
    """(min s > idx with lcp[s] < dep) - 1 — gallop twin of
    :func:`_gallop_left`."""
    tflat = table.reshape(-1)
    nmax = n1 - 1
    mode0 = jnp.zeros(idx.shape, jnp.int32) if m0 is None else m0
    e0 = jnp.zeros(idx.shape, jnp.int32) if e0 is None else e0
    cap = jnp.int32(max_trips if max_trips is not None
                    else 2 * levels + 4)

    def cond(st):
        i, m, e, t = st
        return (i < cap) & jnp.any(m < 2)

    def body(st):
        i, m, e, t = st
        w = jnp.left_shift(jnp.int32(1), e)
        mn = tflat[e * n1 + jnp.clip(t + 1, 0, n1 - 1)]
        over = t + w > nmax
        g = m == 0
        d = m == 1
        found = over | (mn < dep)
        m_g = jnp.where(found, jnp.where(e == 0, 2, 1), 0)
        e_g = jnp.where(found, e - 1, e + 1)
        skip = (~over) & (mn >= dep)
        t_d = jnp.where(skip, t + w, t)
        m_d = jnp.where(e == 0, jnp.int32(2), jnp.int32(1))
        e_d = e - 1
        m2 = jnp.where(g, m_g, jnp.where(d, m_d, m))
        e2 = jnp.clip(jnp.where(g, e_g, jnp.where(d, e_d, e)),
                      0, levels - 1)
        t2 = jnp.where(d, t_d, t)
        return i + 1, m2, e2, t2

    _, m, e, t = lax.while_loop(cond, body,
                                (jnp.int32(0), mode0, e0, idx))
    return t, m, e


def _qself_classify(qtext, suftab, stitab, s1, bck, table, L,
                    nq: int, n: int, n1: int, pl: int, sigma: int,
                    levels: int, R: int, H: int, SE: int):
    """Lane setup + fast-path matching statistics + canonical scans +
    fresh/shortcut/iso classification + replay-lane compaction, all in
    one dispatch (db==query identical-text case).

    The central shortcut: a lane whose query suffix has no special
    before its sequence end AND whose depth-maxlen interval is a
    singleton is SAFE — the reference's binary search can only have
    returned the rank of the suffix itself (stitab[qpos]), because no
    other db suffix attains the full-suffix match length.  Safe lanes
    need no replay, anchor isomorphic chains directly, and (when their
    L-run is also a singleton) emit analytically.  Only the unsafe
    residue — special-capped or duplicated-suffix lanes — pays for
    the fresh/iso state machine and the fused binary-search replay.
    """
    from ..core.chardef import SEPARATOR, WILDCARD

    pos = jnp.arange(nq, dtype=jnp.int32)
    qt = qtext.astype(jnp.int32)
    sep = qt == SEPARATOR
    special = qt >= WILDCARD
    nxt_sep = lax.associative_scan(
        jnp.minimum, jnp.where(sep, pos, jnp.int32(nq)), reverse=True)
    rem = nxt_sep - pos
    lane = rem >= L
    prev_sep = jnp.concatenate([jnp.ones(1, bool), sep[:-1]])
    seq_start = lane & prev_sep
    nxt_spec = lax.associative_scan(
        jnp.minimum, jnp.where(special, pos, jnp.int32(nq)),
        reverse=True)
    ms = nxt_spec - pos

    # rolling bucket code at depth pl (host bucket_codes semantics:
    # digits from the first special onward are sigma-1)
    padded = jnp.concatenate(
        [qt, jnp.full(max(pl, 1), SEPARATOR, jnp.int32)])
    fs = jnp.full(nq, jnp.int32(pl), jnp.int32)
    code = jnp.zeros(nq, jnp.int32)
    for j in range(pl):
        cj = lax.dynamic_slice(padded, (j,), (nq,))
        isp = cj >= WILDCARD
        fs = jnp.where(isp & (fs > j), j, fs)
        code = code * sigma + jnp.where(fs > j, cj, sigma - 1)
    valid = fs >= pl
    bl = bck[2 * code].astype(jnp.int32)
    br = bck[2 * code + 1].astype(jnp.int32)
    nonempty = lane & valid & (br > bl)
    maxlen = jnp.where(nonempty, jnp.minimum(ms, rem), 0)
    member = jnp.where(nonempty, stitab[:nq], 0)

    BIGDEP = jnp.int32(2**30)
    dep = jnp.where(nonempty, jnp.maximum(maxlen, 1), BIGDEP)
    ileft, bad0 = _scan_sparse(table, member, dep, levels, n1, H,
                               right=False)
    iright, bad1 = _scan_sparse(table, member, dep, levels, n1, H,
                                right=True)
    # unique-at-maxlen => the replay is predetermined: no other db
    # suffix can attain the (special-capped) maximal match length
    # maxlen vs this query suffix — any suffix matching maxlen regular
    # chars lies in [ileft, iright], and lce vs the query cannot
    # exceed maxlen past the query's special/end — so the reference's
    # binary search can only return stitab[qpos]
    safe = nonempty & (ileft == iright)

    def shift1(a, fill=0):
        return jnp.concatenate(
            [jnp.full(1, fill, a.dtype), a[:-1]])

    prev_off = jnp.where(seq_start, 0, shift1(maxlen))
    prev_left = shift1(ileft)
    prev_right = shift1(iright)
    prev_ne = shift1(nonempty.astype(jnp.int32)).astype(bool) \
        & ~seq_start
    nxtr = jnp.minimum(
        suftab[jnp.where(prev_ne, prev_right, 0)] + 1, n)
    capped = s1[nxtr].astype(jnp.int32) == 255
    fresh = nonempty & ((prev_off <= pl) | capped | seq_start)
    shortcut = nonempty & ~fresh
    d1 = prev_off - 1
    # The reference's shortcut re-scan (matchsub.c: rank the
    # successors of the previous interval's bounds via the sti1 byte,
    # then scanleft/scanright at depth d1) reduces ALGEBRAICALLY to
    # the current lane's own maxlen-interval: d1 = prev_off - 1 ==
    # maxlen (the previous char is regular for every shortcut lane),
    # every successor of a prev-interval member shares maxlen chars
    # with the current suffix, so the d1-interval containing the
    # successors IS [ileft, iright].  Byte saturation cannot break
    # this: a saturated sti1 byte at the prev-RIGHT successor fires
    # ``capped`` (-> fresh), and a saturated prev-LEFT successor
    # implies bl+255 still lies inside [ileft, iright], landing the
    # reference's scan on the same interval.  Hence:
    #   rankl == ileft, rankr == iright,
    # and the scans + sti1/suftab gathers vanish.
    iso = shortcut & (iright - ileft == prev_right - prev_left)
    noniso = shortcut & ~iso
    # A non-iso replay starts at offset d1 == maxlen over
    # [ileft, iright]: every probe stops immediately at the query's
    # special/end with l == maxlen, so the fused binary search can
    # never improve on its first probe — its witness is ileft,
    # analytically.  Only capped/fresh lanes still replay.
    replay = fresh & ~safe
    wit0 = jnp.where(noniso & ~safe, ileft, member)
    proceed = nonempty & (maxlen >= L)
    badscan = bad0 + bad1

    # ---- L-run bounds of the member (== witness) rank + the
    # singleton/non-singleton emission split ----
    lcp0 = table[0]
    idxs = jnp.arange(n1, dtype=jnp.int32)
    small = lcp0 < L
    runleft = lax.cummax(jnp.where(small, idxs, -1))
    nxt = lax.associative_scan(
        jnp.minimum, jnp.where(small, idxs, jnp.int32(n1)),
        reverse=True)
    nxt_sh = jnp.concatenate([nxt[1:], jnp.full(1, n1, jnp.int32)])
    w = jnp.clip(member, 0, n1 - 1)
    A = runleft[w]
    B = jnp.minimum(nxt_sh[w] - 1, n1 - 1)
    pp = proceed & (B > A)
    cnt = jnp.where(pp, B - A + 1, 0)
    offs = jnp.cumsum(cnt) - cnt
    total_ns = offs[-1] + cnt[-1]
    # singleton-run lanes: witness rank == member rank == stitab[qpos]
    # (proven by the same uniqueness argument), so the single record is
    # (qpos, maxlen, qpos) and the left-maximality filter reduces to
    # "previous query char missing or special"
    prevq = jnp.concatenate(
        [jnp.full(1, jnp.int32(SEPARATOR)), qt[:-1]])
    s_emit = proceed & (B == A) & (prevq >= WILDCARD)
    n_sing = jnp.sum(s_emit.astype(jnp.int32))
    sdst = jnp.cumsum(s_emit.astype(jnp.int32)) - 1
    sdst = jnp.where(s_emit & (sdst < SE), sdst, SE)
    sing_pos = jnp.full(SE, -1, jnp.int32).at[sdst].set(
        pos, mode="drop")
    sing_len = jnp.zeros(SE, jnp.int32).at[sdst].set(
        maxlen, mode="drop")

    # compact replay lanes into R slots (overflow detected later)
    rl = bl
    rr = br - 1
    o0 = jnp.full(nq, jnp.int32(pl), jnp.int32)
    nrep = jnp.sum(replay.astype(jnp.int32))
    dst = jnp.cumsum(replay.astype(jnp.int32)) - 1
    dst = jnp.where(replay & (dst < R), dst, R)

    def scat(a, fill):
        return jnp.full(R, fill, jnp.int32).at[dst].set(
            a, mode="drop")

    lane_idx = scat(pos, -1)
    state = (  # noqa: keep layout in sync with _fmp_trip
        jnp.where(lane_idx >= 0, jnp.int32(0), _DONE),   # phase
        scat(rl, 0), scat(rr, 0),                        # lo, hi
        jnp.zeros(R, jnp.int32), jnp.zeros(R, jnp.int32),  # l/rpref
        scat(o0, 0),                                     # cur
        jnp.zeros(R, jnp.int32), scat(rl, 0),            # wit0, wit1
        scat(rl, 0),                                     # tgt
        suftab[jnp.clip(scat(rl, 0), 0, n)],             # cstart
        scat(o0, 0), scat(o0, 0),                        # l, off0
        scat(pos, 0), scat(rem, 0),                      # qpos, qlen
        lane_idx,
    )
    return (proceed, maxlen, wit0, iso, nonempty, safe, bl,
            A, B, offs, total_ns, pp, sing_pos, sing_len, n_sing,
            state, nrep, badscan)


@functools.partial(
    jax.jit,
    static_argnames=("T", "W", "R2", "n", "nq", "bits", "D"))
def _fmp_stage1(text, P, suftab, state, wacc,
                T: int, W: int, R2: int, n: int, nq: int, bits: int,
                D: int):
    """Fixed T trips, then harvest resolved lanes' witnesses into the
    full-width accumulator and compact survivors to R2 slots (db-vs-
    self replay: query side == db side)."""
    state = lax.fori_loop(
        0, T,
        lambda _, st: _fmp_trip(text, P, suftab, text, P, st,
                                n, nq, bits, D, W),
        state)
    phase = state[0]
    idx = state[14]
    done = (phase >= _DONE) & (idx >= 0)
    wacc = wacc.at[jnp.where(done, idx, nq)].set(
        state[7], mode="drop")
    live = phase < _DONE
    nlive = jnp.sum(live.astype(jnp.int32))
    dst = jnp.cumsum(live.astype(jnp.int32)) - 1
    dst = jnp.where(live & (dst < R2), dst, R2)
    out = []
    for j, arr in enumerate(state):
        fill = _DONE if j == 0 else (-1 if j == 14 else 0)
        out.append(jnp.full(R2, fill, arr.dtype).at[dst].set(
            arr, mode="drop"))
    return tuple(out), wacc, nlive


@functools.partial(
    jax.jit,
    static_argnames=("T", "W", "n", "nq", "bits", "D"))
def _fmp_finish(text, P, suftab, state, wacc,
                T: int, W: int, n: int, nq: int, bits: int, D: int):
    """Run the survivors to completion (bounded by T trips) in one
    dispatch and harvest; returns the count left unresolved."""

    def cond(carry):
        i, st = carry
        return (i < T) & jnp.any(st[0] < _DONE)

    def body(carry):
        i, st = carry
        st = _fmp_trip(text, P, suftab, text, P, st, n, nq,
                       bits, D, W)
        return i + 1, st

    _, state = lax.while_loop(cond, body, (jnp.int32(0), state))
    phase = state[0]
    idx = state[14]
    done = (phase >= _DONE) & (idx >= 0)
    wacc = wacc.at[jnp.where(done, idx, nq)].set(
        state[7], mode="drop")
    nunf = jnp.sum((phase < _DONE).astype(jnp.int32))
    return wacc, nunf


@functools.partial(jax.jit, static_argnames=("nq", "n"))
def _qself_witness(wacc, iso, nonempty, safe, bl, suftab, stitab,
                   nq: int, n: int):
    """Isomorphic-chain closed form over the harvested witnesses
    (w_{a+k} = inv[suftab[w_a] + k]) + saturation-failure count.

    Safe lanes keep their predetermined witness (wacc holds the member
    rank there) and serve as chain anchors: anchoring at ANY lane with
    a correct witness between the reference's own anchor and the
    target lane yields the identical closed-form value
    (suftab[w] telescopes along the chain)."""
    witness = wacc
    pos = jnp.arange(nq, dtype=jnp.int32)
    anchor_ok = (safe | ~iso) & nonempty
    last_anchor = lax.cummax(jnp.where(anchor_ok, pos, -1))
    a = jnp.maximum(last_anchor, 0)
    dist = pos - a
    wsrc = witness[a]
    raw = stitab[jnp.minimum(suftab[wsrc] + dist, n)]
    use = iso & ~safe
    witness = jnp.where(use, raw, witness)
    capfail = use & (raw - bl >= 255)
    ncap = jnp.sum(capfail.astype(jnp.int32))
    return witness, ncap


@functools.partial(
    jax.jit,
    static_argnames=("nq", "n", "n1", "pl", "sigma", "levels", "R",
                     "R2", "H", "SE"))
def _qself_presync(qtext, suftab, stitab, s1, bck, table, P, L,
                   nq: int, n: int, n1: int, pl: int, sigma: int,
                   levels: int, R: int, R2: int, H: int, SE: int):
    """Classify + replay + witness as ONE dispatch (the per-dispatch
    round trip through the device link is material; everything up to
    the first host sync fuses)."""
    (proceed, maxlen, wit0, iso, nonempty, safe, bl,
     A, B, offs, total_ns, pp, sing_pos, sing_len, n_sing,
     state, nrep, badscan) = _qself_classify(
        qtext, suftab, stitab, s1, bck, table, L,
        nq, n, n1, pl, sigma, levels, R, H, SE)
    bits, D = lce_pack_params(sigma)
    state, wacc, nlive = _fmp_stage1(
        qtext, P, suftab, state, wit0, 12, 1, R2, n, nq, bits, D)
    wacc, nunf = _fmp_finish(
        qtext, P, suftab, state, wacc, 4096, 4, n, nq, bits, D)
    witness, ncap = _qself_witness(
        wacc, iso, nonempty, safe, bl, suftab, stitab, nq, n)
    chk = jnp.stack([total_ns, nrep, ncap, nunf, nlive, badscan,
                     n_sing])
    return (proceed, maxlen, witness, A, B, offs, total_ns, pp,
            sing_pos, sing_len, chk)


@functools.partial(
    jax.jit, static_argnames=("E", "nq", "n", "n1"))
def _qself_expand(text, suftab, qtext, table, log2tab, A, B, offs,
                  witness, maxlen, pp, total,
                  E: int, nq: int, n: int, n1: int):
    """Masked full-width variant of _mem_expand restricted to the
    NON-SINGLETON runs (``pp``; singleton lanes emit analytically):
    the left-maximality prefilter runs BEFORE the RMQ so only
    surviving records pay the range-min gathers."""
    from ..core.chardef import WILDCARD as _W

    gseed = jnp.zeros(E, jnp.int32).at[
        jnp.where(pp, jnp.minimum(offs, E), E)].max(
        jnp.arange(nq, dtype=jnp.int32), mode="drop")
    g = lax.associative_scan(jnp.maximum, gseed)
    slot = jnp.arange(E, dtype=jnp.int32)
    live = slot < total
    step = slot - offs[g]
    wk = jnp.clip(witness[g], 0, n1 - 1)
    Ak = A[g]
    nleft = wk - Ak + 1
    is_left = step < nleft
    ranks = jnp.where(is_left, wk - step, Ak + step)
    ranks = jnp.clip(ranks, 0, n1 - 1)
    # left-maximality PRE-filter.  qoff==0 (host leftq=255) implies
    # qtext[g-1] is a separator (>= WILDCARD) or g==0 — identical
    # emit outcome, so the raw previous char stands in for leftq
    sufstart = suftab[ranks]
    leftq = jnp.where(
        g == 0, jnp.int32(255),
        qtext[jnp.clip(g - 1, 0, nq - 1)].astype(jnp.int32))
    prevc = text[jnp.clip(sufstart - 1, 0, n - 1)].astype(jnp.int32)
    emit = live & ((sufstart == 0) | (leftq >= _W) | (prevc != leftq))
    dst = jnp.cumsum(emit.astype(jnp.int32)) - 1
    dst = jnp.where(emit, dst, E)
    c_rank = jnp.zeros(E, jnp.int32).at[dst].set(ranks, mode="drop")
    c_pos = jnp.full(E, -1, jnp.int32).at[dst].set(
        sufstart, mode="drop")
    c_g = jnp.zeros(E, jnp.int32).at[dst].set(g, mode="drop")
    kept = jnp.sum(emit.astype(jnp.int32))
    # RMQ lengths only for survivors
    wk2 = jnp.clip(witness[c_g], 0, n1 - 1)
    lo_r = jnp.minimum(c_rank, wk2)
    hi_r = jnp.maximum(c_rank, wk2)
    same = lo_r == hi_r
    q_lo = jnp.minimum(lo_r + 1, n1 - 1)
    q_hi = jnp.maximum(hi_r, q_lo)
    width = q_hi - q_lo + 1
    k = log2tab[jnp.clip(width, 1, n1)]
    mn = jnp.minimum(
        table[k, jnp.clip(q_lo, 0, n1 - 1)],
        table[k, jnp.clip(q_hi - (1 << k) + 1, 0, n1 - 1)])
    c_len = jnp.where(same, maxlen[c_g], jnp.minimum(maxlen[c_g], mn))
    return c_pos, c_len, c_g, kept


def _sti1_dev(esa):
    cache = esa._device_cache
    if "s1" not in cache:
        s1 = getattr(esa, "_sti1_cache", None)
        if s1 is None:
            from ..index.io import sti1_table

            s1 = sti1_table(esa.suftab, esa.lcptab, esa.prefixlength)
            esa._sti1_cache = s1
        cache["s1"] = jnp.asarray(s1)
    return cache["s1"]


def find_query_mems_self_device(esa, query, L: int):
    """db-vs-itself -q MEM matching (qspeedup 2) as a chained-async
    device pipeline; returns (dbpos, length, qpos) host arrays in
    reference emission order, or None when every static-budget ladder
    step overflowed (caller falls back to the general path).

    Two host syncs per attempt: budget flags + non-singleton record
    count, then the compacted record download.  The common case runs
    at the SMALL ladder step: safe lanes (see _qself_classify) leave
    only a residue of replay lanes and hard scan lanes, so R/H start
    at a few thousand and escalate only on overflow."""
    from .query import _dev_lcp_rmq

    qtext = query.sequence
    nq = int(qtext.size)
    n = esa.totallength
    sigma = esa.alpha.num_regular
    pl = esa.prefixlength
    table, levels, n1 = _dev_lcp_rmq(esa)
    text_dev, P, suftab, bits, D, _ = _db_tables(esa)
    stitab = esa.device("stitab")
    s1 = _sti1_dev(esa)
    cache = esa._device_cache
    if "bck" not in cache:
        cache["bck"] = jnp.asarray(esa.bcktab.astype(np.int64))
    bck = cache["bck"]
    if "log2tab" not in cache:
        cache["log2tab"] = jnp.asarray(
            np.floor(np.log2(np.maximum(np.arange(n1 + 2), 1))
                     ).astype(np.int32))
    log2tab = cache["log2tab"]

    n_special = int(np.count_nonzero(qtext >= 250))
    SE = _nice_size(n_special + 16)
    ladder = [
        (_nice_size(max(4096, nq // 2)),
         _nice_size(max(4096, nq // 24))),
        (_nice_size(max(4096, nq // 2)),
         _nice_size(max(16384, nq // 6))),
    ]
    Ld = jnp.int32(L)
    for H, R in ladder:
        R2 = _nice_size(max(1024, R // 4))
        (proceed, maxlen, witness, A, B, offs, total_ns, pp,
         sing_pos, sing_len, chk_d) = _qself_presync(
            text_dev, suftab, stitab, s1, bck, table, P, Ld,
            nq, n, n1, pl, sigma, levels, R, R2, H, SE)
        # ---- sync 1: budget checks + expansion size ----
        chk = np.asarray(chk_d)
        (total_i, nrep_i, ncap_i, nunf_i, nlive_i, badscan_i,
         nsing_i) = (int(x) for x in chk)
        if ncap_i > 0 or nunf_i > 0:
            return None        # escalation cannot help these
        if nrep_i > R or nlive_i > R2 or badscan_i > 0:
            continue           # escalate the ladder
        E = _nice_size(max(1, total_i))
        c_pos, c_len, c_g, kept = _qself_expand(
            text_dev, suftab, text_dev, table, log2tab, A, B, offs,
            witness, maxlen, pp, total_ns, E, nq, n, n1)
        # ---- sync 2: surviving-record count; sync 3: one compacted
        # download of records + singleton emissions (the E-wide
        # buffers never cross the link) ----
        kept_i = int(kept)
        host = np.asarray(jnp.concatenate(
            [c_pos[:kept_i], c_len[:kept_i], c_g[:kept_i],
             sing_pos[:nsing_i], sing_len[:nsing_i]]))
        ns_pos = host[:kept_i].astype(np.int64)
        ns_len = host[kept_i:2 * kept_i].astype(np.int64)
        ns_g = host[2 * kept_i:3 * kept_i].astype(np.int64)
        sp = host[3 * kept_i: 3 * kept_i + nsing_i].astype(np.int64)
        sl = host[3 * kept_i + nsing_i:].astype(np.int64)
        if nsing_i == 0:
            return ns_pos, ns_len, ns_g
        # merge the two streams by query position (stable: a lane is
        # singleton XOR non-singleton, per-lane record order is the
        # device order)
        g_all = np.concatenate([ns_g, sp])
        order = np.argsort(g_all, kind="stable")
        pos_all = np.concatenate([ns_pos, sp])[order]
        len_all = np.concatenate([ns_len, sl])[order]
        return pos_all, len_all, g_all[order]
    return None


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
