"""Maximal repeated pairs (vmatch -l, self matches).

Reference algorithm (src/Vmengine/vmatfind.c:240-541): Abouelhoda-
Kurtz-Ohlebusch bottom-up traversal with per-node position lists
partitioned by left context character; cartesian products of
left-diverse pairs.

TPU-native reformulation (SURVEY.md §7): a maximal pair is fully
characterized WITHOUT a traversal —

    (p, q) with p < q is a maximal repeat of length d  iff
      d = lce(p, q) >= searchlength   (right-maximality is automatic:
                                       d is the exact mismatch point)
      and the left contexts diverge: text[p-1] != text[q-1], where a
      special char / sequence start counts as always-diverse
      (vmatfind.c:44-45 ISLEFTDIVERSE, uniquechar list semantics).

Since lce(suffix at rank i, suffix at rank j) = min lcp[i+1..j], the
candidate pairs are exactly the rank pairs inside maximal runs of
lcp >= searchlength, their lengths are range-minima (sparse-table RMQ,
vectorized gathers), and left-divergence is an elementwise key
comparison on the bwt.  No stack, no pointer chasing — pair expansion,
RMQ and filtering are flat array ops.

Emission order is canonical (interval-major, then (i, j) rank pairs);
the reference's own differential tests compare sorted outputs
(bin/Cmponl.sh), and `-sort` modes reorder deterministically.
"""

from __future__ import annotations

import numpy as np

from ..core.chardef import WILDCARD
from ..index.esa import ESA
from .match import MatchTable

# cap on per-chunk expanded candidate pairs (memory control)
_PAIR_CHUNK = 1 << 22


class LcpRmq:
    """Sparse-table range-minimum over the lcp array (host NumPy).
    O(n log n) build, O(1) batched queries via two gathers."""

    def __init__(self, lcp: np.ndarray):
        n = lcp.size
        levels = max(1, int(np.floor(np.log2(max(n, 1)))) + 1)
        self.table = [lcp.astype(np.int32)]
        for k in range(1, levels):
            prev = self.table[-1]
            half = 1 << (k - 1)
            if prev.size <= half:
                break
            self.table.append(
                np.minimum(prev[:-half], prev[half:])
            )
        self.n = n

    def query(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        """min lcp[lo..hi] inclusive, lo <= hi (vectorized)."""
        width = hi - lo + 1
        k = np.maximum(np.int64(np.log2(1)), 0)
        k = np.floor(np.log2(width)).astype(np.int64)
        out = np.empty(lo.size, np.int32)
        for kk in np.unique(k):
            t = self.table[int(kk)]
            sel = k == kk
            a = lo[sel]
            b = hi[sel] - (1 << int(kk)) + 1
            out[sel] = np.minimum(t[a], t[b])
        return out


def _diverse_keys(esa: ESA) -> np.ndarray:
    """Left-context key per rank: regular bwt char, or a unique value
    for specials / suffix 0 (always left-diverse)."""
    bwt = esa.bwttab
    n1 = bwt.size
    ranks = np.arange(n1, dtype=np.int64)
    keys = np.where(bwt < WILDCARD, bwt.astype(np.int64), 256 + ranks)
    return keys


def _l_runs(lcp: np.ndarray, L: int) -> tuple[np.ndarray, np.ndarray]:
    """Maximal runs of lcp >= L: returns (left, right) rank intervals
    (run over lcp indices [s..e] covers suffix ranks [s-1..e])."""
    ge = lcp >= L
    starts = np.flatnonzero(ge & ~np.concatenate([[False], ge[:-1]]))
    ends_idx = np.flatnonzero(ge & ~np.concatenate([ge[1:], [False]]))
    return starts - 1, ends_idx


def _iter_pair_chunks(left: np.ndarray, m: np.ndarray):
    """Yield (left_slice, m_slice) with bounded expanded pair count."""
    npairs = (m * (m - 1)) // 2
    cum = np.cumsum(npairs)
    bounds = [0]
    last = 0
    for i in range(left.size):
        if cum[i] - last > _PAIR_CHUNK and i > bounds[-1]:
            bounds.append(i)
            last = cum[i - 1]
    bounds.append(left.size)
    for ci in range(len(bounds) - 1):
        lo, hi = bounds[ci], bounds[ci + 1]
        if lo < hi:
            yield left[lo:hi], m[lo:hi]


def _expand_pairs(left: np.ndarray, m: np.ndarray):
    """All rank pairs (i < j) within each interval, interval-major,
    (i, j) lexicographic — flat triangular index decode."""
    npairs = (m * (m - 1)) // 2
    total = int(npairs.sum())
    if total == 0:
        z = np.zeros(0, np.int64)
        return z, z
    iv = np.repeat(np.arange(left.size), npairs)
    start = np.concatenate([[0], np.cumsum(npairs)[:-1]])
    pidx = np.arange(total) - start[iv]
    kk = m[iv]
    s_off = np.floor(
        (2 * kk - 1 - np.sqrt((2 * kk - 1) ** 2 - 8 * pidx)) / 2
    ).astype(np.int64)
    before = s_off * (2 * kk - s_off - 1) // 2
    s_off[before > pidx] -= 1
    before = s_off * (2 * kk - s_off - 1) // 2
    t_off = pidx - before + s_off + 1
    return left[iv] + s_off, left[iv] + t_off


def _pairs_to_matchtable(esa: ESA, lo, hi, d) -> MatchTable:
    ms = esa.multiseq
    seq1, rel1 = ms.pos_to_pair(lo)
    seq2, rel2 = ms.pos_to_pair(hi)
    tot = lo.size
    return MatchTable(
        length1=d,
        position1=lo,
        length2=d.copy(),
        position2=hi,
        distance=np.zeros(tot, np.int64),
        flag=np.zeros(tot, np.int64),
        seqnum1=seq1,
        relpos1=rel1,
        seqnum2=seq2,
        relpos2=rel2,
        evalue=np.zeros(tot, np.float64),
        idnumber=np.zeros(tot, np.int64),
        transnum=np.full(tot, -1, np.int64),
    )


def find_maximal_pairs(esa: ESA, searchlength: int) -> MatchTable:
    """Enumerate all maximal repeated pairs of length >= searchlength."""
    L = max(searchlength, 1)
    left, right = _l_runs(esa.lcptab, L)
    if left.size == 0:
        return MatchTable()
    m = right - left + 1
    rmq = LcpRmq(esa.lcptab)
    keys = _diverse_keys(esa)
    suf = esa.suftab

    out: list[MatchTable] = []
    for lchunk, mchunk in _iter_pair_chunks(left, m):
        i_rank, j_rank = _expand_pairs(lchunk, mchunk)
        diverse = keys[i_rank] != keys[j_rank]
        i_rank, j_rank = i_rank[diverse], j_rank[diverse]
        if i_rank.size == 0:
            continue
        d = rmq.query(i_rank + 1, j_rank).astype(np.int64)
        p1 = suf[i_rank].astype(np.int64)
        p2 = suf[j_rank].astype(np.int64)
        out.append(_pairs_to_matchtable(
            esa, np.minimum(p1, p2), np.maximum(p1, p2), d
        ))
    return MatchTable.concat(out)


def find_tandems(esa: ESA, searchlength: int) -> MatchTable:
    """Branching tandem repeats (reference src/Vmengine/ftandem.c).

    Characterization (equivalent to the reference's per-interval
    doubled-string search, ftandem.c:98-252): position p starts a
    branching tandem ww with |w| = d  iff  lce(p, p+d) == d exactly
    and d >= searchlength — the exact-lce condition simultaneously
    gives text[p..p+d-1] == text[p+d..p+2d-1] and the branching
    requirement text[p] != text[p+2d] (or text end / special).
    Emitted as (pos1=p, pos2=p+d, length=d) per OUTTANDEM
    (ftandem.c:30-39)."""
    L = max(searchlength, 1)
    left, right = _l_runs(esa.lcptab, L)
    if left.size == 0:
        return MatchTable()
    m = right - left + 1
    rmq = LcpRmq(esa.lcptab)
    suf = esa.suftab

    out: list[MatchTable] = []
    for lchunk, mchunk in _iter_pair_chunks(left, m):
        i_rank, j_rank = _expand_pairs(lchunk, mchunk)
        if i_rank.size == 0:
            continue
        p1 = suf[i_rank].astype(np.int64)
        p2 = suf[j_rank].astype(np.int64)
        lo = np.minimum(p1, p2)
        hi = np.maximum(p1, p2)
        # cheap prefilter: gap == some d in [L, run-local max] requires
        # gap >= L; exact check needs lce
        gap = hi - lo
        cand = gap >= L
        if not cand.any():
            continue
        i_rank, j_rank = i_rank[cand], j_rank[cand]
        lo, hi, gap = lo[cand], hi[cand], gap[cand]
        d = rmq.query(i_rank + 1, j_rank).astype(np.int64)
        tandem = d == gap
        if not tandem.any():
            continue
        lo, hi, d = lo[tandem], hi[tandem], d[tandem]
        out.append(_pairs_to_matchtable(esa, lo, lo + d, d))
    return MatchTable.concat(out)
