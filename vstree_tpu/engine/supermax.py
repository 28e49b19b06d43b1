"""Supermaximal repeats.

Reference algorithm (src/Vmengine/fsuper.c:61-165): one bottom-up pass
finds lcp-intervals whose children are all leaves ("alwaysontop") and
whose regular bwt characters are pairwise distinct; every suffix pair
of such an interval is a supermaximal repeat.

TPU-native design: an alwaysontop interval of depth d spanning ranks
[l..r] is exactly a maximal run of equal values d in the lcp array
(lcp[l+1..r] == d) that is a strict local maximum (lcp[l] < d,
lcp[r+1] < d) — so the whole enumeration is a vectorized run-detection
over lcp plus per-run distinctness counts (alphabet-sized histogram of
bwt per run), no stack, no traversal.  Emission order matches the
reference's DFS completion order: alwaysontop nodes complete in order
of their right boundary.
"""

from __future__ import annotations

import numpy as np

from ..core.chardef import WILDCARD
from ..index.esa import ESA
from .match import MatchTable


def supermax_intervals(
    esa: ESA, searchlength: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(left, right, depth) arrays of supermaximal lcp-intervals with
    depth >= searchlength, ordered by right boundary (DFS completion
    order)."""
    lcp = esa.lcptab
    n1 = lcp.size  # n + 1
    # run starts: positions i in [1, n] where lcp[i] != lcp[i-1]
    d = lcp
    change = np.empty(n1, bool)
    change[0] = True
    change[1:] = d[1:] != d[:-1]
    run_start = np.flatnonzero(change)            # start index of each run
    run_val = d[run_start]
    run_end = np.empty(run_start.size, np.int64)  # inclusive end
    run_end[:-1] = run_start[1:] - 1
    run_end[-1] = n1 - 1
    # local maximum: value > previous run's value and > next run's value
    prev_val = np.empty(run_start.size, np.int64)
    prev_val[0] = -1
    prev_val[1:] = run_val[:-1]
    next_val = np.empty(run_start.size, np.int64)
    next_val[-1] = -1
    next_val[:-1] = run_val[1:]
    is_node = (run_val > prev_val) & (run_val > next_val) & (run_start > 0)
    keep = is_node & (run_val >= max(searchlength, 1))
    # interval ranks [l..r]: run covers lcp indices [s..e] -> ranks
    # [s-1 .. e]
    left = run_start[keep] - 1
    right = run_end[keep]
    depth = run_val[keep]
    if left.size == 0:
        return left, right, depth.astype(np.int64)

    # distinctness of regular bwt chars per interval: for each regular
    # char c, the count of c within [l..r] must be <= 1 (specials and
    # the rank of suffix 0 are position-unique; fsuper.c:75-101)
    bwt = esa.bwttab
    numofchars = esa.alpha.num_regular
    # supermax intervals are disjoint (they are lcp runs), so a simple
    # open-marker cumsum assigns each rank its (candidate) interval
    iv_id = np.zeros(n1, np.int64)
    iv_id[left] = 1
    iv_id = np.cumsum(iv_id) - 1
    pos = np.arange(n1)
    member = (iv_id >= 0) & (pos <= right[np.maximum(iv_id, 0)])

    ok = np.ones(left.size, bool)
    ranks = np.flatnonzero(member)
    ivs = iv_id[ranks]
    chars = bwt[ranks]
    regular = chars < WILDCARD
    # suffix 0 (rank == longest) has UNDEFBWTCHAR = 253 >= WILDCARD
    # -> excluded from distinctness automatically
    for c in range(numofchars):
        cnt = np.bincount(
            ivs[regular & (chars == c)], minlength=left.size
        )
        ok &= cnt <= 1
    return left[ok], right[ok], depth[ok].astype(np.int64)


def find_supermax(
    esa: ESA, searchlength: int, mesh=None
) -> MatchTable:
    """All supermaximal repeat pairs, reference emission order
    (fsuper.c:105-124: per interval, pairs (s, t) with s < t in rank
    order; positions swapped so position1 < position2, fself.c:23-32).

    With ``mesh`` the interval detection runs as the rank-sharded scan
    program (parallel/shardesa.py) — identical output."""
    if mesh is not None:
        from ..parallel.shardesa import supermax_intervals_sharded

        left, right, depth = supermax_intervals_sharded(
            esa, searchlength, mesh)
    else:
        left, right, depth = supermax_intervals(esa, searchlength)
    k = right - left + 1
    npairs = (k * (k - 1)) // 2
    total = int(npairs.sum())
    if total == 0:
        return MatchTable()
    suf = esa.suftab

    # expand pairs: for interval iv with ranks l..r, pairs in order
    # (s=l..r-1, t=s+1..r)
    iv_of_pair = np.repeat(np.arange(left.size), npairs)
    start = np.concatenate([[0], np.cumsum(npairs)[:-1]])
    pidx = np.arange(total) - start[iv_of_pair]  # pair index within interval
    kk = k[iv_of_pair]
    # map pidx -> (s_off, t_off) in lexicographic order
    # s_off = smallest s with pidx < cum pairs; use the triangular formula
    # pairs before s_off rows: s_off*(2k - s_off - 1)/2
    s_off = np.floor(
        (2 * kk - 1 - np.sqrt((2 * kk - 1) ** 2 - 8 * pidx)) / 2
    ).astype(np.int64)
    # fix rounding
    before = s_off * (2 * kk - s_off - 1) // 2
    over = before > pidx
    s_off[over] -= 1
    before = s_off * (2 * kk - s_off - 1) // 2
    t_off = pidx - before + s_off + 1
    s_rank = left[iv_of_pair] + s_off
    t_rank = left[iv_of_pair] + t_off
    p1 = suf[s_rank].astype(np.int64)
    p2 = suf[t_rank].astype(np.int64)
    lo = np.minimum(p1, p2)
    hi = np.maximum(p1, p2)
    d = depth[iv_of_pair]

    ms = esa.multiseq
    seq1, rel1 = ms.pos_to_pair(lo)
    seq2, rel2 = ms.pos_to_pair(hi)
    return MatchTable(
        length1=d,
        position1=lo,
        length2=d.copy(),
        position2=hi,
        distance=np.zeros(total, np.int64),
        flag=np.zeros(total, np.int64),
        seqnum1=seq1,
        relpos1=rel1,
        seqnum2=seq2,
        relpos2=rel2,
        evalue=np.zeros(total, np.float64),
        idnumber=np.zeros(total, np.int64),
        transnum=np.full(total, -1, np.int64),
    )
