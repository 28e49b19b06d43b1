/* Native query-substring scan: the reference's speedup-2 (and 0)
   state machine replayed instruction-for-instruction
   (kurtz/matchsub.c:165-236,353-539 matchquerysubstring0/2,
   kurtz/findmaxpref.gen FINDMAXPREFIXLEN, Vmengine/fquery.c:139-269
   leftrightsubmatch).  This is the O(1)-amortized-per-position
   sequential algorithm; the vectorized numpy implementation in
   engine/query.py is the portable oracle, this module is the
   speed-of-light host path feeding the TPU extension kernels.

   Matches are appended as (length, dbpos, qoff) triples; the caller
   passes a capacity and retries with a larger buffer when the
   returned count exceeds it. */

#include <stdint.h>
#include <stddef.h>

#define WILDCARD 254u
#define ISSPECIAL(C) ((unsigned)(C) >= WILDCARD)

typedef struct {
    const uint8_t *text;
    int64_t n;
    const int32_t *suftab;   /* n+1 entries */
    const int32_t *lcp;      /* n+1 entries */
    const uint8_t *sti1;     /* n+1 entries */
    const uint32_t *bck;     /* 2*numofcodes */
    int64_t numofchars;
    int64_t prefixlength;
} Index;

/* COMPARE (maxpref.c:30-66): sign(query - suffix); equal specials and
   running past the sentinel compare as -1, query exhaustion as 0.
   lcplen advances to the divergence point. */
static int64_t cmp_suffix(const Index *ix, int64_t sufstart,
                          const uint8_t *q, int64_t querylen,
                          int64_t *lcplen)
{
    int64_t l = *lcplen;
    for (;;) {
        if (l >= querylen) { *lcplen = l; return 0; }
        if (sufstart + l >= ix->n) { *lcplen = l; return -1; }
        {
            unsigned qc = q[l], sc = ix->text[sufstart + l];
            if (qc == sc) {
                if (ISSPECIAL(sc)) { *lcplen = l; return -1; }
                l++;
                continue;
            }
            *lcplen = l;
            return (int64_t)qc - (int64_t)sc;
        }
    }
}

/* FINDMAXPREFIXLEN (findmaxpref.gen) replayed probe-for-probe. */
static void findmaxprefixlen(const Index *ix, int64_t left,
                             int64_t right, int64_t offset,
                             const uint8_t *q, int64_t querylen,
                             int64_t *wit0, int64_t *wit1)
{
    int64_t lcplen = offset, lpref, rpref, mid, ret;

    ret = cmp_suffix(ix, ix->suftab[left], q, querylen, &lcplen);
    *wit0 = lcplen;
    *wit1 = left;
    if (ret <= 0) return;
    lpref = lcplen;
    lcplen = offset;
    ret = cmp_suffix(ix, ix->suftab[right], q, querylen, &lcplen);
    rpref = lcplen;
    if (lpref < rpref) { *wit0 = rpref; *wit1 = right; lcplen = lpref; }
    else               { *wit0 = lpref; *wit1 = left; }
    if (ret >= 0 || *wit0 >= querylen) return;
    while (right > left + 1) {
        mid = (left + right) / 2;
        ret = cmp_suffix(ix, ix->suftab[mid], q, querylen, &lcplen);
        if (*wit0 < lcplen) { *wit0 = lcplen; *wit1 = mid; }
        if (ret < 0) {
            rpref = lcplen;
            if (lpref < rpref) lcplen = lpref;
            right = mid;
        } else if (ret > 0) {
            lpref = lcplen;
            if (rpref < lpref) lcplen = rpref;
            left = mid;
        } else break;
    }
}

static int64_t scanleft(const Index *ix, int64_t offset, int64_t i)
{
    int64_t s;
    for (s = i; s > 0; s--)
        if ((int64_t)ix->lcp[s] < offset) break;
    return s;
}

static int64_t scanright(const Index *ix, int64_t offset, int64_t i)
{
    int64_t s;
    for (s = i + 1; s <= ix->n; s++)
        if ((int64_t)ix->lcp[s] < offset) break;
    return s - 1;
}

/* leftrightsubmatch (fquery.c:139-269) with the full-precision lcp
   table (both reference branches collapse to this) + PROCESSSUFFIX
   left-maximality filter; emits (minprefix, sufstart, qoff). */
static int64_t emit_run(const Index *ix, int64_t maxlcp,
                        int64_t witness, unsigned leftchar,
                        int64_t left, int64_t right,
                        int64_t searchlength,
                        int64_t qoff,
                        int64_t *out, int64_t cap, int64_t cnt)
{
    int64_t idx, minprefix, lcpval, sufstart;

    minprefix = maxlcp;
    for (idx = witness; ; idx--) {
        sufstart = ix->suftab[idx];
        if (sufstart == 0 || ISSPECIAL(leftchar) ||
            (unsigned)leftchar != ix->text[sufstart - 1]) {
            if (cnt + 3 <= cap) {
                out[cnt] = minprefix;
                out[cnt + 1] = sufstart;
                out[cnt + 2] = qoff;
            }
            cnt += 3;
        }
        if (idx == left) break;
        lcpval = ix->lcp[idx];
        if (lcpval < searchlength) break;
        if (minprefix > lcpval) minprefix = lcpval;
    }
    minprefix = maxlcp;
    for (idx = witness + 1; ; idx++) {
        if (idx > right) break;
        lcpval = ix->lcp[idx];
        if (lcpval < searchlength) break;
        if (minprefix > lcpval) minprefix = lcpval;
        sufstart = ix->suftab[idx];
        if (sufstart == 0 || ISSPECIAL(leftchar) ||
            (unsigned)leftchar != ix->text[sufstart - 1]) {
            if (cnt + 3 <= cap) {
                out[cnt] = minprefix;
                out[cnt + 1] = sufstart;
                out[cnt + 2] = qoff;
            }
            cnt += 3;
        }
    }
    return cnt;
}

static int code_of(const Index *ix, const uint8_t *w, int64_t *code)
{
    int64_t c = 0, j;
    for (j = 0; j < ix->prefixlength; j++) {
        if (w[j] >= ix->numofchars) return 0;
        c = c * ix->numofchars + w[j];
    }
    *code = c;
    return 1;
}

/* matchquerysubstring2 / matchquerysubstring0 over ONE query
   sequence.  qspeedup: 0 or 2.  Returns the total number of int64
   slots needed (3 per match); only the first `cap` slots are
   written. */
int64_t query_substring_scan(
    const uint8_t *text, int64_t n,
    const int32_t *suftab, const int32_t *lcp,
    const uint8_t *sti1, const uint32_t *bck,
    int64_t numofchars, int64_t prefixlength,
    const uint8_t *qseq, int64_t qseqlen,
    int64_t searchlength, int64_t qspeedup,
    int64_t *out, int64_t cap)
{
    Index ix;
    int64_t cnt = 0, qoff, remaining, code = 0;
    int codeokay;
    int64_t voff = 0, vleft = 0, vright = 0; /* vnode state */
    int64_t wit0 = 0, wit1 = 0;
    unsigned bchar;

    ix.text = text; ix.n = n; ix.suftab = suftab; ix.lcp = lcp;
    ix.sti1 = sti1; ix.bck = bck; ix.numofchars = numofchars;
    ix.prefixlength = prefixlength;

    if (qseqlen < searchlength) return 0;

    for (qoff = 0, remaining = qseqlen; remaining >= searchlength;
         qoff++, remaining--) {
        const uint8_t *qgram = qseq + qoff;
        bchar = (qoff == 0) ? 255u : qseq[qoff - 1];
        codeokay = code_of(&ix, qgram, &code);
        if (!codeokay) { voff = 0; continue; }
        {
            int64_t bl = bck[2 * code], br = bck[2 * code + 1];
            int proceed = 0;
            if (qspeedup == 0) {
                if (br > bl) {
                    vleft = bl; vright = br - 1;
                    voff = prefixlength;
                    findmaxprefixlen(&ix, vleft, vright, voff,
                                     qgram, remaining, &wit0, &wit1);
                    if (wit0 >= searchlength)
                        cnt = emit_run(&ix, wit0, wit1, bchar,
                                       vleft, vright, searchlength,
                                       qoff, out, cap, cnt);
                }
                continue;
            }
            /* speedup 2 (matchsub.c:353-539) */
            if (voff <= prefixlength ||
                sti1[suftab[vright] + 1] == 255u) {
                if (br > bl) {
                    vright = br - 1;
                    vleft = bl;
                    voff = prefixlength;
                    findmaxprefixlen(&ix, vleft, vright, voff,
                                     qgram, remaining, &wit0, &wit1);
                    if (wit0 > voff) {
                        voff = wit0;
                        vleft = scanleft(&ix, voff, wit1);
                        vright = scanright(&ix, voff, wit1);
                    }
                    proceed = (wit0 >= searchlength);
                } else {
                    voff = 0; wit0 = 0;
                    proceed = 0;
                }
            } else {
                int64_t rankval2 = sti1[suftab[vright] + 1];
                int64_t rankleft, rankright;
                voff--;
                rankleft = scanleft(&ix, voff,
                                    bl + sti1[suftab[vleft] + 1]);
                rankright = scanright(&ix, voff, bl + rankval2);
                if (rankright - rankleft == vright - vleft) {
                    vleft = rankleft;
                    vright = rankright;
                    wit0 = voff;
                    wit1 = bl + sti1[suftab[wit1] + 1];
                    proceed = (wit0 >= searchlength);
                } else {
                    vleft = rankleft;
                    vright = rankright;
                    findmaxprefixlen(&ix, vleft, vright, voff,
                                     qgram, remaining, &wit0, &wit1);
                    if (wit0 > voff) {
                        voff = wit0;
                        vleft = scanleft(&ix, voff, wit1);
                        vright = scanright(&ix, voff, wit1);
                    }
                    proceed = (wit0 >= searchlength);
                }
            }
            if (proceed)
                cnt = emit_run(&ix, wit0, wit1, bchar,
                               0, n - 1, searchlength,
                               qoff, out, cap, cnt);
        }
    }
    return cnt;
}
