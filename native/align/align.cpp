// Host-side sequence alignment kernels for bonito_tpu.
//
// Replaces the roles of parasail (Smith-Waterman accuracy metric,
// reference call sites bonito/util.py:346-368, bonito/cli/evaluate.py:37-67)
// and edlib (global edit-distance cigar for duplex,
// bonito/cli/duplex.py:224-269) with a small self-contained C++ library.
//
// Exposed via ctypes; see bonito_tpu/alignment.py.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

inline int base_score(char a, char b, int match, int mismatch) {
    if (a == 'N' || b == 'N') return mismatch;
    return (a == b) ? match : mismatch;
}

// Pack a (reversed) traceback op stream into run-length cigar arrays.
int runlength(const std::vector<char>& ops_rev, char* out_ops, int32_t* out_lens, int max_cigar) {
    int n = 0;
    int i = (int)ops_rev.size() - 1;
    while (i >= 0) {
        char op = ops_rev[i];
        int len = 0;
        while (i >= 0 && ops_rev[i] == op) { ++len; --i; }
        if (n >= max_cigar) return -1;
        out_ops[n] = op;
        out_lens[n] = len;
        ++n;
    }
    return n;
}

}  // namespace

extern "C" {

// Local (Smith-Waterman) alignment with affine gaps and full traceback.
// Gap of length L costs open + (L-1) * extend (parasail convention).
//
// Returns cigar length (number of run-length entries), or -1 on cigar
// overflow, -2 if the DP matrix would exceed max_cells.
int sw_align(const char* q, int32_t qlen, const char* r, int32_t rlen,
             int32_t match, int32_t mismatch, int32_t open, int32_t extend,
             int64_t max_cells,
             int32_t* out_score,
             int32_t* out_beg_q, int32_t* out_end_q,
             int32_t* out_beg_r, int32_t* out_end_r,
             char* out_cigar_ops, int32_t* out_cigar_lens, int32_t max_cigar) {
    if ((int64_t)qlen * (int64_t)rlen > max_cells || qlen <= 0 || rlen <= 0) return -2;

    const int32_t NEG = -1000000000;
    const int64_t W = rlen + 1;
    std::vector<int32_t> H((qlen + 1) * W, 0), E((qlen + 1) * W, NEG), F((qlen + 1) * W, NEG);

    int best = 0, bi = 0, bj = 0;
    for (int i = 1; i <= qlen; ++i) {
        const int64_t row = (int64_t)i * W, prow = row - W;
        for (int j = 1; j <= rlen; ++j) {
            // E: gap in ref, consumes query (cigar 'I'); comes from above.
            int32_t e = std::max(H[prow + j] - open, E[prow + j] - extend);
            // F: gap in query, consumes ref (cigar 'D'); comes from the left.
            int32_t f = std::max(H[row + j - 1] - open, F[row + j - 1] - extend);
            int32_t d = H[prow + j - 1] + base_score(q[i - 1], r[j - 1], match, mismatch);
            int32_t h = std::max({0, d, e, f});
            H[row + j] = h; E[row + j] = e; F[row + j] = f;
            if (h > best) { best = h; bi = i; bj = j; }
        }
    }

    // Three-state traceback (0 = H, 1 = E, 2 = F), recomputing which
    // predecessor produced each cell value.
    std::vector<char> ops;
    int i = bi, j = bj, state = 0;
    while (i > 0 && j > 0) {
        const int64_t c = (int64_t)i * W + j;
        if (state == 0) {
            int32_t h = H[c];
            if (h == 0) break;
            if (h == H[c - W - 1] + base_score(q[i - 1], r[j - 1], match, mismatch)) {
                ops.push_back(base_score(q[i - 1], r[j - 1], 1, -1) > 0 ? '=' : 'X');
                --i; --j;
            } else if (h == E[c]) {
                state = 1;
            } else {
                state = 2;
            }
        } else if (state == 1) {
            ops.push_back('I');
            // decide before moving: did this gap open here or extend?
            bool opened = (E[c] == H[c - W] - open);
            --i;
            if (opened) state = 0;
        } else {
            ops.push_back('D');
            bool opened = (F[c] == H[c - 1] - open);
            --j;
            if (opened) state = 0;
        }
    }

    *out_score = best;
    *out_beg_q = i; *out_end_q = bi;
    *out_beg_r = j; *out_end_r = bj;
    return runlength(ops, out_cigar_ops, out_cigar_lens, max_cigar);
}

}  // extern "C"

namespace {

// Banded (Ukkonen) unit-cost global alignment attempt with band radius k.
// Band is over diagonals d = j - i in [lo, hi]. Returns true (and fills
// distance/ops) iff the optimal distance is provably <= k (band wide
// enough); 2-bit traceback ops keep memory at 1/4 byte per cell with
// int32 rolling DP rows.
bool nw_banded_try(const char* q, int32_t qlen, const char* r, int32_t rlen,
                   int32_t k, int32_t* out_distance, std::vector<char>& ops_rev) {
    const int32_t INF = 1 << 29;
    const int32_t lo = std::min(0, rlen - qlen) - k;
    const int32_t hi = std::max(0, rlen - qlen) + k;
    const int64_t Wb = (int64_t)hi - lo + 1;

    // one op byte per cell: 0 = diagonal (sub/match), 1 = up (I, consume
    // q), 2 = left (D, consume r)
    std::vector<uint8_t> tb((size_t)(qlen + 1) * Wb);

    // DP rows padded with one INF sentinel at [Wb] for the prev[b+1] read
    std::vector<int32_t> prev(Wb + 1, INF), cur(Wb + 1, INF);
    {
        uint8_t* trow = tb.data();
        for (int32_t j = std::max(0, lo); j <= std::min(rlen, hi); ++j) {
            prev[j - lo] = j;        // row 0: D[0][j] = j
            trow[j - lo] = 2;
        }
    }
    for (int32_t i = 1; i <= qlen; ++i) {
        const int32_t jmin = std::max(0, i + lo);
        const int32_t jmax = std::min(rlen, i + hi);
        if (jmin > jmax) return false;
        uint8_t* trow = tb.data() + (size_t)i * Wb;
        const char qc = q[i - 1];
        int32_t left = INF;
        int32_t j = jmin;
        if (j == 0) {                // leading column: all insertions
            const int64_t b0 = (int64_t)-i - lo;
            cur[b0] = left = i;
            trow[b0] = 1;
            j = 1;
        }
        const int64_t boff = (int64_t)-i - lo;  // b = j + boff
        for (; j <= jmax; ++j) {
            const int64_t b = j + boff;
            int32_t best = prev[b] + (qc == r[j - 1] ? 0 : 1);  // sub
            int32_t op = 0;
            const int32_t ins = prev[b + 1] + 1;  // consume q
            if (ins < best) { best = ins; op = 1; }
            const int32_t del = left + 1;         // consume r
            if (del < best) { best = del; op = 2; }
            cur[b] = left = best;
            trow[b] = (uint8_t)op;
        }
        // stale-cell guards: the next row can read at most one cell below
        // this row's written range (its own writes cover the rest; [Wb]
        // stays INF as the pad)
        const int64_t bmin = jmin + boff;
        if (bmin > 0) cur[bmin - 1] = INF;
        const int64_t bmax = jmax + boff;
        if (bmax + 1 < Wb) cur[bmax + 1] = INF;
        std::swap(prev, cur);
    }
    const int64_t bend = (int64_t)rlen - qlen - lo;
    if (bend < 0 || bend >= Wb) return false;
    const int32_t dist = prev[bend];
    if (dist > k) return false;      // band may have clipped an optimum
    *out_distance = dist;

    ops_rev.clear();
    int32_t i = qlen, j = rlen;
    while (i > 0 || j > 0) {
        const int64_t b = (int64_t)j - i - lo;
        const int op = tb[(size_t)i * Wb + b];
        if (op == 0) {
            ops_rev.push_back(q[i - 1] == r[j - 1] ? '=' : 'X'); --i; --j;
        } else if (op == 1) {
            ops_rev.push_back('I'); --i;
        } else {
            ops_rev.push_back('D'); --j;
        }
    }
    return true;
}

// Landau–Vishkin k-differences alignment: L[e][d] = furthest q-row
// reachable on diagonal d (= j - i) with exactly e errors, with free
// "snake" extensions along matching characters. Expected work
// O(n + dist^2) — the banded DP's O(n * dist) collapses because matches
// cost nothing. Exact unit-cost (Levenshtein) distance.
// Returns true and fills distance/ops when dist <= max_e.
bool lv_align_try(const char* q, int32_t qlen, const char* r, int32_t rlen,
                  int32_t max_e, int32_t* out_distance,
                  std::vector<char>& ops_rev) {
    const int32_t dend = rlen - qlen;
    if (std::abs(dend) > max_e) return false;
    const int32_t NEGI = INT32_MIN / 2;

    auto snake = [&](int32_t i, int32_t d) {
        const int32_t lim = std::min(qlen, rlen - d);
        while (i < lim && q[i] == r[i + d]) ++i;
        return i;
    };

    // layer e holds diagonals d in [-e, e]: flat triangular storage,
    // layer offset e^2, index d + e
    std::vector<int32_t> L;
    L.reserve((size_t)(std::min(max_e, 1024) + 1) *
              (std::min(max_e, 1024) + 1));

    int32_t D = -1;
    for (int32_t e = 0; e <= max_e; ++e) {
        L.resize((size_t)(e + 1) * (e + 1), NEGI);
        int32_t* layer = L.data() + (size_t)e * e;
        const int32_t* prev = e ? L.data() + (size_t)(e - 1) * (e - 1)
                                : nullptr;
        for (int32_t d = -e; d <= e; ++d) {
            const int32_t lim = std::min(qlen, rlen - d);
            if (lim < 0) { layer[d + e] = NEGI; continue; }
            int32_t best;
            if (e == 0) {
                best = 0;
            } else {
                // candidates must be *real* positions (<= lim) so the
                // traceback only ever emits valid consuming ops; the
                // carry candidate (same position, one wasted error)
                // keeps L monotone in e at diagonal ends
                best = NEGI;
                if (d >= -(e - 1) && d <= e - 1) {
                    const int32_t v = prev[d + e - 1];
                    if (v != NEGI) {
                        if (v > best) best = v;               // carry
                        if (v + 1 <= lim && v + 1 > best) best = v + 1;  // sub
                    }
                }
                // insertion (consume q): from diagonal d+1
                if (d + 1 >= -(e - 1) && d + 1 <= e - 1) {
                    const int32_t v = prev[d + 1 + e - 1];
                    if (v != NEGI && v + 1 <= lim && v + 1 > best)
                        best = v + 1;
                }
                // deletion (consume r): from diagonal d-1
                if (d - 1 >= -(e - 1) && d - 1 <= e - 1) {
                    const int32_t v = prev[d - 1 + e - 1];
                    if (v != NEGI && v <= lim && v > best) best = v;
                }
                if (best == NEGI || best < 0) { layer[d + e] = NEGI; continue; }
            }
            layer[d + e] = snake(best, d);
        }
        if (dend >= -e && dend <= e && layer[dend + e] != NEGI &&
            layer[dend + e] >= qlen) { D = e; break; }
    }
    if (D < 0) return false;
    *out_distance = D;

    // traceback through the stored layers (same candidate validity rules
    // as the forward pass; carry steps emit no op)
    ops_rev.clear();
    int32_t e = D, d = dend, i = L[(size_t)e * e + (d + e)];
    while (e > 0) {
        const int32_t* prev = L.data() + (size_t)(e - 1) * (e - 1);
        const int32_t lim = std::min(qlen, rlen - d);
        int32_t cand_same = (d >= -(e - 1) && d <= e - 1)
                                ? prev[d + e - 1] : NEGI;
        int32_t cand_ins = (d + 1 >= -(e - 1) && d + 1 <= e - 1)
                               ? prev[d + 1 + e - 1] : NEGI;
        int32_t cand_del = (d - 1 >= -(e - 1) && d - 1 <= e - 1)
                               ? prev[d - 1 + e - 1] : NEGI;
        const int32_t start_carry = cand_same;
        const int32_t start_sub =
            (cand_same != NEGI && cand_same + 1 <= lim) ? cand_same + 1 : NEGI;
        const int32_t start_ins =
            (cand_ins != NEGI && cand_ins + 1 <= lim) ? cand_ins + 1 : NEGI;
        const int32_t start_del =
            (cand_del != NEGI && cand_del <= lim) ? cand_del : NEGI;
        const int32_t start = std::max(
            std::max(start_carry, start_sub), std::max(start_ins, start_del));
        for (int32_t s = i; s > start; --s) ops_rev.push_back('=');
        if (start == start_sub) {
            ops_rev.push_back('X');
            i = cand_same; --e;                  // same diagonal
        } else if (start == start_ins) {
            ops_rev.push_back('I');
            i = cand_ins; d = d + 1; --e;        // came from diagonal d+1
        } else if (start == start_del) {
            ops_rev.push_back('D');
            i = cand_del; d = d - 1; --e;        // came from diagonal d-1
        } else {
            i = cand_same; --e;                  // carry: wasted error, no op
        }
    }
    for (int32_t s = i; s > 0; --s) ops_rev.push_back('=');
    return true;
}

} // namespace

extern "C" {

// Global (Needleman-Wunsch) alignment with unit costs — edit-distance cigar.
// Replacement for edlib's NW task ('path'). Returns cigar entry count or -1/-2.
//
// Fast path: banded Ukkonen with doubling band radius (exact — the band
// result is accepted only when distance <= radius). Similar sequences
// (duplex strands) cost O(len * dist) instead of O(len^2).
int nw_align(const char* q, int32_t qlen, const char* r, int32_t rlen,
             int64_t max_cells, int32_t* out_distance,
             char* out_cigar_ops, int32_t* out_cigar_lens, int32_t max_cigar) {
    const int64_t full_cells = (int64_t)(qlen + 1) * (int64_t)(rlen + 1);
    std::vector<char> ops_rev;

    // Landau-Vishkin first: O(n + dist^2) for similar sequences (the
    // duplex case). Memory is dist^2 ints, so cap the distance it will
    // chase before falling back to the banded / full DP.
    {
        int32_t max_e = 4096;
        while ((int64_t)max_e * max_e > max_cells && max_e > 64) max_e /= 2;
        max_e = std::min(max_e, qlen + rlen);
        int32_t dist;
        if (lv_align_try(q, qlen, r, rlen, max_e, &dist, ops_rev)) {
            *out_distance = dist;
            return runlength(ops_rev, out_cigar_ops, out_cigar_lens,
                             max_cigar);
        }
    }

    int32_t k = std::max(16, std::abs(qlen - rlen));
    while (true) {
        const int64_t band_cells =
            (int64_t)(qlen + 1) *
            ((int64_t)std::max(0, rlen - qlen) - std::min(0, rlen - qlen) +
             2 * (int64_t)k + 1);
        if (band_cells >= full_cells || k >= qlen + rlen + 1) break;
        if (band_cells > max_cells) return -2;
        if (nw_banded_try(q, qlen, r, rlen, k, out_distance, ops_rev))
            return runlength(ops_rev, out_cigar_ops, out_cigar_lens, max_cigar);
        k *= 2;
    }

    // full DP fallback (dissimilar sequences)
    if (full_cells > max_cells) return -2;
    const int64_t W = rlen + 1;
    std::vector<int32_t> D((qlen + 1) * W);
    for (int j = 0; j <= rlen; ++j) D[j] = j;
    for (int i = 1; i <= qlen; ++i) {
        D[i * W] = i;
        const int64_t row = (int64_t)i * W, prow = row - W;
        for (int j = 1; j <= rlen; ++j) {
            int32_t sub = D[prow + j - 1] + (q[i - 1] == r[j - 1] ? 0 : 1);
            int32_t ins = D[prow + j] + 1;
            int32_t del = D[row + j - 1] + 1;
            D[row + j] = std::min({sub, ins, del});
        }
    }
    std::vector<char> ops;
    int i = qlen, j = rlen;
    while (i > 0 || j > 0) {
        const int64_t c = (int64_t)i * W + j;
        if (i > 0 && j > 0 && D[c] == D[c - W - 1] + (q[i - 1] == r[j - 1] ? 0 : 1)) {
            ops.push_back(q[i - 1] == r[j - 1] ? '=' : 'X'); --i; --j;
        } else if (i > 0 && D[c] == D[c - W] + 1) {
            ops.push_back('I'); --i;
        } else {
            ops.push_back('D'); --j;
        }
    }
    *out_distance = D[(int64_t)qlen * W + rlen];
    return runlength(ops, out_cigar_ops, out_cigar_lens, max_cigar);
}

}  // extern "C"
