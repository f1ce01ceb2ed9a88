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

// Global (Needleman-Wunsch) alignment with unit costs — edit-distance cigar.
// Replacement for edlib's NW task ('path'). Returns cigar entry count or -1/-2.
int nw_align(const char* q, int32_t qlen, const char* r, int32_t rlen,
             int64_t max_cells, int32_t* out_distance,
             char* out_cigar_ops, int32_t* out_cigar_lens, int32_t max_cigar) {
    if ((int64_t)(qlen + 1) * (int64_t)(rlen + 1) > max_cells) return -2;
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
