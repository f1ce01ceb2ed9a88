// minimap-lite: minimizer index + anchor chaining + banded affine-gap
// alignment. Host-side replacement for the reference's mappy/minimap2
// dependency (bonito/aligner.py) — same role: map basecalled reads to a
// reference, produce cigar/NM/MD, query bounds, strand and mapq.
//
// Algorithm (minimap2-style, independently implemented):
//   * index: (k,w) minimizers of the concatenated reference,
//     hash -> position list (canonical k-mers)
//   * map: query minimizers -> anchors per strand
//   * chain: DP over ref-sorted anchors with bounded lookback + gap cost
//   * extend: banded global alignment over the chained span, affine gaps,
//     =/X/I/D cigar, NM and MD computed from the alignment
//
// C ABI for ctypes. The index is immutable after build; mapping is
// thread-safe (no shared mutable state).

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Index {
    int k = 15, w = 10;
    std::vector<int64_t> starts;  // start of each contig in concat
    std::string seq;              // concatenated reference (uppercase)
    std::unordered_map<uint64_t, std::vector<int64_t>> table;
    int max_occ = 200;            // skip ultra-repetitive minimizers
};

inline int base2code(char c) {
    switch (c) {
        case 'A': return 0;
        case 'C': return 1;
        case 'G': return 2;
        case 'T': case 'U': return 3;
        default: return -1;
    }
}

inline uint64_t hash64(uint64_t key, uint64_t mask) {
    key = (~key + (key << 21)) & mask;
    key = key ^ (key >> 24);
    key = ((key + (key << 3)) + (key << 8)) & mask;
    key = key ^ (key >> 14);
    key = ((key + (key << 2)) + (key << 4)) & mask;
    key = key ^ (key >> 28);
    key = (key + (key << 31)) & mask;
    return key;
}

struct Mini {
    uint64_t h;
    int64_t pos;   // k-mer start
    int strand;    // 0: canonical == forward, 1: canonical == revcomp
};

void minimizers(const char* s, int64_t n, int k, int w, std::vector<Mini>& out) {
    if (n < k) return;
    const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
    uint64_t fwd = 0, rev = 0;
    int l = 0;
    std::vector<Mini> dq;  // monotonic deque (indices into itself)
    size_t head = 0;
    int64_t last_emitted = -1;

    for (int64_t i = 0; i < n; i++) {
        int c = base2code(s[i]);
        if (c < 0) { l = 0; fwd = rev = 0; continue; }
        fwd = ((fwd << 2) | (uint64_t)c) & mask;
        rev = (rev >> 2) | ((uint64_t)(3 - c) << (2 * (k - 1)));
        if (++l < k) continue;
        int64_t pos = i - k + 1;
        uint64_t key;
        int strand;
        if (fwd < rev) { key = fwd; strand = 0; }
        else if (rev < fwd) { key = rev; strand = 1; }
        else continue;
        Mini m{hash64(key, mask), pos, strand};
        while (dq.size() > head && dq.back().h >= m.h) dq.pop_back();
        dq.push_back(m);
        while (dq[head].pos <= pos - w) head++;
        if (head > 256) {  // reclaim the consumed front: O(w) live
            dq.erase(dq.begin(), dq.begin() + head);  // entries, not O(n)
            head = 0;
        }
        if (pos >= (int64_t)w - 1) {
            const Mini& best = dq[head];
            if (best.pos != last_emitted) {
                out.push_back(best);
                last_emitted = best.pos;
            }
        }
    }
}

struct Anchor {
    int64_t r, q;
};

struct Mapping {
    int32_t ctg_id = -1;
    int64_t r_st = 0, r_en = 0;
    int32_t q_st = 0, q_en = 0;
    int32_t strand = 1;
    int32_t mapq = 0;
    int32_t nm = 0;
    int32_t score = 0;
    std::string cigar;
    std::string md;
};

std::string revcomp(const std::string& s) {
    std::string r(s.rbegin(), s.rend());
    for (auto& c : r) {
        switch (c) {
            case 'A': c = 'T'; break; case 'T': c = 'A'; break;
            case 'C': c = 'G'; break; case 'G': c = 'C'; break;
            default: c = 'N'; break;
        }
    }
    return r;
}

struct AlnResult {
    int score = INT32_MIN;
    std::string ops;  // expanded =/X/I/D op string
    int j_start = 0;  // first consumed ref position
    int j_end = 0;    // one past last consumed ref position
};

// Banded glocal alignment, affine gaps: the query aligns end-to-end, the
// reference window is free (unpenalised) at both ends. I consumes query,
// D consumes ref.
AlnResult banded_align(const std::string& q, const std::string& r, int band,
                       int match = 2, int mismatch = -4, int gap_open = 4,
                       int gap_extend = 2) {
    const int n = (int)q.size(), m = (int)r.size();
    AlnResult res;
    if (n == 0 || m == 0) return res;
    band = std::max(band, std::abs(n - m) + 16);
    band = std::min(band, std::max(n, m));
    if ((int64_t)(n + 1) * (2 * band + 1) > (int64_t)1 << 31) return res;
    const int W = 2 * band + 1;
    const int32_t NEG = INT32_MIN / 4;

    std::vector<int32_t> H(W, NEG), E(W, NEG), Hp(W, NEG), Ep(W, NEG);
    std::vector<uint8_t> bt((size_t)(n + 1) * W, 255);

    for (int d = 0; d < W; d++) {  // row i=0: free leading ref skip
        int j = d - band;
        if (j >= 0 && j <= m) Hp[d] = 0;
    }
    for (int i = 1; i <= n; i++) {
        int32_t f = NEG;
        std::fill(H.begin(), H.end(), NEG);
        std::fill(E.begin(), E.end(), NEG);
        for (int d = 0; d < W; d++) {
            int j = i + d - band;
            if (j < 0 || j > m) { f = NEG; continue; }
            // E: insertion (consume query), from (i-1, j) = prev row d+1
            int32_t e = NEG;
            bool e_ext = false;
            if (d + 1 < W) {
                if (Hp[d + 1] > NEG / 2)
                    e = Hp[d + 1] - gap_open - gap_extend;
                if (Ep[d + 1] > NEG / 2 && Ep[d + 1] - gap_extend > e) {
                    e = Ep[d + 1] - gap_extend;
                    e_ext = true;
                }
            }
            // F: deletion (consume ref), from (i, j-1) = same row d-1
            int32_t fnew = NEG;
            bool f_ext = false;
            if (d > 0) {
                if (H[d - 1] > NEG / 2) fnew = H[d - 1] - gap_open - gap_extend;
                if (f > NEG / 2 && f - gap_extend > fnew) {
                    fnew = f - gap_extend;
                    f_ext = true;
                }
            }
            f = fnew;
            // diag from (i-1, j-1) = prev row d
            int32_t h = NEG;
            uint8_t dir = 3;
            if (j > 0 && Hp[d] > NEG / 2) {
                h = Hp[d] + ((q[i - 1] == r[j - 1]) ? match : mismatch);
                dir = 0;
            }
            if (e > h) { h = e; dir = 1; }
            if (f > h) { h = f; dir = 2; }
            H[d] = h;
            E[d] = e;
            // packed traceback: bits 0-1 = H source (0 diag, 1 E, 2 F,
            // 3 none), bit 2 = E extends, bit 3 = F extends. An H-only
            // traceback lost the gap-extension state and emitted
            // measurably suboptimal cigars (round-5 review: ~4% of
            // random cases rescored below the DP optimum)
            bt[(size_t)i * W + d] =
                dir | (e_ext ? 4 : 0) | (f_ext ? 8 : 0);
        }
        std::swap(H, Hp);
        std::swap(E, Ep);
    }
    // free trailing ref skip: best cell anywhere in the last row
    int dbest = -1;
    int32_t best = NEG;
    for (int d = 0; d < W; d++) {
        int j = n + d - band;
        if (j < 0 || j > m) continue;
        if (Hp[d] > best) { best = Hp[d]; dbest = d; }
    }
    if (dbest < 0 || best < NEG / 2) return res;
    res.score = best;
    res.j_end = n + dbest - band;

    std::string ops;
    int i = n, d = dbest;
    int state = 0;  // 0 = H, 1 = in E (gap run), 2 = in F (gap run)
    while (i > 0) {
        int j = i + d - band;
        uint8_t cell = bt[(size_t)i * W + d];
        if (state == 0) {
            uint8_t dir = cell & 3;
            if (dir == 0) {
                ops.push_back(q[i - 1] == r[j - 1] ? '=' : 'X');
                i--;
            } else if (dir == 1) state = 1;
            else if (dir == 2) state = 2;
            else break;  // unreachable/free start
        } else if (state == 1) {
            ops.push_back('I');
            state = (cell & 4) ? 1 : 0;
            i--; d++;
        } else {
            ops.push_back('D');
            state = (cell & 8) ? 2 : 0;
            d--;
        }
    }
    res.j_start = i + d - band;
    std::reverse(ops.begin(), ops.end());
    res.ops = ops;
    return res;
}

// Trim the alignment ends to the maximal-scoring contiguous segment
// (Kadane over per-op scores, affine-ish gap costs). The glocal DP makes
// the query align end-to-end, so a chimeric junction or adapter tail
// drags the alignment through garbage (measured: a 2-segment chimera
// mapped with NM ~1150 across the junction); minimap2 soft-clips these.
// Returns the query/ref lengths trimmed at each end.
void trim_ops(std::string& ops, int& q_trim_l, int& q_trim_r,
              int& r_trim_l, int& r_trim_r,
              int match = 2, int mismatch = -4, int gap_open = 4,
              int gap_extend = 2) {
    q_trim_l = q_trim_r = r_trim_l = r_trim_r = 0;
    const int L = (int)ops.size();
    if (!L) return;
    long best = -1, cur = 0;
    int best_lo = 0, best_hi = L, cur_lo = 0;
    char prev = 0;
    for (int i = 0; i < L; i++) {
        char c = ops[i];
        long s;
        if (c == '=') s = match;
        else if (c == 'X') s = mismatch;
        else s = -(long)(gap_extend + (c != prev ? gap_open : 0));
        prev = c;
        cur += s;
        if (cur > best) { best = cur; best_lo = cur_lo; best_hi = i + 1; }
        if (cur < 0) { cur = 0; cur_lo = i + 1; prev = 0; }
    }
    if (best_lo == 0 && best_hi == L) return;
    // never trim to a stub: keep the full alignment if the best segment
    // is degenerate (the caller's min-quality gates handle junk maps)
    if (best_hi - best_lo < 30) return;
    for (int i = 0; i < best_lo; i++) {
        char c = ops[i];
        if (c == '=' || c == 'X') { q_trim_l++; r_trim_l++; }
        else if (c == 'I') q_trim_l++;
        else r_trim_l++;
    }
    for (int i = best_hi; i < L; i++) {
        char c = ops[i];
        if (c == '=' || c == 'X') { q_trim_r++; r_trim_r++; }
        else if (c == 'I') q_trim_r++;
        else r_trim_r++;
    }
    ops = ops.substr(best_lo, best_hi - best_lo);
}

void ops_to_cigar_nm_md(const std::string& ops, const std::string& ref,
                        std::string& cigar, int32_t& nm, std::string& md) {
    cigar.clear(); md.clear(); nm = 0;
    int run = 0; char prev = 0;
    int md_run = 0; bool in_del = false;
    int64_t ri = 0;
    for (char c : ops) {
        if (c == prev) run++;
        else { if (run) cigar += std::to_string(run) + prev; prev = c; run = 1; }
        switch (c) {
            case '=': md_run++; ri++; in_del = false; break;
            case 'X':
                md += std::to_string(md_run); md_run = 0;
                md += ref[ri]; nm++; ri++; in_del = false; break;
            case 'I': nm++; in_del = false; break;
            case 'D':
                if (!in_del) { md += std::to_string(md_run); md_run = 0;
                               md += '^'; in_del = true; }
                md += ref[ri]; nm++; ri++; break;
        }
    }
    if (run) cigar += std::to_string(run) + prev;
    md += std::to_string(md_run);
}

bool map_query(const Index& idx, const std::string& query_raw, Mapping& out) {
    const int k = idx.k, w = idx.w;
    std::string query_up = query_raw;
    for (auto& c : query_up) c = (char)toupper((unsigned char)c);
    if ((int64_t)query_up.size() < k) return false;

    int32_t best_s = 0, second_s = 0;
    std::vector<Anchor> best_chain;
    int best_strand = 0;

    for (int strand = 0; strand < 2; strand++) {
        std::string query = strand ? revcomp(query_up) : query_up;
        std::vector<Mini> qmini;
        minimizers(query.c_str(), query.size(), k, w, qmini);

        std::vector<Anchor> anchors;
        for (const auto& m : qmini) {
            auto it = idx.table.find(m.h);
            if (it == idx.table.end()) continue;
            const auto& hits = it->second;
            if ((int)hits.size() > idx.max_occ) continue;
            for (int64_t rp : hits) {
                if ((int)(rp & 1) == m.strand)
                    anchors.push_back({rp >> 1, m.pos});
            }
        }
        if (anchors.size() < 3) continue;
        std::sort(anchors.begin(), anchors.end(),
                  [](const Anchor& a, const Anchor& b) {
                      return a.r == b.r ? a.q < b.q : a.r < b.r;
                  });
        // contig id per anchor (r-sorted -> one sweeping pointer): the
        // chain DP must not link anchors across a contig junction (the
        // concatenated axis makes adjacent contigs look < MAX_GAP apart)
        std::vector<int32_t> actg(anchors.size());
        {
            size_t ci = 0;
            for (size_t a = 0; a < anchors.size(); a++) {
                while (ci + 1 < idx.starts.size()
                       && anchors[a].r >= idx.starts[ci + 1]) ci++;
                actg[a] = (int32_t)ci;
            }
        }

        const int LOOKBACK = 64;
        const int64_t MAX_GAP = 5000;
        int n = (int)anchors.size();
        std::vector<int32_t> score(n);
        std::vector<int32_t> parent(n, -1);
        int best_i = -1;
        int32_t local_best = 0;
        for (int i = 0; i < n; i++) {
            score[i] = k;
            for (int j = i - 1; j >= 0 && j >= i - LOOKBACK; j--) {
                if (actg[i] != actg[j]) continue;  // no cross-junction links
                int64_t dr = anchors[i].r - anchors[j].r;
                int64_t dq = anchors[i].q - anchors[j].q;
                if (dq <= 0 || dr <= 0 || dr > MAX_GAP || dq > MAX_GAP)
                    continue;
                int64_t gap = dr > dq ? dr - dq : dq - dr;
                int32_t gain = (int32_t)std::min<int64_t>(
                                   k, std::min(dr, dq))
                               - (int32_t)(gap > 0 ? 1 + gap / 50 : 0);
                if (score[j] + gain > score[i]) {
                    score[i] = score[j] + gain;
                    parent[i] = j;
                }
            }
            if (score[i] > local_best) { local_best = score[i]; best_i = i; }
        }
        // distinct same-strand runner-up: the best chain ending outside
        // the winning chain's reference neighbourhood. Without this a
        // read from a repeated segment scores two equal chains but only
        // the cross-strand best fed second_s, so mapq stayed high for
        // multi-mapping reads (minimap2 collapses it toward 0).
        int32_t local_second = 0;
        if (best_i >= 0) {
            int64_t rb_lo = INT64_MAX, rb_hi = INT64_MIN;
            for (int i = best_i; i >= 0; i = parent[i]) {
                rb_lo = std::min(rb_lo, anchors[i].r);
                rb_hi = std::max(rb_hi, anchors[i].r + k);
            }
            int64_t margin = (int64_t)query.size();
            for (int i = 0; i < n; i++) {
                if (anchors[i].r >= rb_lo - margin &&
                    anchors[i].r <= rb_hi + margin)
                    continue;
                if (score[i] > local_second) local_second = score[i];
            }
        }
        if (local_best > best_s) {
            second_s = std::max(best_s, local_second);
            best_s = local_best;
            best_strand = strand;
            best_chain.clear();
            for (int i = best_i; i >= 0; i = parent[i])
                best_chain.push_back(anchors[i]);
            std::reverse(best_chain.begin(), best_chain.end());
        } else if (local_best > second_s) {
            second_s = local_best;
        }
    }

    if (best_chain.empty()) return false;

    const std::string query =
        best_strand ? revcomp(query_up) : query_up;
    int64_t r_lo = best_chain.front().r;
    int64_t r_hi = best_chain.back().r + k;
    int64_t q_lo = best_chain.front().q;
    int64_t q_hi = best_chain.back().q + k;

    int ctg = (int)(std::upper_bound(idx.starts.begin(), idx.starts.end(), r_lo)
                    - idx.starts.begin()) - 1;
    int64_t ctg_start = idx.starts[ctg];
    int64_t ctg_end = (ctg + 1 < (int)idx.starts.size())
                      ? idx.starts[ctg + 1] : (int64_t)idx.seq.size();

    // pad the ref window so the full query can align globally
    int64_t pad_l = q_lo + 64, pad_r = (int64_t)query.size() - q_hi + 64;
    int64_t w_lo = std::max(ctg_start, r_lo - pad_l);
    int64_t w_hi = std::min(ctg_end, r_hi + pad_r);
    if (w_hi <= w_lo) return false;

    std::string ref_window = idx.seq.substr(w_lo, w_hi - w_lo);
    // the band must cover the chain's WINDOW-RELATIVE diagonals (j - i
    // for each anchor), not just a fixed 200: (a) balanced opposing
    // indels drift the diagonal far beyond 200 even though chaining
    // accepted them (MAX_GAP 5000); (b) when w_lo clamps at a contig
    // start the window's main diagonal is OFFSET from the chain's — a
    // chimera whose true segment started near a contig boundary aligned
    // entirely out-of-band as unclippable soup (round-5 review + the
    // chimera study's two residual failures)
    int64_t jm_lo = INT64_MAX, jm_hi = INT64_MIN;
    for (const auto& a : best_chain) {
        int64_t jm = (a.r - w_lo) - a.q;
        jm_lo = std::min(jm_lo, jm);
        jm_hi = std::max(jm_hi, jm);
    }
    int64_t need = std::max(std::abs(jm_lo), std::abs(jm_hi));
    int band = (int)std::min<int64_t>(
        4096, std::max<int64_t>(200, need + 64));
    AlnResult aln = banded_align(query, ref_window, band);
    if (aln.score == INT32_MIN || aln.ops.empty()) return false;

    // soft-clip junk ends (chimeric junctions, adapters): keep the
    // maximal-scoring segment, like minimap2's extension z-drop
    int qtl, qtr, rtl, rtr;
    trim_ops(aln.ops, qtl, qtr, rtl, rtr);
    aln.j_start += rtl;
    aln.j_end -= rtr;
    if (aln.ops.empty() || aln.j_end <= aln.j_start) return false;

    std::string ref_core = ref_window.substr(
        aln.j_start, aln.j_end - aln.j_start);
    ops_to_cigar_nm_md(aln.ops, ref_core, out.cigar, out.nm, out.md);

    out.ctg_id = ctg;
    out.strand = best_strand ? -1 : 1;
    out.r_st = (w_lo + (int64_t)aln.j_start) - ctg_start;
    // q_st/q_en in ORIGINAL read coordinates (mappy's convention; the
    // SAM writer swaps soft clips for reverse-strand records)
    if (best_strand) {
        out.q_st = qtr;
        out.q_en = (int32_t)query.size() - qtl;
    } else {
        out.q_st = qtl;
        out.q_en = (int32_t)query.size() - qtr;
    }
    out.score = aln.score;
    int denom = best_s > 0 ? best_s : 1;
    int mq = (int)(40.0 * (1.0 - (double)second_s / denom));
    out.mapq = std::max(0, std::min(60, mq));

    int64_t rlen = 0, num = 0;
    for (char c : out.cigar) {
        if (c >= '0' && c <= '9') num = num * 10 + (c - '0');
        else { if (c == '=' || c == 'X' || c == 'D') rlen += num; num = 0; }
    }
    out.r_en = out.r_st + rlen;
    return true;
}

}  // namespace

extern "C" {

void* mapper_index_build(const char* seq, int64_t seq_len,
                         const int64_t* starts, int32_t n_contigs,
                         int32_t k, int32_t w) {
    Index* idx = new Index();
    idx->k = k;
    idx->w = w;
    idx->seq.assign(seq, seq_len);
    for (auto& c : idx->seq) c = (char)toupper((unsigned char)c);
    idx->starts.assign(starts, starts + n_contigs);
    std::vector<Mini> mins;
    minimizers(idx->seq.c_str(), idx->seq.size(), k, w, mins);
    for (const auto& m : mins)
        idx->table[m.h].push_back((m.pos << 1) | m.strand);
    return idx;
}

void mapper_index_free(void* handle) {
    delete (Index*)handle;
}

int32_t mapper_map(void* handle, const char* query, int64_t query_len,
                   int32_t* ctg_id, int64_t* r_st, int64_t* r_en,
                   int32_t* q_st, int32_t* q_en, int32_t* strand,
                   int32_t* mapq, int32_t* nm, int32_t* score,
                   char* cigar_buf, int32_t cigar_cap,
                   char* md_buf, int32_t md_cap) {
    Index* idx = (Index*)handle;
    Mapping m;
    if (!map_query(*idx, std::string(query, query_len), m)) return 0;
    // -1: mapped but the caller's cigar/MD buffers are too small —
    // distinct from 0 so a real mapping is never silently 'unmapped'
    if ((int32_t)m.cigar.size() >= cigar_cap ||
        (int32_t)m.md.size() >= md_cap) return -1;
    *ctg_id = m.ctg_id;
    *r_st = m.r_st; *r_en = m.r_en;
    *q_st = m.q_st; *q_en = m.q_en;
    *strand = m.strand;
    *mapq = m.mapq;
    *nm = m.nm;
    *score = m.score;
    strcpy(cigar_buf, m.cigar.c_str());
    strcpy(md_buf, m.md.c_str());
    return 1;
}

}  // extern "C"
