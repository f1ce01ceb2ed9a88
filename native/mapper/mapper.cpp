// minimap-lite: minimizer index + anchor chaining + banded affine-gap
// alignment. Host-side replacement for the reference's mappy/minimap2
// dependency (bonito/aligner.py) — same role: map basecalled reads to a
// reference, produce cigar/NM/MD, softclip bounds, strand and mapq.
//
// Algorithm (minimap2-style, independently implemented):
//   * index: (k,w) minimizers of the concatenated reference, open-addressing
//     hash -> position list
//   * map: query minimizers (canonical) -> anchors (ref_pos, q_pos, strand)
//   * chain: O(n log n)-ish DP over anchors sorted by ref pos with bounded
//     lookback, gap-cost chaining
//   * extend: banded global alignment over the chained span, affine gaps,
//     =/X/I/D cigar
//
// C ABI for ctypes. Thread-safe after index build.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Index {
    int k = 15, w = 10;
    std::vector<std::string> names;
    std::vector<int64_t> starts;  // start of each contig in concat
    std::string seq;              // concatenated reference (uppercase)
    std::unordered_map<uint64_t, std::vector<int64_t>> table;
    int max_occ = 200;            // drop ultra-repetitive minimizers
};

inline int base2code(char c) {
    switch (c) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': case 'U': case 'u': return 3;
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

// minimizers of s: (hash, pos, strand) with canonical k-mer selection
struct Mini {
    uint64_t h;
    int64_t pos;   // position of k-mer start
    int strand;    // 0 fwd, 1 rev (canonical strand)
};

void minimizers(const char* s, int64_t n, int k, int w, std::vector<Mini>& out) {
    if (n < k) return;
    const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
    uint64_t fwd = 0, rev = 0;
    int l = 0;
    std::vector<Mini> window;
    // monotonic deque over a sliding window of k-mer hashes
    std::vector<Mini> deque_buf;
    size_t dq_head = 0;
    int64_t last_emitted = -1;

    auto push = [&](const Mini& m) {
        while (deque_buf.size() > dq_head && deque_buf.back().h >= m.h)
            deque_buf.pop_back();
        deque_buf.push_back(m);
    };

    for (int64_t i = 0; i < n; i++) {
        int c = base2code(s[i]);
        if (c < 0) { l = 0; fwd = rev = 0; continue; }
        fwd = ((fwd << 2) | c) & mask;
        rev = (rev >> 2) | ((uint64_t)(3 - c) << (2 * (k - 1)));
        if (++l < k) continue;
        int64_t pos = i - k + 1;
        int strand = 0;
        uint64_t key;
        if (fwd < rev) { key = fwd; strand = 0; }
        else if (rev < fwd) { key = rev; strand = 1; }
        else continue;  // palindromic k-mer: skip (canonical ambiguity)
        Mini m{hash64(key, mask), pos, strand};
        push(m);
        // evict out-of-window head
        while (deque_buf[dq_head].pos <= pos - w) dq_head++;
        if (pos >= (int64_t)w - 1 || i == n - 1) {
            const Mini& best = deque_buf[dq_head];
            if (best.pos != last_emitted) {
                out.push_back(best);
                last_emitted = best.pos;
            }
        }
    }
}

struct Anchor {
    int64_t r;  // ref pos
    int64_t q;  // query pos (on the strand being considered)
    };

struct Mapping {
    int32_t ctg_id;
    int64_t r_st, r_en;
    int32_t q_st, q_en;
    int32_t strand;   // +1 / -1
    int32_t mapq;
    int32_t nm;
    int32_t score;
    std::string cigar;  // =/X/I/D run-length
    std::string md;
};

std::string revcomp(const std::string& s) {
    std::string r(s.rbegin(), s.rend());
    for (auto& c : r) {
        switch (c) {
            case 'A': c = 'T'; break; case 'T': c = 'A'; break;
            case 'C': c = 'G'; break; case 'G': c = 'C'; break;
            case 'a': c = 't'; break; case 't': c = 'a'; break;
            case 'c': c = 'g'; break; case 'g': c = 'c'; break;
        }
    }
    return r;
}

// banded global alignment with affine gaps over query q vs ref r.
// returns score; fills ops/lens cigar (query-consuming I, ref-consuming D).
struct AlnResult {
    int score = -1;
    std::string cigar;
    int nm = 0;
    std::string md;
};

AlnResult banded_align(const std::string& q, const std::string& r, int band,
                       int match = 2, int mismatch = -4, int gap_open = 4,
                       int gap_extend = 2) {
    const int n = (int)q.size(), m = (int)r.size();
    AlnResult res;
    if (n == 0 || m == 0) return res;
    band = std::max(band, std::abs(n - m) + 16);
    band = std::min({band, n, m, 50000});
    const int W = 2 * band + 1;
    const int32_t NEG = INT32_MIN / 4;
    // H[i][d], d = j - i + band  (j in [i-band, i+band])
    std::vector<int32_t> H(W), E(W), F(W), H_prev(W), E_prev(W);
    std::vector<uint8_t> bt((int64_t)(n + 1) * W);  // 0 diag,1 up(I),2 left(D)
    // init row 0: H[0][d] = gap cost of j deletions
    for (int d = 0; d < W; d++) {
        int j = d - band;
        H_prev[d] = (j < 0 || j > m) ? NEG
                   : (j == 0 ? 0 : -(gap_open + gap_extend * j));
        E_prev[d] = NEG;
        if (j >= 0 && j <= m && j > 0) bt[d] = 2;
    }
    for (int i = 1; i <= n; i++) {
        int32_t f = NEG;
        for (int d = 0; d < W; d++) {
            int j = i + d - band;
            int32_t h = NEG, e = NEG;
            uint8_t dir = 0;
            if (j >= 0 && j <= m) {
                // E: gap in query (vertical, from H_prev same j => d+1 in prev row)
                if (d + 1 < W) {
                    int32_t hp = H_prev[d + 1], ep = E_prev[d + 1];
                    if (hp > NEG / 2 || ep > NEG / 2)
                        e = std::max(hp - gap_open - gap_extend, ep - gap_extend);
                }
                // F: gap in ref (horizontal, same row d-1)
                if (d > 0) {
                    int32_t hl = H[d - 1];
                    int32_t cand = std::max(hl - gap_open - gap_extend,
                                            f - gap_extend);
                    f = cand;
                } else {
                    f = NEG;
                }
                // diag from H_prev[d] (i-1, j-1)
                if (j > 0) {
                    int32_t hd = H_prev[d];
                    if (hd > NEG / 2) {
                        int s = (q[i - 1] == r[j - 1]) ? match : mismatch;
                        h = hd + s;
                    }
                }
                if (j == 0) { h = -(gap_open + gap_extend * i); dir = 1; }
                if (e > h) { h = e; dir = 1; }
                if (f > h) { h = f; dir = 2; }
            }
            E[d] = e;
            F[d] = f;
            H[d] = h;
            bt[(int64_t)i * W + d] = dir;
        }
        std::swap(H, H_prev);
        std::swap(E, E_prev);
    }
    int dm = m - n + band;
    if (dm < 0 || dm >= W || H_prev[dm] < NEG / 2) return res;
    res.score = H_prev[dm];

    // traceback
    std::string ops;
    int i = n, d = dm;
    while (i > 0 || d != band - i + 0) {
        int j = i + d - band;
        if (i == 0 && j == 0) break;
        uint8_t dir = bt[(int64_t)i * W + d];
        if (i == 0) dir = 2;
        else if (j == 0) dir = 1;
        if (dir == 0) {
            ops.push_back(q[i - 1] == r[j - 1] ? '=' : 'X');
            i--; // d unchanged: j-1 - (i-1) = j - i
        } else if (dir == 1) {
            ops.push_back('I');
            i--; d++;
        } else {
            ops.push_back('D');
            d--;
        }
        if (i == 0 && i + d - band == 0) break;
    }
    std::reverse(ops.begin(), ops.end());

    // run-length cigar + NM + MD
    std::string cigar, md;
    int run = 0; char prev = 0;
    int nm = 0;
    int64_t qi = 0, ri = 0;
    int md_run = 0;
    for (char c : ops) {
        if (c == prev) run++;
        else {
            if (run) cigar += std::to_string(run) + prev;
            prev = c; run = 1;
        }
        switch (c) {
            case '=': md_run++; qi++; ri++; break;
            case 'X':
                md += std::to_string(md_run); md_run = 0;
                md += r[ri];
                nm++; qi++; ri++; break;
            case 'I': nm++; qi++; break;
            case 'D': {
                md += std::to_string(md_run); md_run = 0;
                md += '^';
                int64_t r0 = ri;
                // consume the whole run now; mark prev so loop skips
                md += r[ri];
                nm++; ri++;
                (void)r0;
                break;
            }
        }
    }
    if (run) cigar += std::to_string(run) + prev;
    md += std::to_string(md_run);
    res.cigar = cigar;
    res.nm = nm;
    res.md = md;
    return res;
}

bool map_query(const Index& idx, const std::string& query_in, Mapping& out) {
    const int k = idx.k, w = idx.w;
    if ((int64_t)query_in.size() < k) return false;

    int best_score[2] = {0, 0};
    std::vector<Anchor> best_chain;
    int best_strand = 0;
    int second_best = 0;

    for (int strand = 0; strand < 2; strand++) {
        std::string query = strand ? revcomp(query_in) : query_in;
        std::vector<Mini> qmini;
        minimizers(query.c_str(), query.size(), k, w, qmini);

        std::vector<Anchor> anchors;
        for (const auto& m : qmini) {
            auto it = idx.table.find(m.h);
            if (it == idx.table.end()) continue;
            const auto& hits = it->second;
            if ((int)hits.size() > idx.max_occ) continue;
            for (int64_t rp : hits) {
                int rstrand = (int)(rp & 1);
                int64_t rpos = rp >> 1;
                // same canonical orientation => same strand alignment
                if (rstrand == m.strand)
                    anchors.push_back({rpos, m.pos});
            }
        }
        if (anchors.size() < 3) continue;
        std::sort(anchors.begin(), anchors.end(), [](const Anchor& a, const Anchor& b) {
            return a.r == b.r ? a.q < b.q : a.r < b.r;
        });

        // DP chaining with bounded lookback
        const int LOOKBACK = 64;
        const int64_t MAX_GAP = 5000;
        int n = (int)anchors.size();
        std::vector<int32_t> score(n), parent(n, -1);
        int best_i = -1;
        int32_t best_s = 0;
        for (int i = 0; i < n; i++) {
            score[i] = k;
            for (int j = i - 1; j >= 0 && j >= i - LOOKBACK; j--) {
                int64_t dr = anchors[i].r - anchors[j].r;
                int64_t dq = anchors[i].q - anchors[j].q;
                if (dq <= 0 || dr <= 0) continue;
                if (dr > MAX_GAP || dq > MAX_GAP) continue;
                int64_t gap = dr > dq ? dr - dq : dq - dr;
                int32_t gain = (int32_t)std::min<int64_t>(k, std::min(dr, dq))
                               - (int32_t)(gap > 0 ? 1 + gap / 50 : 0);
                if (score[j] + gain > score[i]) {
                    score[i] = score[j] + gain;
                    parent[i] = j;
                }
            }
            if (score[i] > best_s) { best_s = score[i]; best_i = i; }
        }
        if (best_s > best_score[0]) {
            second_best = best_score[0];
            best_score[0] = best_s;
            best_strand = strand;
            best_chain.clear();
            for (int i = best_i; i >= 0; i = parent[i])
                best_chain.push_back(anchors[i]);
            std::reverse(best_chain.begin(), best_chain.end());
        } else if (best_s > second_best) {
            second_best = best_s;
        }
    }

    if (best_chain.empty()) return false;

    const std::string query =
        best_strand ? revcomp(query_in) : query_in;
    int64_t r_lo = best_chain.front().r;
    int64_t r_hi = best_chain.back().r + k;
    int64_t q_lo = best_chain.front().q;
    int64_t q_hi = best_chain.back().q + k;

    // contig lookup + clamp to contig bounds
    int ctg = (int)(std::upper_bound(idx.starts.begin(), idx.starts.end(), r_lo)
                    - idx.starts.begin()) - 1;
    int64_t ctg_start = idx.starts[ctg];
    int64_t ctg_end = (ctg + 1 < (int)idx.starts.size())
                      ? idx.starts[ctg + 1] : (int64_t)idx.seq.size();
    if (r_hi > ctg_end) r_hi = ctg_end;

    // extend the ref window to cover the full query (global alignment of
    // the whole query against a padded ref window, softclip-free here;
    // python layer computes softclips from q_lo/q_hi if extension fails)
    int64_t pad_l = q_lo + 64, pad_r = (int64_t)query.size() - q_hi + 64;
    int64_t w_lo = std::max(ctg_start, r_lo - pad_l);
    int64_t w_hi = std::min(ctg_end, r_hi + pad_r);

    std::string ref_window = idx.seq.substr(w_lo, w_hi - w_lo);
    int band = 200 + (int)(std::abs((int64_t)query.size() -
                                    (int64_t)ref_window.size()));
    AlnResult aln = banded_align(query, ref_window, band);
    if (aln.score == -1 || aln.cigar.empty()) return false;

    // trim leading/trailing indel runs into clip/position adjustments
    out.ctg_id = ctg;
    out.strand = best_strand ? -1 : 1;
    out.r_st = w_lo - ctg_start;
    out.r_en = out.r_st;
    out.q_st = 0;
    out.q_en = (int32_t)query.size();
    out.nm = aln.nm;
    out.score = aln.score;
    out.cigar = aln.cigar;
    out.md = aln.md;
    int denom = best_score[0] > 0 ? best_score[0] : 1;
    int mq = (int)(40.0 * (1.0 - (double)second_best / denom));
    out.mapq = std::max(0, std::min(60, mq));
    // r_en from cigar ref-consuming ops
    int64_t rlen = 0, num = 0;
    for (char c : aln.cigar) {
        if (c >= '0' && c <= '9') num = num * 10 + (c - '0');
        else {
            if (c == '=' || c == 'X' || c == 'D') rlen += num;
            num = 0;
        }
    }
    out.r_en = out.r_st + rlen;
    return true;
}

Index* g_index = nullptr;

}  // namespace

extern "C" {

// Build index from concatenated sequence + contig table.
// names: \n-joined contig names; starts: per-contig start offsets.
void* mapper_index_build(const char* seq, int64_t seq_len, const char* names,
                         const int64_t* starts, int32_t n_contigs,
                         int32_t k, int32_t w) {
    Index* idx = new Index();
    idx->k = k;
    idx->w = w;
    idx->seq.assign(seq, seq_len);
    for (auto& c : idx->seq) c = (char)toupper(c);
    idx->starts.assign(starts, starts + n_contigs);
    std::string nm(names);
    size_t pos = 0;
    while (pos < nm.size()) {
        size_t e = nm.find('\n', pos);
        if (e == std::string::npos) e = nm.size();
        idx->names.push_back(nm.substr(pos, e - pos));
        pos = e + 1;
    }
    std::vector<Mini> mins;
    minimizers(idx->seq.c_str(), idx->seq.size(), k, w, mins);
    for (const auto& m : mins)
        idx->table[m.h].push_back((m.pos << 1) | m.strand);
    return idx;
}

void mapper_index_free(void* handle) {
    delete (Index*)handle;
}

// Map one query. Returns 1 on hit, 0 on miss.
// Outputs: ctg_id, r_st, r_en, q_st, q_en, strand, mapq, nm, score;
// cigar/md into caller buffers.
int32_t mapper_map(void* handle, const char* query, int64_t query_len,
                   int32_t* ctg_id, int64_t* r_st, int64_t* r_en,
                   int32_t* q_st, int32_t* q_en, int32_t* strand,
                   int32_t* mapq, int32_t* nm, int32_t* score,
                   char* cigar_buf, int32_t cigar_cap,
                   char* md_buf, int32_t md_cap) {
    Index* idx = (Index*)handle;
    Mapping m;
    if (!map_query(*idx, std::string(query, query_len), m)) return 0;
    if ((int32_t)m.cigar.size() >= cigar_cap ||
        (int32_t)m.md.size() >= md_cap) return 0;
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
