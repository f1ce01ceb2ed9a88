// Host-side CTC prefix beam search for the conv-CTC family.
//
// The role of the reference's Rust fast-ctc-decode `beam_search`
// (call site bonito/ctc/model.py:39-46). Semantics mirror the in-repo
// Python oracle (bonito_tpu/ops/ctc_decode.py:beam_search_ctc_py)
// decision-for-decision: per-prefix (p_blank, p_nonblank) tracking,
// repeat-vs-new-emission split, per-step first-writer-wins emission
// frames with beams processed in score order, stable top-W selection.
//
// Emission frames are persistent cons cells in an arena (no per-candidate
// copying); prefixes are canonicalised in a label trie.
//
// Exposed via ctypes; see bonito_tpu/ops/ctc_decode.py.

#include <cmath>
#include <cstdint>
#include <vector>
#include <algorithm>

namespace {

constexpr double NEG = -1e30;

inline double lse(double a, double b) {
    if (a <= NEG) return b;
    if (b <= NEG) return a;
    double m = a > b ? a : b;
    return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// Prefix trie: canonical identity for label strings.
struct TrieNode {
    int32_t parent;   // -1 for root
    int32_t label;    // 0 for root
    int32_t depth;    // 0 for root
    int32_t child[8]; // child node per label (labels 1..C-1, C <= 8), -1 if absent
};

// Persistent frame list: id -1 = empty.
struct FrameCell {
    int32_t t;
    int32_t parent;
};

struct Beam {
    int32_t node;
    double pb, pnb;
    int32_t frames;     // arena id of the newest cell
    int32_t frames_len;
};

struct Cand {
    int32_t node;
    double pb, pnb;
    int32_t frames;
    int32_t frames_len;
    bool frames_set;
};

} // namespace

extern "C" {

// probs: [T, C] row-major float32 posteriors (column 0 = blank).
// Returns the number of emitted bases written to out_labels/out_frames,
// or -1 if the call fails (C > 8 or the output buffer is too small).
int ctc_beam_search(const float* probs, int32_t T, int32_t C,
                    int32_t beamsize, float threshold,
                    int32_t* out_labels, int64_t* out_frames,
                    int32_t max_out) {
    if (C < 2 || C > 8 || beamsize < 1 || T < 0) return -1;

    const double log_thresh =
        threshold > 0 ? std::log((double)threshold) : -INFINITY;

    std::vector<TrieNode> trie;
    trie.push_back(TrieNode{-1, 0, 0, {-1, -1, -1, -1, -1, -1, -1, -1}});
    auto child_of = [&trie](int32_t node, int32_t c) {
        int32_t id = trie[node].child[c];
        if (id < 0) {
            id = (int32_t)trie.size();
            TrieNode n{node, c, trie[node].depth + 1,
                       {-1, -1, -1, -1, -1, -1, -1, -1}};
            trie[node].child[c] = id;
            trie.push_back(n);
        }
        return id;
    };

    std::vector<FrameCell> arena;
    arena.reserve(1024);
    auto cons = [&arena](int32_t t, int32_t parent) {
        arena.push_back(FrameCell{t, parent});
        return (int32_t)arena.size() - 1;
    };

    std::vector<Beam> beams;
    beams.push_back(Beam{0, 0.0, NEG, -1, 0});

    std::vector<Cand> cands;
    std::vector<double> lp(C);
    std::vector<int32_t> order;
    std::vector<double> scores;
    cands.reserve((size_t)beamsize * (C + 1));

    for (int32_t t = 0; t < T; ++t) {
        const float* row = probs + (size_t)t * C;
        for (int32_t c = 0; c < C; ++c) {
            double p = (double)row[c];
            lp[c] = std::log(p > 1e-30 ? p : 1e-30);
        }

        cands.clear();
        // candidate lookup by node id: candidate sets are tiny (<= W*(C+1)),
        // linear scan beats hashing
        auto find_or_create = [&cands](int32_t node) -> Cand& {
            for (auto& c : cands)
                if (c.node == node) return c;
            cands.push_back(Cand{node, NEG, NEG, -1, 0, false});
            return cands.back();
        };

        // beams are already in descending score order from the previous
        // step's stable selection: first-writer-wins frame merges follow
        // that order, as the Python dict iteration does
        for (const Beam& b : beams) {
            const double total = lse(b.pb, b.pnb);
            // blank continuation keeps the prefix
            {
                Cand& e = find_or_create(b.node);
                e.pb = lse(e.pb, total + lp[0]);
                if (!e.frames_set && b.frames_len > 0) {
                    e.frames = b.frames;
                    e.frames_len = b.frames_len;
                    e.frames_set = true;
                }
            }
            const int32_t last = trie[b.node].label; // 0 at root
            for (int32_t c = 1; c < C; ++c) {
                if (lp[c] < log_thresh) continue;
                const int32_t child = child_of(b.node, c);
                if (c == last) {
                    // repeat: same prefix only via non-blank continuation
                    Cand& e = find_or_create(b.node);
                    e.pnb = lse(e.pnb, b.pnb + lp[c]);
                    if (!e.frames_set && b.frames_len > 0) {
                        e.frames = b.frames;
                        e.frames_len = b.frames_len;
                        e.frames_set = true;
                    }
                    // new emission only after a blank
                    Cand& e2 = find_or_create(child);
                    e2.pnb = lse(e2.pnb, b.pb + lp[c]);
                    if (e2.frames_len != trie[child].depth) {
                        e2.frames = cons(t, b.frames);
                        e2.frames_len = b.frames_len + 1;
                        e2.frames_set = true;
                    }
                } else {
                    Cand& e2 = find_or_create(child);
                    e2.pnb = lse(e2.pnb, total + lp[c]);
                    if (e2.frames_len != trie[child].depth) {
                        e2.frames = cons(t, b.frames);
                        e2.frames_len = b.frames_len + 1;
                        e2.frames_set = true;
                    }
                }
            }
        }

        // stable top-W by total score (ties keep creation order, matching
        // Python's stable sorted() over dict insertion order)
        order.resize(cands.size());
        scores.resize(cands.size());
        for (size_t i = 0; i < cands.size(); ++i) {
            order[i] = (int32_t)i;
            scores[i] = lse(cands[i].pb, cands[i].pnb);
        }
        std::stable_sort(order.begin(), order.end(),
                         [&scores = scores](int32_t a, int32_t b) {
                             return scores[a] > scores[b];
                         });
        const size_t keep = std::min((size_t)beamsize, order.size());
        beams.clear();
        for (size_t i = 0; i < keep; ++i) {
            const Cand& c = cands[order[i]];
            beams.push_back(Beam{c.node, c.pb, c.pnb, c.frames, c.frames_len});
        }
    }

    // best beam
    size_t best = 0;
    double best_score = -INFINITY;
    for (size_t i = 0; i < beams.size(); ++i) {
        double s = lse(beams[i].pb, beams[i].pnb);
        if (s > best_score) { best_score = s; best = i; }
    }
    const Beam& b = beams[best];
    const int32_t n = trie[b.node].depth;
    if (n > max_out) return -1;
    int32_t node = b.node;
    for (int32_t i = n - 1; i >= 0; --i) {
        out_labels[i] = trie[node].label;
        node = trie[node].parent;
    }
    int32_t cell = b.frames;
    for (int32_t i = b.frames_len - 1; i >= 0; --i) {
        out_frames[i] = arena[cell].t;
        cell = arena[cell].parent;
    }
    return n;
}

} // extern "C"
