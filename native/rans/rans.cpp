// rANS 4x8 codec for CRAM 3.0 block compression method 4 (the codec
// htslib writes by default for most CRAM data series).
//
// Implements the hts-specs CRAMcodecs byte format: a 9-byte header
// (order u8, compressed-size u32le of everything after the header,
// uncompressed-size u32le), an RLE-packed frequency table normalised to
// 4096 (12-bit), and four interleaved 32-bit rANS states with byte-wise
// renormalisation (lower bound 1<<23), flushed as four u32le (state 0
// first in the forward stream).
//   order 0: symbol i is carried by state i%4; encoder walks the input
//            backward, decoder forward.
//   order 1: the input is split into four contiguous quarters, one
//            state each (state 3 also takes the remainder); each byte is
//            coded under its predecessor as context (first byte of each
//            quarter under context 0), with a per-context 4096-total
//            table.
// The in-repo Python implementation (bonito_tpu/rans.py) is the
// fallback and test oracle; both were written independently from the
// spec and are pinned byte-identical + cross-decoding in
// tests/test_cram.py. True htslib cross-validation is environment-
// blocked (no htslib, no egress) and noted in README.
//
// Reference role: htslib cram/rANS_static.c via pysam
// (/root/reference/bonito/io.py:415-425 writes CRAM through pysam).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t TOTFREQ = 4096;      // 12-bit normalised totals
constexpr int TF_SHIFT = 12;
constexpr uint32_t RANS_BYTE_L = 1u << 23;

struct EncSym {
    uint32_t start;  // cumulative frequency
    uint32_t freq;
};

inline void enc_put(uint32_t &x, std::vector<uint8_t> &rev, const EncSym &s) {
    // emit renorm bytes (collected in reverse order)
    uint32_t x_max = ((RANS_BYTE_L >> TF_SHIFT) << 8) * s.freq;
    while (x >= x_max) {
        rev.push_back(x & 0xff);
        x >>= 8;
    }
    x = ((x / s.freq) << TF_SHIFT) + (x % s.freq) + s.start;
}

inline void enc_flush(uint32_t x, std::vector<uint8_t> &rev) {
    // forward order is little-endian; we collect reversed
    rev.push_back((x >> 24) & 0xff);
    rev.push_back((x >> 16) & 0xff);
    rev.push_back((x >> 8) & 0xff);
    rev.push_back(x & 0xff);
}

// normalise raw counts to sum to EXACTLY TOTFREQ, every present symbol
// >= 1. Always succeeds: there are <= 256 present symbols and
// TOTFREQ = 4096 > 256, so a valid table exists; excess (from the
// max(1, .) clamps on rare symbols) is drained from the currently
// largest frequency, one of which is always > 1 while excess > 0.
// The Python oracle (bonito_tpu/rans.py) implements the identical
// deterministic scheme — tests pin the tables byte-equal.
void normalise(const uint64_t *cnt, uint32_t *F) {
    uint64_t total = 0;
    for (int i = 0; i < 256; i++) total += cnt[i];
    if (!total) return;
    int64_t sum = 0;
    int maxi = 0;
    for (int i = 0; i < 256; i++) {
        if (!cnt[i]) { F[i] = 0; continue; }
        uint32_t f = (uint32_t)((cnt[i] * TOTFREQ) / total);
        if (f == 0) f = 1;
        F[i] = f;
        sum += f;
        if (cnt[i] > cnt[maxi]) maxi = i;
    }
    if (sum < (int64_t)TOTFREQ) {
        F[maxi] += (uint32_t)(TOTFREQ - sum);
        return;
    }
    int64_t excess = sum - (int64_t)TOTFREQ;
    while (excess > 0) {
        int big = 0;
        for (int i = 1; i < 256; i++)
            if (F[i] > F[big]) big = i;
        uint32_t take = F[big] - 1;
        if ((int64_t)take > excess) take = (uint32_t)excess;
        F[big] -= take;
        excess -= take;
    }
}

// ---- frequency-table serialisation (htslib RLE scheme) --------------------

void write_freqs(const uint32_t *F, std::vector<uint8_t> &out) {
    int rle = 0;
    for (int j = 0; j < 256; j++) {
        if (!F[j]) continue;
        if (rle) {
            rle--;
        } else {
            out.push_back((uint8_t)j);
            if (j && F[j - 1]) {
                int k;
                for (k = j + 1; k < 256 && F[k]; k++) ;
                rle = k - (j + 1);
                out.push_back((uint8_t)rle);
            }
        }
        if (F[j] < 128) {
            out.push_back((uint8_t)F[j]);
        } else {
            out.push_back((uint8_t)(128 | (F[j] >> 8)));
            out.push_back((uint8_t)(F[j] & 0xff));
        }
    }
    out.push_back(0);
}

// returns bytes consumed, or -1 on malformed input
int read_freqs(const uint8_t *cp, const uint8_t *end, uint32_t *F) {
    const uint8_t *cp0 = cp;
    std::memset(F, 0, 256 * sizeof(uint32_t));
    if (cp >= end) return -1;
    int rle = 0;
    int j = *cp++;
    do {
        if (cp >= end) return -1;
        uint32_t f = *cp++;
        if (f >= 128) {
            if (cp >= end) return -1;
            f = ((f & 127) << 8) | *cp++;
        }
        F[j] = f;
        if (cp >= end) return -1;
        if (!rle && j + 1 == *cp) {
            j = *cp++;
            if (cp >= end) return -1;
            rle = *cp++;
        } else if (rle) {
            rle--;
            j++;
            // a stream-controlled run length must not walk past the
            // symbol space (OOB write into F otherwise)
            if (j > 255) return -1;
        } else {
            j = *cp++;
        }
    } while (j);
    return (int)(cp - cp0);
}

void cumulate(const uint32_t *F, uint32_t *C, uint8_t *lookup) {
    uint32_t c = 0;
    for (int i = 0; i < 256; i++) {
        C[i] = c;
        c += F[i];
    }
    if (lookup) {
        for (int i = 0; i < 256; i++)
            for (uint32_t m = C[i]; m < C[i] + F[i] && m < TOTFREQ; m++)
                lookup[m] = (uint8_t)i;
    }
}

}  // namespace

extern "C" {

// out must hold >= rans_compress_bound(in_size). Returns total output
// size (incl. 9-byte header) or -1.
int64_t rans_compress_bound(uint32_t in_size, int order) {
    return 9 + (order ? 257 * 257 * 3 : 257 * 3) + (int64_t)in_size * 2 + 64;
}

int64_t rans_compress(const uint8_t *in, uint32_t in_size, int order,
                      uint8_t *out) {
    if (in_size < 4) order = 0;  // order-1 needs the 4 quarter seeds
    std::vector<uint8_t> table;
    std::vector<uint8_t> rev;  // rans bytes, reverse order
    rev.reserve(in_size + 16);

    if (order == 0) {
        uint64_t cnt[256] = {0};
        for (uint32_t i = 0; i < in_size; i++) cnt[in[i]]++;
        uint32_t F[256] = {0};
        if (in_size) normalise(cnt, F);
        else F[0] = 0;
        uint32_t C[256];
        cumulate(F, C, nullptr);
        EncSym syms[256];
        for (int i = 0; i < 256; i++) syms[i] = {C[i], F[i]};
        write_freqs(F, table);

        uint32_t x0 = RANS_BYTE_L, x1 = RANS_BYTE_L,
                 x2 = RANS_BYTE_L, x3 = RANS_BYTE_L;
        // symbol i belongs to state i%4; encode i descending
        // ((int64_t) first: uint32 "0 - 1" would wrap before widening)
        for (int64_t i = (int64_t)in_size - 1; i >= 0; i--) {
            uint32_t *x = (i & 3) == 0 ? &x0 : (i & 3) == 1 ? &x1
                         : (i & 3) == 2 ? &x2 : &x3;
            enc_put(*x, rev, syms[in[i]]);
        }
        enc_flush(x3, rev);
        enc_flush(x2, rev);
        enc_flush(x1, rev);
        enc_flush(x0, rev);
    } else {
        // order-1: per-context tables; quarters are contiguous
        static thread_local std::vector<uint64_t> cnt_v;
        cnt_v.assign(256 * 256, 0);
        uint64_t *cnt = cnt_v.data();
        uint32_t isz4 = in_size >> 2;
        // context of each quarter's first byte is 0
        cnt[0 * 256 + in[0]]++;
        cnt[0 * 256 + in[isz4]]++;
        cnt[0 * 256 + in[2 * isz4]]++;
        cnt[0 * 256 + in[3 * isz4]]++;
        for (uint32_t i = 1; i < in_size; i++) {
            if (i == isz4 || i == 2 * isz4 || i == 3 * isz4) continue;
            cnt[in[i - 1] * 256 + in[i]]++;
        }
        static thread_local std::vector<uint32_t> F_v, C_v;
        F_v.assign(256 * 256, 0);
        C_v.assign(256 * 256, 0);
        uint32_t *F = F_v.data(), *C = C_v.data();
        bool used[256] = {false};
        for (int c = 0; c < 256; c++) {
            uint64_t t = 0;
            for (int s = 0; s < 256; s++) t += cnt[c * 256 + s];
            if (!t) continue;
            used[c] = true;
            normalise(cnt + c * 256, F + c * 256);
            cumulate(F + c * 256, C + c * 256, nullptr);
        }
        // outer RLE over contexts, inner order-0-style table each
        int rle = 0;
        for (int c = 0; c < 256; c++) {
            if (!used[c]) continue;
            if (rle) {
                rle--;
            } else {
                table.push_back((uint8_t)c);
                if (c && used[c - 1]) {
                    int k;
                    for (k = c + 1; k < 256 && used[k]; k++) ;
                    rle = k - (c + 1);
                    table.push_back((uint8_t)rle);
                }
            }
            write_freqs(F + c * 256, table);
        }
        table.push_back(0);

        uint32_t x0 = RANS_BYTE_L, x1 = RANS_BYTE_L,
                 x2 = RANS_BYTE_L, x3 = RANS_BYTE_L;
        auto sym = [&](int ctx, int s) -> EncSym {
            return {C[ctx * 256 + s], F[ctx * 256 + s]};
        };
        // quarters are all isz4 long: q_j = [j*isz4, (j+1)*isz4); the
        // remainder [4*isz4, in_size) is carried by state 3 and decoded
        // LAST, so it is encoded first (the encoder mirrors the decoder)
        int64_t i3 = (int64_t)in_size - 1;
        int l3 = in[i3];
        for (; i3 >= (int64_t)(4 * isz4) && i3 > 0; i3--) {
            enc_put(x3, rev, sym(in[i3 - 1], l3));
            l3 = in[i3 - 1];
        }
        // i3 == 4*isz4 - 1 here; interleave the four quarter interiors
        int64_t i2 = 3 * isz4 - 1, i1 = 2 * isz4 - 1, i0 = isz4 - 1;
        int l2 = in[i2], l1 = in[i1], l0 = in[i0];
        for (; i0 > 0; i0--, i1--, i2--, i3--) {
            enc_put(x3, rev, sym(in[i3 - 1], l3)); l3 = in[i3 - 1];
            enc_put(x2, rev, sym(in[i2 - 1], l2)); l2 = in[i2 - 1];
            enc_put(x1, rev, sym(in[i1 - 1], l1)); l1 = in[i1 - 1];
            enc_put(x0, rev, sym(in[i0 - 1], l0)); l0 = in[i0 - 1];
        }
        // first byte of each quarter under context 0
        enc_put(x3, rev, sym(0, l3));
        enc_put(x2, rev, sym(0, l2));
        enc_put(x1, rev, sym(0, l1));
        enc_put(x0, rev, sym(0, l0));
        enc_flush(x3, rev);
        enc_flush(x2, rev);
        enc_flush(x1, rev);
        enc_flush(x0, rev);
    }

    uint64_t body = table.size() + rev.size();
    out[0] = (uint8_t)order;
    out[1] = body & 0xff;
    out[2] = (body >> 8) & 0xff;
    out[3] = (body >> 16) & 0xff;
    out[4] = (body >> 24) & 0xff;
    out[5] = in_size & 0xff;
    out[6] = (in_size >> 8) & 0xff;
    out[7] = (in_size >> 16) & 0xff;
    out[8] = (in_size >> 24) & 0xff;
    std::memcpy(out + 9, table.data(), table.size());
    uint8_t *p = out + 9 + table.size();
    for (size_t i = rev.size(); i > 0; i--) *p++ = rev[i - 1];
    return (int64_t)(9 + body);
}

// out must hold out_size bytes (the caller reads it from the header /
// CRAM block). Returns 0 on success, negative on malformed input.
int rans_uncompress(const uint8_t *in, uint32_t in_size,
                    uint8_t *out, uint32_t out_size) {
    if (in_size < 9) return -1;
    int order = in[0];
    uint32_t body = in[1] | (in[2] << 8) | ((uint32_t)in[3] << 16)
                    | ((uint32_t)in[4] << 24);
    uint32_t raw = in[5] | (in[6] << 8) | ((uint32_t)in[7] << 16)
                   | ((uint32_t)in[8] << 24);
    if (raw != out_size) return -2;
    if (9 + (uint64_t)body > in_size) return -3;
    const uint8_t *cp = in + 9, *end = in + 9 + body;
    if (out_size == 0) return 0;

    auto dec_renorm = [&](uint32_t &x) {
        while (x < RANS_BYTE_L && cp < end) x = (x << 8) | *cp++;
    };
    auto dec_init = [&](uint32_t &x) -> bool {
        if (cp + 4 > end) return false;
        x = cp[0] | (cp[1] << 8) | ((uint32_t)cp[2] << 16)
            | ((uint32_t)cp[3] << 24);
        cp += 4;
        return true;
    };

    if (order == 0) {
        uint32_t F[256], C[256];
        static thread_local std::vector<uint8_t> lut_v;
        lut_v.assign(TOTFREQ, 0);
        int n = read_freqs(cp, end, F);
        if (n < 0) return -4;
        cp += n;
        cumulate(F, C, lut_v.data());
        uint32_t X[4];
        for (int j = 0; j < 4; j++)
            if (!dec_init(X[j])) return -5;
        for (uint32_t i = 0; i < out_size; i++) {
            uint32_t &x = X[i & 3];
            uint32_t m = x & (TOTFREQ - 1);
            uint8_t s = lut_v[m];
            out[i] = s;
            x = F[s] * (x >> TF_SHIFT) + m - C[s];
            dec_renorm(x);
        }
    } else if (order == 1) {
        static thread_local std::vector<uint32_t> F_v, C_v;
        static thread_local std::vector<uint8_t> lut_v;
        F_v.assign(256 * 256, 0);
        C_v.assign(256 * 256, 0);
        lut_v.assign(256 * TOTFREQ, 0);
        uint32_t *F = F_v.data(), *C = C_v.data();
        uint8_t *lut = lut_v.data();
        // outer context list with the same RLE scheme
        if (cp >= end) return -4;
        int rle = 0;
        int c = *cp++;
        do {
            int n = read_freqs(cp, end, F + c * 256);
            if (n < 0) return -4;
            cp += n;
            cumulate(F + c * 256, C + c * 256, lut + c * TOTFREQ);
            if (cp >= end) return -4;
            if (!rle && c + 1 == *cp) {
                c = *cp++;
                if (cp >= end) return -4;
                rle = *cp++;
            } else if (rle) {
                rle--;
                c++;
                if (c > 255) return -4;  // run past the context space
            } else {
                c = *cp++;
            }
        } while (c);

        uint32_t X[4];
        for (int j = 0; j < 4; j++)
            if (!dec_init(X[j])) return -5;
        uint32_t isz4 = out_size >> 2;
        uint32_t pos[4] = {0, isz4, 2 * isz4, 3 * isz4};
        int last[4] = {0, 0, 0, 0};
        for (uint32_t i = 0; i < isz4; i++) {
            for (int j = 0; j < 4; j++) {
                uint32_t &x = X[j];
                int ctx = last[j];
                uint32_t m = x & (TOTFREQ - 1);
                uint8_t s = lut[ctx * TOTFREQ + m];
                out[pos[j] + i] = s;
                x = F[ctx * 256 + s] * (x >> TF_SHIFT) + m - C[ctx * 256 + s];
                dec_renorm(x);
                last[j] = s;
            }
        }
        // remainder via state 3
        for (uint32_t i = 4 * isz4; i < out_size; i++) {
            uint32_t &x = X[3];
            int ctx = last[3];
            uint32_t m = x & (TOTFREQ - 1);
            uint8_t s = lut[ctx * TOTFREQ + m];
            out[i] = s;
            x = F[ctx * 256 + s] * (x >> TF_SHIFT) + m - C[ctx * 256 + s];
            dec_renorm(x);
            last[3] = s;
        }
    } else {
        return -6;
    }
    return 0;
}

}  // extern "C"
