// svb16 stream-vbyte codec with integrated delta + zigzag transform.
//
// This is the inner layer of the VBZ compression used by POD5 signal tables
// (outer layer is zstd, applied in python via the `zstandard` package).
// Format: a control stream of ceil(n/8) bytes (LSB-first; bit set => the
// element is stored as 2 little-endian bytes, clear => 1 byte) followed by
// the variable-length data stream.
//
// Replaces the role of the closed pod5/vbz native libs for the TPU build's
// host-side POD5 reader (reference call sites: bonito/pod5.py:70-81).

#include <cstdint>
#include <cstddef>

extern "C" {

size_t svb16_max_encoded_size(size_t count) {
    return (count + 7) / 8 + 2 * count;
}

// Encode int16 values with delta + zigzag. Returns bytes written.
size_t svb16_encode_dz(const int16_t* in, size_t count, uint8_t* out) {
    uint8_t* keys = out;
    size_t key_bytes = (count + 7) / 8;
    for (size_t i = 0; i < key_bytes; ++i) keys[i] = 0;
    uint8_t* data = out + key_bytes;
    int16_t prev = 0;
    for (size_t i = 0; i < count; ++i) {
        int16_t delta = (int16_t)(in[i] - prev);
        prev = in[i];
        uint16_t zz = (uint16_t)((delta << 1) ^ (delta >> 15));
        *data++ = (uint8_t)(zz & 0xff);
        if (zz > 0xff) {
            *data++ = (uint8_t)(zz >> 8);
            keys[i / 8] |= (uint8_t)(1u << (i % 8));
        }
    }
    return (size_t)(data - out);
}

// Decode `count` int16 values with delta + zigzag. Returns 0 on success,
// -1 if the input buffer is too short.
int svb16_decode_dz(const uint8_t* in, size_t in_size, int16_t* out, size_t count) {
    size_t key_bytes = (count + 7) / 8;
    if (in_size < key_bytes) return -1;
    const uint8_t* keys = in;
    const uint8_t* data = in + key_bytes;
    const uint8_t* end = in + in_size;
    int16_t prev = 0;
    for (size_t i = 0; i < count; ++i) {
        uint16_t zz;
        if (keys[i / 8] & (1u << (i % 8))) {
            if (data + 2 > end) return -1;
            zz = (uint16_t)(data[0] | (data[1] << 8));
            data += 2;
        } else {
            if (data + 1 > end) return -1;
            zz = data[0];
            data += 1;
        }
        int16_t delta = (int16_t)((zz >> 1) ^ (uint16_t)(-(int16_t)(zz & 1)));
        prev = (int16_t)(prev + delta);
        out[i] = prev;
    }
    return 0;
}

}  // extern "C"
