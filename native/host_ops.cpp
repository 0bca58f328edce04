// Native host-side hot loops for dsrc_tpu.
//
// The TPU owns the compute path (JAX/XLA); these are the host runtime pieces
// that the reference implements in C++ and that stay on the CPU here too:
// record-boundary scanning for the chunker (reference
// FastqStream.cpp:18-98), 2-bit packing fallbacks, and compressed-payload
// row compaction for archive serialization.  Exposed with a plain C ABI for
// ctypes (no pybind11 in this image).
//
// Build: make -C native   ->  libdsrc_host.so

#include <cstdint>
#include <cstring>

extern "C" {

// Scan a buffer for FASTQ record boundaries.
//
// A record boundary lies after newline k (0-based, global line index
// lines_before + k) iff (lines_before + k + 1) % 4 == 0.  Returns the number
// of newlines in buf and writes the byte position *after* the last record
// boundary to *cut (-1 if none).  Mirrors io/chunker.py's numpy scan.
int64_t dsrc_scan_records(const uint8_t* buf, int64_t n,
                          int64_t lines_before, int64_t* cut) {
    int64_t count = 0;
    int64_t last = -1;
    const uint8_t* p = buf;
    const uint8_t* end = buf + n;
    // phase: how many more newlines until the next boundary
    int64_t phase = 3 - (lines_before & 3);
    while (p < end) {
        const uint8_t* nl =
            static_cast<const uint8_t*>(memchr(p, '\n', end - p));
        if (!nl) break;
        if (phase == 0) {
            last = (nl - buf) + 1;
            phase = 3;
        } else {
            --phase;
        }
        ++count;
        p = nl + 1;
    }
    *cut = last;
    return count;
}

// 2-bit pack: n (multiple of 4) symbols in [0,3] -> n/4 bytes.
void dsrc_pack2(const uint8_t* syms, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; i += 4) {
        out[i >> 2] = static_cast<uint8_t>(
            syms[i] | (syms[i + 1] << 2) | (syms[i + 2] << 4) |
            (syms[i + 3] << 6));
    }
}

void dsrc_unpack2(const uint8_t* packed, int64_t nbytes, uint8_t* out) {
    for (int64_t i = 0; i < nbytes; ++i) {
        uint8_t b = packed[i];
        out[4 * i] = b & 3;
        out[4 * i + 1] = (b >> 2) & 3;
        out[4 * i + 2] = (b >> 4) & 3;
        out[4 * i + 3] = (b >> 6) & 3;
    }
}

// Compact rANS payload rows: payload is [l][w_max] int32 holding u16 words;
// keep the first nwords[j] of each row, emitting little-endian u16.
// Returns total words written.
int64_t dsrc_compact_payload(const int32_t* payload, int64_t l,
                             int64_t w_max, const int32_t* nwords,
                             uint16_t* out) {
    int64_t k = 0;
    for (int64_t j = 0; j < l; ++j) {
        const int32_t* row = payload + j * w_max;
        int64_t nw = nwords[j];
        for (int64_t w = 0; w < nw; ++w) {
            out[k++] = static_cast<uint16_t>(row[w]);
        }
    }
    return k;
}

// Right-aligned variant: row j's words live at [w_max - nwords[j], w_max)
// (the device encoder's in-scan layout); emitted in that order.
int64_t dsrc_compact_payload_right(const int32_t* payload, int64_t l,
                                   int64_t w_max, const int32_t* nwords,
                                   uint16_t* out) {
    int64_t k = 0;
    for (int64_t j = 0; j < l; ++j) {
        const int32_t* row = payload + j * w_max;
        int64_t nw = nwords[j];
        for (int64_t w = w_max - nw; w < w_max; ++w) {
            out[k++] = static_cast<uint16_t>(row[w]);
        }
    }
    return k;
}

// Inverse: scatter a flat u16 word stream back into [l][w_max] rows.
void dsrc_expand_payload(const uint16_t* words, int64_t l, int64_t w_max,
                         const int32_t* nwords, int32_t* payload) {
    int64_t k = 0;
    for (int64_t j = 0; j < l; ++j) {
        int32_t* row = payload + j * w_max;
        int64_t nw = nwords[j];
        for (int64_t w = 0; w < nw; ++w) row[w] = words[k++];
        for (int64_t w = nw; w < w_max; ++w) row[w] = 0;
    }
}

}  // extern "C"
