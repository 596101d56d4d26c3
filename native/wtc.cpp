// whisper-tensor-tpu native core (wtc): hot host-side kernels.
//
// Reference equivalent: the Rust native layer of computer-whisperer/
// whisper-tensor (packed_tensor dequant, weight IO). On TPU the device
// compute path is XLA/Pallas; this module accelerates the *host* side:
// GGUF block dequantization and int8 weight quantization, which dominate
// checkpoint load time for large quantized models.
//
// Build: make -C native    (produces libwtc.so; loaded via ctypes)

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// fp16 -> f32 (scalar; called per block scale)
// ---------------------------------------------------------------------------
static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {
            // subnormal
            int e = -1;
            do { mant <<= 1; e++; } while (!(mant & 0x400));
            mant &= 0x3FF;
            bits = sign | ((uint32_t)(127 - 15 - e) << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

// ---------------------------------------------------------------------------
// legacy block formats (block = 32 elements)
// ---------------------------------------------------------------------------

// Q4_0: [f16 d][16 bytes nibbles]; low nibbles first 16, high next 16
int wtc_dequant_q4_0(const uint8_t* data, int64_t nblocks, float* out) {
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* p = data + b * 18;
        float d = f16_to_f32(*(const uint16_t*)p);
        const uint8_t* q = p + 2;
        float* o = out + b * 32;
        for (int i = 0; i < 16; i++) {
            o[i] = ((int)(q[i] & 0x0F) - 8) * d;
            o[i + 16] = ((int)(q[i] >> 4) - 8) * d;
        }
    }
    return 0;
}

// Q4_1: [f16 d][f16 m][16 bytes]
int wtc_dequant_q4_1(const uint8_t* data, int64_t nblocks, float* out) {
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* p = data + b * 20;
        float d = f16_to_f32(*(const uint16_t*)p);
        float m = f16_to_f32(*(const uint16_t*)(p + 2));
        const uint8_t* q = p + 4;
        float* o = out + b * 32;
        for (int i = 0; i < 16; i++) {
            o[i] = (float)(q[i] & 0x0F) * d + m;
            o[i + 16] = (float)(q[i] >> 4) * d + m;
        }
    }
    return 0;
}

// Q5_0: [f16 d][u32 qh][16 bytes]
int wtc_dequant_q5_0(const uint8_t* data, int64_t nblocks, float* out) {
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* p = data + b * 22;
        float d = f16_to_f32(*(const uint16_t*)p);
        uint32_t qh;
        std::memcpy(&qh, p + 2, 4);
        const uint8_t* q = p + 6;
        float* o = out + b * 32;
        for (int i = 0; i < 16; i++) {
            int lo = (q[i] & 0x0F) | (int)(((qh >> i) & 1) << 4);
            int hi = (q[i] >> 4) | (int)(((qh >> (i + 16)) & 1) << 4);
            o[i] = (lo - 16) * d;
            o[i + 16] = (hi - 16) * d;
        }
    }
    return 0;
}

// Q5_1: [f16 d][f16 m][u32 qh][16 bytes]
int wtc_dequant_q5_1(const uint8_t* data, int64_t nblocks, float* out) {
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* p = data + b * 24;
        float d = f16_to_f32(*(const uint16_t*)p);
        float m = f16_to_f32(*(const uint16_t*)(p + 2));
        uint32_t qh;
        std::memcpy(&qh, p + 4, 4);
        const uint8_t* q = p + 8;
        float* o = out + b * 32;
        for (int i = 0; i < 16; i++) {
            int lo = (q[i] & 0x0F) | (int)(((qh >> i) & 1) << 4);
            int hi = (q[i] >> 4) | (int)(((qh >> (i + 16)) & 1) << 4);
            o[i] = lo * d + m;
            o[i + 16] = hi * d + m;
        }
    }
    return 0;
}

// Q8_0: [f16 d][32 int8]
int wtc_dequant_q8_0(const uint8_t* data, int64_t nblocks, float* out) {
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* p = data + b * 34;
        float d = f16_to_f32(*(const uint16_t*)p);
        const int8_t* q = (const int8_t*)(p + 2);
        float* o = out + b * 32;
        for (int i = 0; i < 32; i++) o[i] = q[i] * d;
    }
    return 0;
}

// Q8_1: [f16 d][f16 s][32 int8]
int wtc_dequant_q8_1(const uint8_t* data, int64_t nblocks, float* out) {
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* p = data + b * 36;
        float d = f16_to_f32(*(const uint16_t*)p);
        const int8_t* q = (const int8_t*)(p + 4);
        float* o = out + b * 32;
        for (int i = 0; i < 32; i++) o[i] = q[i] * d;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// K-quants (super-block = 256 elements)
// ---------------------------------------------------------------------------

// Q4_K: [f16 d][f16 dmin][12B scales][128B nibbles]
int wtc_dequant_q4_k(const uint8_t* data, int64_t nblocks, float* out) {
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* p = data + b * 144;
        float d = f16_to_f32(*(const uint16_t*)p);
        float dmin = f16_to_f32(*(const uint16_t*)(p + 2));
        const uint8_t* s = p + 4;
        const uint8_t* qs = p + 16;
        float sc[8], mn[8];
        for (int j = 0; j < 8; j++) {
            if (j < 4) {
                sc[j] = (float)(s[j] & 63);
                mn[j] = (float)(s[j + 4] & 63);
            } else {
                sc[j] = (float)((s[j + 4] & 0x0F) | ((s[j - 4] >> 6) << 4));
                mn[j] = (float)((s[j + 4] >> 4) | ((s[j] >> 6) << 4));
            }
        }
        float* o = out + b * 256;
        for (int l = 0; l < 256; l++) {
            int byte_idx = 32 * (l / 64) + (l % 32);
            int shift = 4 * ((l % 64) / 32);
            int q = (qs[byte_idx] >> shift) & 0x0F;
            int g = l / 32;
            o[l] = d * sc[g] * q - dmin * mn[g];
        }
    }
    return 0;
}

// Q6_K: [128B ql][64B qh][16 int8 scales][f16 d]
int wtc_dequant_q6_k(const uint8_t* data, int64_t nblocks, float* out) {
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* p = data + b * 210;
        const uint8_t* ql = p;
        const uint8_t* qh = p + 128;
        const int8_t* sc = (const int8_t*)(p + 192);
        float d = f16_to_f32(*(const uint16_t*)(p + 208));
        float* o = out + b * 256;
        for (int l = 0; l < 256; l++) {
            int half = l / 128, lh = l % 128;
            int ql_idx = 64 * half + (lh % 64);
            int ql_shift = 4 * (lh / 64);
            int qh_idx = 32 * half + (lh % 32);
            int qh_shift = 2 * (lh / 32);
            int lo = (ql[ql_idx] >> ql_shift) & 0x0F;
            int hi = (qh[qh_idx] >> qh_shift) & 3;
            int q = (lo | (hi << 4)) - 32;
            o[l] = d * sc[l / 16] * q;
        }
    }
    return 0;
}

// Q8_K: [f32 d][256 int8][32B bsums]
int wtc_dequant_q8_k(const uint8_t* data, int64_t nblocks, float* out) {
    for (int64_t b = 0; b < nblocks; b++) {
        const uint8_t* p = data + b * 292;
        float d;
        std::memcpy(&d, p, 4);
        const int8_t* q = (const int8_t*)(p + 4);
        float* o = out + b * 256;
        for (int i = 0; i < 256; i++) o[i] = q[i] * d;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// int8 per-output-channel symmetric quantization: w (K, N) row-major
// ---------------------------------------------------------------------------
int wtc_quantize_int8(const float* w, int64_t K, int64_t N,
                      int8_t* q, float* scale) {
    for (int64_t n = 0; n < N; n++) {
        float amax = 0.f;
        for (int64_t k = 0; k < K; k++) {
            float v = std::fabs(w[k * N + n]);
            if (v > amax) amax = v;
        }
        scale[n] = amax > 0.f ? amax / 127.f : 1.f;
    }
    for (int64_t k = 0; k < K; k++) {
        const float* row = w + k * N;
        int8_t* qrow = q + k * N;
        for (int64_t n = 0; n < N; n++) {
            float v = std::nearbyint(row[n] / scale[n]);
            if (v > 127.f) v = 127.f;
            if (v < -127.f) v = -127.f;
            qrow[n] = (int8_t)v;
        }
    }
    return 0;
}

}  // extern "C"
