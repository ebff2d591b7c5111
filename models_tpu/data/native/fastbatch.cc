// fastbatch: native batch-assembly kernels for the host data plane.
//
// Role of the reference's native merlin-dataloader core (C++/CUDA chunk
// assembly): the hot host-side loop here is ragged->padded conversion of list
// columns (values/offsets -> dense (B, L) + mask) and index-gather of shuffled
// rows. Both are fused, single-pass, cache-friendly loops in C++ — no numpy
// temporaries — built as a plain shared library and bound via ctypes
// (pybind11 is not available in this environment).
//
// Build: `make native` (gcc -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>

extern "C" {

// values (n_values, width) laid out row-major; offsets (batch+1);
// out (batch, max_len, width); mask (batch, max_len) as uint8.
// width=1 covers scalar-element lists; width>1 covers vector elements.
void pad_ragged_f32(const float* values, const int64_t* offsets, int64_t batch,
                    int64_t max_len, int64_t width, float* out, uint8_t* mask) {
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t start = offsets[b];
    int64_t n = offsets[b + 1] - start;
    if (n > max_len) n = max_len;
    float* out_row = out + b * max_len * width;
    uint8_t* mask_row = mask + b * max_len;
    std::memcpy(out_row, values + start * width, n * width * sizeof(float));
    std::memset(out_row + n * width, 0, (max_len - n) * width * sizeof(float));
    std::memset(mask_row, 1, n);
    std::memset(mask_row + n, 0, max_len - n);
  }
}

void pad_ragged_i32(const int32_t* values, const int64_t* offsets, int64_t batch,
                    int64_t max_len, int64_t width, int32_t* out, uint8_t* mask) {
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t start = offsets[b];
    int64_t n = offsets[b + 1] - start;
    if (n > max_len) n = max_len;
    int32_t* out_row = out + b * max_len * width;
    uint8_t* mask_row = mask + b * max_len;
    std::memcpy(out_row, values + start * width, n * width * sizeof(int32_t));
    std::memset(out_row + n * width, 0, (max_len - n) * width * sizeof(int32_t));
    std::memset(mask_row, 1, n);
    std::memset(mask_row + n, 0, max_len - n);
  }
}

void pad_ragged_i64(const int64_t* values, const int64_t* offsets, int64_t batch,
                    int64_t max_len, int64_t width, int64_t* out, uint8_t* mask) {
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t start = offsets[b];
    int64_t n = offsets[b + 1] - start;
    if (n > max_len) n = max_len;
    int64_t* out_row = out + b * max_len * width;
    uint8_t* mask_row = mask + b * max_len;
    std::memcpy(out_row, values + start * width, n * width * sizeof(int64_t));
    std::memset(out_row + n * width, 0, (max_len - n) * width * sizeof(int64_t));
    std::memset(mask_row, 1, n);
    std::memset(mask_row + n, 0, max_len - n);
  }
}

// gather rows of a (n, width) matrix by index — the shuffle/epoch-permutation
// path (replaces arrow Table.take for flat numeric columns).
void gather_rows_f32(const float* src, const int64_t* idx, int64_t n_idx,
                     int64_t width, float* out) {
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(out + i * width, src + idx[i] * width, width * sizeof(float));
  }
}

void gather_rows_i32(const int32_t* src, const int64_t* idx, int64_t n_idx,
                     int64_t width, int32_t* out) {
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(out + i * width, src + idx[i] * width, width * sizeof(int32_t));
  }
}

}  // extern "C"
