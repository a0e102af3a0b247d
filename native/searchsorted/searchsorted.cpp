// Batched searchsorted over row-major matrices — CPU fallback op.
//
// Role parity with the reference's vendored torchsearchsorted extension
// (/root/reference/torchsearchsorted/src/cpu/searchsorted_cpu_wrapper.cpp):
// for each row, binary-search every query value in the sorted row of `a`.
// Row-broadcast: either input may have a single row reused across the other's
// rows (reference searchsorted.py:20-53 contract).
//
// On TPU the first-class implementation is the fused Pallas kernel
// (smpl_nerf_tpu/ops/sample_pdf_pallas.py); this extension exists for hosts
// without an accelerator and as an oracle cross-check. Exposed via ctypes —
// no pybind11 in this image.
//
// Build: make  (produces libsearchsorted.so)

#include <cstdint>

namespace {

template <typename T>
int64_t binary_search(const T* row, int64_t n, T value, bool right) {
  // index of the first element strictly greater than value (side='right'),
  // or the first element >= value (side='left')
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t mid = lo + (hi - lo) / 2;
    bool go_right = right ? !(value < row[mid]) : (row[mid] < value);
    if (go_right) {
      lo = mid + 1;
    } else {
      hi = mid;
    }
  }
  return lo;
}

template <typename T>
void searchsorted_impl(const T* a, int64_t a_rows, int64_t a_cols,
                       const T* v, int64_t v_rows, int64_t v_cols,
                       int64_t* out, bool right) {
  const int64_t rows = a_rows > v_rows ? a_rows : v_rows;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < rows; ++r) {
    const T* a_row = a + (a_rows == 1 ? 0 : r) * a_cols;
    const T* v_row = v + (v_rows == 1 ? 0 : r) * v_cols;
    int64_t* o_row = out + r * v_cols;
    for (int64_t c = 0; c < v_cols; ++c) {
      o_row[c] = binary_search(a_row, a_cols, v_row[c], right);
    }
  }
}

}  // namespace

extern "C" {

void searchsorted_f32(const float* a, int64_t a_rows, int64_t a_cols,
                      const float* v, int64_t v_rows, int64_t v_cols,
                      int64_t* out, int right) {
  searchsorted_impl<float>(a, a_rows, a_cols, v, v_rows, v_cols, out, right != 0);
}

void searchsorted_f64(const double* a, int64_t a_rows, int64_t a_cols,
                      const double* v, int64_t v_rows, int64_t v_cols,
                      int64_t* out, int right) {
  searchsorted_impl<double>(a, a_rows, a_cols, v, v_rows, v_cols, out, right != 0);
}

}  // extern "C"
