// Native host-side preprocessing kernels for sslrec_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the
// host-side graph preprocessing that the reference delegates to python loops
// (padded-row extraction, data_utils/*; sampled co-occurrence metapath
// construction, data_utils/data_handler_social.py:139-213).  Exposed via
// ctypes (no pybind11 in this image); every entry point is plain C ABI over
// caller-allocated buffers.
//
// Build: g++ -O3 -march=native -shared -fPIC preprocess.cpp -o libsslrec_native.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// Pad CSR rows into a dense [n_rows, width] column matrix + mask.
// indptr: [n_rows+1], indices: [nnz]; out_cols/out_mask: [n_rows*width]
// (zero-initialised by the caller), out_lengths: [n_rows].
void padded_rows(const int64_t* indptr, const int32_t* indices,
                 int64_t n_rows, int64_t width,
                 int32_t* out_cols, uint8_t* out_mask, int32_t* out_lengths) {
  for (int64_t r = 0; r < n_rows; ++r) {
    const int64_t s = indptr[r], e = indptr[r + 1];
    const int64_t k = (e - s) < width ? (e - s) : width;
    out_lengths[r] = static_cast<int32_t>(e - s);
    int32_t* row_cols = out_cols + r * width;
    uint8_t* row_mask = out_mask + r * width;
    for (int64_t j = 0; j < k; ++j) {
      row_cols[j] = indices[s + j];
      row_mask[j] = 1;
    }
  }
}

// Row-subsampled co-occurrence edge list: for each row i of a CSR co-occurrence
// matrix, keep floor(nnz_i * rate) uniformly sampled (without replacement)
// column ids.  Returns the number of edges written (<= capacity).
// out_rows/out_cols must have capacity >= sum_i floor(nnz_i * rate) + n_rows.
int64_t sampled_cooc_edges(const int64_t* indptr, const int32_t* indices,
                           int64_t n_rows, double rate, uint64_t seed,
                           int32_t* out_rows, int32_t* out_cols,
                           int64_t capacity) {
  std::mt19937_64 rng(seed);
  std::vector<int32_t> buf;
  int64_t written = 0;
  for (int64_t i = 0; i < n_rows; ++i) {
    const int64_t s = indptr[i], e = indptr[i + 1];
    const int64_t deg = e - s;
    if (deg == 0) continue;
    int64_t k = static_cast<int64_t>(deg * rate);
    if (k <= 0) continue;
    if (k > deg) k = deg;
    // partial Fisher-Yates over a scratch copy of the row
    buf.assign(indices + s, indices + e);
    for (int64_t j = 0; j < k; ++j) {
      std::uniform_int_distribution<int64_t> dist(j, deg - 1);
      std::swap(buf[j], buf[dist(rng)]);
      if (written >= capacity) return written;
      out_rows[written] = static_cast<int32_t>(i);
      out_cols[written] = buf[j];
      ++written;
    }
  }
  return written;
}

// Host-side rejection negative sampler (fallback / validation tool):
// for each (user) draw an item uniformly in [low, n_items) not present in the
// user's CSR row (sorted indices), up to `rounds` redraws.
void reject_negatives(const int64_t* indptr, const int32_t* indices,
                      const int32_t* users, int64_t n,
                      int32_t n_items, int32_t low, int32_t rounds,
                      uint64_t seed, int32_t* out) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int32_t> dist(low, n_items - 1);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t u = users[i];
    const int32_t* beg = indices + indptr[u];
    const int32_t* end = indices + indptr[u + 1];
    int32_t cand = dist(rng);
    for (int32_t r = 0; r < rounds; ++r) {
      bool hit = std::binary_search(beg, end, cand);
      if (!hit) break;
      cand = dist(rng);
    }
    out[i] = cand;
  }
}

// Consecutive-pair transition edges from left-padded sequences (DCRec/MAERec
// graph construction): emits both directions of (seq[t], seq[t-dist]) for
// dist in [1, max_dist]; skips pad id 0.  Returns edges written.
int64_t transition_pairs(const int32_t* seqs, int64_t n_rows, int64_t seq_len,
                         int32_t max_dist, int32_t* out_a, int32_t* out_b,
                         int64_t capacity) {
  int64_t written = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    const int32_t* s = seqs + r * seq_len;
    for (int32_t d = 1; d <= max_dist; ++d) {
      for (int64_t t = d; t < seq_len; ++t) {
        const int32_t a = s[t], b = s[t - d];
        if (a <= 0 || b <= 0) continue;
        if (written + 2 > capacity) return written;
        out_a[written] = a; out_b[written] = b; ++written;
        out_a[written] = b; out_b[written] = a; ++written;
      }
    }
  }
  return written;
}

}  // extern "C"
