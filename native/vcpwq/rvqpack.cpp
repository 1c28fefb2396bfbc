// RVQ code-index bitstream packer with adaptive range coding (C API).
//
// The reference computes bitrate as the NOMINAL tokens/sec * n_books *
// log2(K) and never materializes actual bytes (reference:
// Training/compare_dacvsproposal_5.py:372-373 — "est_kbps"). This module is
// the real transmitter: it packs the [n_tokens, n_books] int32 code indices
// emitted by the RVQ (ops/rvq.py rvq_encode) into a byte stream and back.
//
// Each book gets an adaptive bit-tree model (LZMA construction, order-0):
// trained codebooks are used non-uniformly, so the adaptive coder lands at
// the empirical code entropy — at or below the nominal log2(K) bits/code —
// while a cold stream costs at most ~log2(K) + epsilon bits/code.
//
// Stream format ('RVQ1'):
//   magic 'RVQ1' | u32 n_tokens | u16 n_books | u16 n_bits(=log2 K)
//   | range-coded payload (token-major, book-minor)
//
// Build: part of libvcpwq.so (make -C native/vcpwq).

#include <cstdint>
#include <cstring>
#include <vector>

#include "rangecoder.h"

namespace {

bool is_pow2(uint32_t k) { return k != 0 && (k & (k - 1)) == 0; }

int log2i(uint32_t k) {
  int n = 0;
  while ((1u << n) < k) ++n;
  return n;
}

}  // namespace

extern "C" {

// Pack codes[n_tokens * n_books] (token-major) with values in [0, K).
// Returns bytes written to out, or -(needed) if cap is too small, or -1 on
// invalid arguments (K not a power of two, out-of-range code, ...).
int64_t rvq_pack(const int32_t* codes, int64_t n_tokens, int32_t n_books,
                 int32_t K, uint8_t* out, int64_t cap) {
  if (n_tokens < 0 || n_books <= 0 || n_books > 1024 || !is_pow2((uint32_t)K))
    return -1;
  const int n_bits = log2i((uint32_t)K);

  rc::Encoder enc;
  std::vector<uint16_t> probs((size_t)n_books << n_bits, rc::kProbInit);
  for (int64_t t = 0; t < n_tokens; ++t) {
    for (int32_t b = 0; b < n_books; ++b) {
      int32_t c = codes[t * n_books + b];
      if (c < 0 || c >= K) return -1;
      rc::bittree_encode(&enc, &probs[(size_t)b << n_bits], n_bits,
                         (uint32_t)c);
    }
  }
  enc.flush();

  const std::vector<uint8_t>& payload = enc.bytes();
  int64_t total = 12 + (int64_t)payload.size();
  if (total > cap) return -total;
  std::memcpy(out, "RVQ1", 4);
  uint32_t nt = (uint32_t)n_tokens;
  uint16_t nb = (uint16_t)n_books, bits = (uint16_t)n_bits;
  std::memcpy(out + 4, &nt, 4);
  std::memcpy(out + 8, &nb, 2);
  std::memcpy(out + 10, &bits, 2);
  std::memcpy(out + 12, payload.data(), payload.size());
  return total;
}

// Peek the header: fills n_tokens/n_books/K; returns 0 on success, -1 on a
// malformed stream.
int32_t rvq_peek(const uint8_t* data, int64_t size, int32_t* n_tokens,
                 int32_t* n_books, int32_t* K) {
  if (size < 12 || std::memcmp(data, "RVQ1", 4) != 0) return -1;
  uint32_t nt;
  uint16_t nb, bits;
  std::memcpy(&nt, data + 4, 4);
  std::memcpy(&nb, data + 8, 2);
  std::memcpy(&bits, data + 10, 2);
  if (bits > 20) return -1;
  *n_tokens = (int32_t)nt;
  *n_books = (int32_t)nb;
  *K = (int32_t)(1u << bits);
  return 0;
}

// Unpack into out[n_tokens * n_books] (token-major). Returns the number of
// int32 values written, -(needed) if cap too small, -1 on malformed stream.
int64_t rvq_unpack(const uint8_t* data, int64_t size, int32_t* out,
                   int64_t cap) {
  int32_t n_tokens, n_books, K;
  if (rvq_peek(data, size, &n_tokens, &n_books, &K) != 0) return -1;
  const int n_bits = log2i((uint32_t)K);
  int64_t total = (int64_t)n_tokens * n_books;
  if (total > cap) return -total;

  rc::Decoder dec(data + 12, (size_t)(size - 12));
  std::vector<uint16_t> probs((size_t)n_books << n_bits, rc::kProbInit);
  for (int64_t t = 0; t < n_tokens; ++t)
    for (int32_t b = 0; b < n_books; ++b)
      out[t * n_books + b] =
          (int32_t)rc::bittree_decode(&dec, &probs[(size_t)b << n_bits], n_bits);
  return total;
}

}  // extern "C"
