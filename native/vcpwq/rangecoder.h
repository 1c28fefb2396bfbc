// Adaptive binary range coder (LZMA-style) with a deterministic bit-cost
// counter, shared by the VC-PWQ v2 bitplane coder and the RVQ bitstream
// packer.
//
// The reference framework transmits RVQ code indices at the nominal
// tokens/sec * n_books * log2(K) rate (reference:
// Training/compare_dacvsproposal_5.py:372-373) and its external VC-PWQ C++
// codec writes raw (unmodeled) bitplane decisions. Both bit classes are
// strongly skewed, so context-adaptive arithmetic coding buys real bitrate:
// this coder models each binary decision with an 11-bit adaptive probability
// and emits ~entropy bits.
//
// Budget symmetry: embedded coders must truncate at a bit budget at the SAME
// decision on the encode and decode side. Arithmetic output bits are not in
// lockstep with decisions, so both sides instead accumulate a deterministic
// fixed-point (1/256 bit) cost counter derived from the model probability of
// each coded decision; probabilities evolve identically on both sides, hence
// so does the counter.

#ifndef VCPWQ_RANGECODER_H_
#define VCPWQ_RANGECODER_H_

#include <cmath>
#include <cstdint>
#include <vector>

namespace rc {

constexpr int kProbBits = 11;                     // probs in (0, 2048)
constexpr uint16_t kProbMax = 1u << kProbBits;    // 2048
constexpr uint16_t kProbInit = kProbMax >> 1;     // 1024 = p(0) = 0.5
constexpr int kMoveBits = 5;                      // adaptation rate
constexpr uint32_t kTopValue = 1u << 24;

// cost256[p] ~= -log2(p / 2048) * 256 for p in [1, 2047]; entry 0 unused.
// Encoder and decoder live in the same shared object, so one runtime-built
// table is identical on both sides.
inline const uint32_t* cost_table() {
  static uint32_t table[kProbMax];
  static bool init = false;
  if (!init) {
    table[0] = 0;
    for (uint32_t p = 1; p < kProbMax; ++p)
      table[p] = (uint32_t)std::lround(-std::log2((double)p / kProbMax) * 256.0);
    init = true;
  }
  return table;
}

class Encoder {
 public:
  // prob = adaptive probability of bit==0, updated in place.
  void encode(uint16_t* prob, int bit) {
    uint32_t bound = (range_ >> kProbBits) * (*prob);
    cost256_ += cost_table()[bit ? (kProbMax - *prob) : *prob];
    if (!bit) {
      range_ = bound;
      *prob += (kProbMax - *prob) >> kMoveBits;
    } else {
      low_ += bound;
      range_ -= bound;
      *prob -= *prob >> kMoveBits;
    }
    while (range_ < kTopValue) {
      shift_low();
      range_ <<= 8;
    }
  }

  // Equiprobable bit (signs, raw headers): exactly 1 bit of cost.
  void encode_raw(int bit) {
    range_ >>= 1;
    if (bit) low_ += range_;
    cost256_ += 256;
    while (range_ < kTopValue) {
      shift_low();
      range_ <<= 8;
    }
  }

  void encode_raw_bits(uint32_t value, int n_bits) {
    for (int b = n_bits - 1; b >= 0; --b) encode_raw((value >> b) & 1);
  }

  void flush() {
    for (int i = 0; i < 5; ++i) shift_low();
  }

  uint64_t cost256() const { return cost256_; }
  const std::vector<uint8_t>& bytes() const { return out_; }

 private:
  // Canonical LZMA shift-low: a leading dummy byte absorbs a possible final
  // carry; pending 0xFF bytes are held back until the carry is resolved.
  void shift_low() {
    if ((uint32_t)low_ < 0xFF000000u || (uint32_t)(low_ >> 32) != 0) {
      uint8_t carry = (uint8_t)(low_ >> 32);
      uint8_t b = cache_;
      do {
        out_.push_back((uint8_t)(b + carry));
        b = 0xFF;
      } while (--cache_size_ != 0);
      cache_ = (uint8_t)(low_ >> 24);
    }
    ++cache_size_;
    low_ = (low_ << 8) & 0xFFFFFFFFull;
  }

  uint64_t low_ = 0;
  uint32_t range_ = 0xFFFFFFFFu;
  uint8_t cache_ = 0;
  uint32_t cache_size_ = 1;
  uint64_t cost256_ = 0;
  std::vector<uint8_t> out_;
};

class Decoder {
 public:
  Decoder(const uint8_t* data, size_t size) : p_(data), n_(size) {
    // 5 bytes: the first is the encoder's dummy/carry byte (shifted out of
    // the 32-bit code), the next 4 seed the code register.
    for (int i = 0; i < 5; ++i) code_ = (code_ << 8) | next();
  }

  int decode(uint16_t* prob) {
    uint32_t bound = (range_ >> kProbBits) * (*prob);
    int bit;
    cost256_ += cost_table()[code_ < bound ? *prob : (kProbMax - *prob)];
    if (code_ < bound) {
      bit = 0;
      range_ = bound;
      *prob += (kProbMax - *prob) >> kMoveBits;
    } else {
      bit = 1;
      code_ -= bound;
      range_ -= bound;
      *prob -= *prob >> kMoveBits;
    }
    while (range_ < kTopValue) {
      code_ = (code_ << 8) | next();
      range_ <<= 8;
    }
    return bit;
  }

  int decode_raw() {
    range_ >>= 1;
    int bit = code_ >= range_;
    if (bit) code_ -= range_;
    cost256_ += 256;
    while (range_ < kTopValue) {
      code_ = (code_ << 8) | next();
      range_ <<= 8;
    }
    return bit;
  }

  uint32_t decode_raw_bits(int n_bits) {
    uint32_t v = 0;
    for (int b = 0; b < n_bits; ++b) v = (v << 1) | decode_raw();
    return v;
  }

  uint64_t cost256() const { return cost256_; }

 private:
  uint8_t next() { return pos_ < n_ ? p_[pos_++] : 0; }

  const uint8_t* p_;
  size_t n_;
  size_t pos_ = 0;
  uint32_t code_ = 0;
  uint32_t range_ = 0xFFFFFFFFu;
  uint64_t cost256_ = 0;
};

// Bit-tree coder for M-ary symbols (M a power of two, n_bits levels): the
// standard LZMA construction — one adaptive binary context per internal tree
// node, MSB first. probs must hold (1 << n_bits) entries initialized to
// kProbInit (index 0 unused).
inline void bittree_encode(Encoder* enc, uint16_t* probs, int n_bits,
                           uint32_t symbol) {
  uint32_t ctx = 1;
  for (int b = n_bits - 1; b >= 0; --b) {
    int bit = (symbol >> b) & 1;
    enc->encode(&probs[ctx], bit);
    ctx = (ctx << 1) | (uint32_t)bit;
  }
}

inline uint32_t bittree_decode(Decoder* dec, uint16_t* probs, int n_bits) {
  uint32_t ctx = 1;
  for (int b = 0; b < n_bits; ++b) ctx = (ctx << 1) | (uint32_t)dec->decode(&probs[ctx]);
  return ctx - (1u << n_bits);
}

}  // namespace rc

#endif  // VCPWQ_RANGECODER_H_
