// VC-PWQ-style vibrotactile baseline codec (C++).
//
// The reference never ships this codec: it only READS the output files of an
// externally built C++ VC-PWQ program ("*_{b}.wav" decoded + "*_{b}.binary"
// compressed, reference: Evaluation/dac_vcpwq_proposed.py:89-90, :550-597).
// This implementation provides a self-contained codec with the same interface
// and the same algorithmic family described in the VC-PWQ paper:
//
//   - block-based coding (default 512 samples, ~183 ms at 2.8 kHz,
//     reference buffer constant: Evaluation/dac_vcpwq_proposed6_latency.py:120-123)
//   - CDF 9/7 wavelet transform (lifting implementation)
//   - perceptual bit allocation from a vibrotactile sensitivity curve
//     (U-shaped threshold with peak sensitivity near 250 Hz)
//   - embedded bitplane coding truncated at a per-block bit budget "b"
//
// File format (.binary):
//   magic 'VPWQ' | u32 sample_rate | u32 block_len | u32 n_samples | u32 b
//   per block: u8 msb_plane | payload bits (byte aligned per block)
//
// Build: make -C native/vcpwq    (produces vcpwq_codec CLI + libvcpwq.so)

// v2 stream ('VPW2' magic): same wavelet/perceptual-weight/bitplane decision
// structure, but every decision is coded with the adaptive binary range coder
// (rangecoder.h) in ONE stream for the whole file, contexts carried across
// blocks. The per-block bit budget is enforced with the coder's deterministic
// model-cost counter (identical on both sides), so the same decisions are
// made but each costs ~its entropy — more planes fit a given budget, and the
// emitted bytes drop well below the nominal budget.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "rangecoder.h"

namespace vcpwq {

// ----------------------------------------------------------------- bit IO

class BitWriter {
 public:
  void put(int bit) {
    if (bit) cur_ |= (1u << (7 - n_));
    if (++n_ == 8) { bytes_.push_back(cur_); cur_ = 0; n_ = 0; }
  }
  void align() { while (n_ != 0) put(0); }
  size_t bits() const { return bytes_.size() * 8 + n_; }
  const std::vector<uint8_t>& done() { align(); return bytes_; }

 private:
  std::vector<uint8_t> bytes_;
  uint8_t cur_ = 0;
  int n_ = 0;
};

class BitReader {
 public:
  BitReader(const uint8_t* p, size_t n) : p_(p), n_(n) {}
  int get() {
    if (pos_ >= n_ * 8) return 0;  // budget-truncated tail reads as zero
    int bit = (p_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1;
    ++pos_;
    return bit;
  }
  void align() { pos_ = (pos_ + 7) & ~size_t(7); }

 private:
  const uint8_t* p_;
  size_t n_;
  size_t pos_ = 0;
};

// ----------------------------------------------------- CDF 9/7 lifting DWT

static const double A1 = -1.586134342059924;
static const double A2 = -0.052980118572961;
static const double A3 = 0.882911075530934;
static const double A4 = 0.443506852043971;
static const double K = 1.230174104914001;

static void dwt97_step(std::vector<double>& x, int n) {
  // lifting on x[0..n): even->approx, odd->detail (with symmetric extension)
  auto at = [&](int i) -> double& {
    if (i < 0) i = -i;
    if (i >= n) i = 2 * n - 2 - i;
    return x[i];
  };
  for (int i = 1; i < n; i += 2) x[i] += A1 * (at(i - 1) + at(i + 1));
  for (int i = 0; i < n; i += 2) x[i] += A2 * (at(i - 1) + at(i + 1));
  for (int i = 1; i < n; i += 2) x[i] += A3 * (at(i - 1) + at(i + 1));
  for (int i = 0; i < n; i += 2) x[i] += A4 * (at(i - 1) + at(i + 1));
  std::vector<double> tmp(n);
  for (int i = 0; i < n; ++i) {
    if (i % 2 == 0) tmp[i / 2] = x[i] * K;          // approximation
    else tmp[n / 2 + i / 2] = x[i] / K;             // detail
  }
  x.assign(tmp.begin(), tmp.end());
}

static void idwt97_step(std::vector<double>& x, int n) {
  std::vector<double> tmp(n);
  for (int i = 0; i < n; ++i) {
    if (i % 2 == 0) tmp[i] = x[i / 2] / K;
    else tmp[i] = x[n / 2 + i / 2] * K;
  }
  x.assign(tmp.begin(), tmp.end());
  auto at = [&](int i) -> double& {
    if (i < 0) i = -i;
    if (i >= n) i = 2 * n - 2 - i;
    return x[i];
  };
  for (int i = 0; i < n; i += 2) x[i] -= A4 * (at(i - 1) + at(i + 1));
  for (int i = 1; i < n; i += 2) x[i] -= A3 * (at(i - 1) + at(i + 1));
  for (int i = 0; i < n; i += 2) x[i] -= A2 * (at(i - 1) + at(i + 1));
  for (int i = 1; i < n; i += 2) x[i] -= A1 * (at(i - 1) + at(i + 1));
}

static int wavelet_levels(int n) {
  int levels = 0;
  while (n >= 16 && levels < 6) { n /= 2; ++levels; }
  return levels;
}

void dwt97_forward(std::vector<double>& x, int levels) {
  int n = (int)x.size();
  for (int l = 0; l < levels; ++l) {
    std::vector<double> head(x.begin(), x.begin() + n);
    dwt97_step(head, n);
    std::copy(head.begin(), head.end(), x.begin());
    n /= 2;
  }
}

void dwt97_inverse(std::vector<double>& x, int levels) {
  int full = (int)x.size();
  int n = full >> (levels - 1);
  for (int l = 0; l < levels; ++l) {
    std::vector<double> head(x.begin(), x.begin() + n);
    idwt97_step(head, n);
    std::copy(head.begin(), head.end(), x.begin());
    n *= 2;
  }
}

// ------------------------------------------------- perceptual bit allocation

// Vibrotactile sensitivity: U-shaped absolute threshold with maximum
// sensitivity around 250 Hz (Pacinian channel). Coefficients in more sensitive
// bands get larger weights => quantized earlier / finer.
static double perceptual_weight(double freq_hz) {
  if (freq_hz < 1.0) freq_hz = 1.0;
  double octaves = std::log2(freq_hz / 250.0);
  double threshold_db = 8.0 * octaves * octaves;   // parabola in log-frequency
  if (threshold_db > 40.0) threshold_db = 40.0;
  return std::pow(10.0, -threshold_db / 20.0);     // weight = 1/threshold
}

static void band_weights(int n, int levels, int sample_rate,
                         std::vector<double>* w) {
  w->assign(n, 1.0);
  double nyq = sample_rate * 0.5;
  // approximation band occupies [0, nyq/2^levels); details above it
  int approx = n >> levels;
  for (int i = 0; i < approx; ++i)
    (*w)[i] = perceptual_weight(nyq / (1 << levels) * 0.5);
  for (int l = levels; l >= 1; --l) {
    int lo = n >> l, hi = n >> (l - 1);
    double f_center = nyq / (1 << l) * 1.5;
    for (int i = lo; i < hi; ++i) (*w)[i] = perceptual_weight(f_center);
  }
}

// --------------------------------------------------------- bitplane coding

// Embedded significance + refinement coding, truncated at budget_bits.
static void encode_block(const float* x, int n, int sample_rate,
                         int budget_bits, BitWriter* bw, uint8_t* msb_out) {
  int levels = wavelet_levels(n);
  std::vector<double> c(x, x + n);
  dwt97_forward(c, levels);
  std::vector<double> w;
  band_weights(n, levels, sample_rate, &w);
  for (int i = 0; i < n; ++i) c[i] *= w[i];

  double cmax = 0.0;
  for (int i = 0; i < n; ++i) cmax = std::max(cmax, std::fabs(c[i]));
  int msb = 0;
  // scale so coefficients fit in [0, 2^15): quantized integers
  double scale = (cmax > 0) ? (32767.0 / cmax) : 1.0;
  std::vector<int32_t> q(n);
  for (int i = 0; i < n; ++i) q[i] = (int32_t)std::lround(c[i] * scale);
  int32_t amax = 0;
  for (int i = 0; i < n; ++i) amax = std::max(amax, std::abs(q[i]));
  while ((1 << (msb + 1)) <= amax) ++msb;
  *msb_out = (uint8_t)msb;

  // store cmax as 16-bit log-quantized gain inside the stream head
  // gain code: round(log2(cmax + 1e-12) * 256) clamped to int16
  double lg = (cmax > 0) ? std::log2(cmax) : -30.0;
  int32_t gain_code = (int32_t)std::lround(lg * 256.0);
  if (gain_code > 32767) gain_code = 32767;
  if (gain_code < -32768) gain_code = -32768;
  for (int b = 15; b >= 0; --b) bw->put((gain_code >> b) & 1);

  // Group-significance (zerotree-lite) bitplane coding: coefficients are
  // scanned in 16-coefficient groups; a still-insignificant group costs one
  // bit per plane, so the tiny budgets (b=8 => 192 bits) go to the loud
  // perceptually-weighted low bands instead of a flat 512-bit significance scan.
  const int G = 16;
  int n_groups = (n + G - 1) / G;
  std::vector<uint8_t> significant(n, 0);
  std::vector<uint8_t> group_sig(n_groups, 0);
  size_t start_bits = bw->bits();
  auto left = [&]() {
    return (bw->bits() - start_bits) < (size_t)budget_bits;
  };
  for (int plane = msb; plane >= 0 && left(); --plane) {
    for (int g = 0; g < n_groups && left(); ++g) {
      int lo = g * G, hi = std::min(n, lo + G);
      if (!group_sig[g]) {
        int any = 0;
        for (int i = lo; i < hi; ++i)
          if (std::abs(q[i]) >> plane) { any = 1; break; }
        bw->put(any);
        if (!any) continue;
        group_sig[g] = 1;
      }
      for (int i = lo; i < hi && left(); ++i) {
        int32_t a = std::abs(q[i]);
        if (!significant[i]) {
          int sig = ((a >> plane) & 1) && (a >> (plane + 1)) == 0;
          bw->put(sig);
          if (sig) {
            bw->put(q[i] < 0);
            significant[i] = 1;
          }
        } else {
          bw->put((a >> plane) & 1);  // refinement
        }
      }
    }
  }
  bw->align();
}

static void decode_block(BitReader* br, int n, int sample_rate, int budget_bits,
                         uint8_t msb, float* out) {
  int levels = wavelet_levels(n);
  // gain
  int32_t gain_code = 0;
  for (int b = 0; b < 16; ++b) gain_code = (gain_code << 1) | br->get();
  gain_code = (int16_t)gain_code;  // sign-extend
  double cmax = std::pow(2.0, gain_code / 256.0);
  double scale = 32767.0 / (cmax > 0 ? cmax : 1.0);

  const int G = 16;
  int n_groups = (n + G - 1) / G;
  std::vector<int32_t> q(n, 0);
  std::vector<uint8_t> significant(n, 0);
  std::vector<uint8_t> group_sig(n_groups, 0);
  std::vector<int8_t> sign(n, 1);
  size_t used = 0;
  auto left = [&]() { return used < (size_t)budget_bits; };
  for (int plane = msb; plane >= 0 && left(); --plane) {
    for (int g = 0; g < n_groups && left(); ++g) {
      int lo = g * G, hi = std::min(n, lo + G);
      if (!group_sig[g]) {
        int any = br->get();
        ++used;
        if (!any) continue;
        group_sig[g] = 1;
      }
      for (int i = lo; i < hi && left(); ++i) {
        if (!significant[i]) {
          int sig = br->get();
          ++used;
          if (sig) {
            sign[i] = br->get() ? -1 : 1;
            ++used;
            significant[i] = 1;
            q[i] = (1 << plane) + (plane > 0 ? (1 << (plane - 1)) : 0);
          }
        } else {
          int bit = br->get();
          ++used;
          if (bit) q[i] |= (1 << plane);
          else q[i] &= ~(1 << plane);
          if (plane > 0) {
            q[i] = (q[i] & ~((1 << plane) - 1)) | (1 << (plane - 1));
          }
        }
      }
    }
  }
  br->align();

  std::vector<double> c(n);
  std::vector<double> w;
  band_weights(n, levels, sample_rate, &w);
  for (int i = 0; i < n; ++i)
    c[i] = sign[i] * (double)q[i] / scale / w[i];
  dwt97_inverse(c, levels);
  for (int i = 0; i < n; ++i) out[i] = (float)c[i];
}

// --------------------------------------------- v2: range-coded bitplanes

// Shared quantization prep: DWT + perceptual weights + integer quantization.
struct QuantBlock {
  std::vector<int32_t> q;
  int msb;
  int32_t gain_code;
};

static void quantize_block(const float* x, int n, int sample_rate,
                           QuantBlock* out) {
  int levels = wavelet_levels(n);
  std::vector<double> c(x, x + n);
  dwt97_forward(c, levels);
  std::vector<double> w;
  band_weights(n, levels, sample_rate, &w);
  for (int i = 0; i < n; ++i) c[i] *= w[i];
  double cmax = 0.0;
  for (int i = 0; i < n; ++i) cmax = std::max(cmax, std::fabs(c[i]));
  double scale = (cmax > 0) ? (32767.0 / cmax) : 1.0;
  out->q.resize(n);
  for (int i = 0; i < n; ++i) out->q[i] = (int32_t)std::lround(c[i] * scale);
  int32_t amax = 0;
  for (int i = 0; i < n; ++i) amax = std::max(amax, std::abs(out->q[i]));
  out->msb = 0;
  while ((1 << (out->msb + 1)) <= amax) ++out->msb;
  double lg = (cmax > 0) ? std::log2(cmax) : -30.0;
  int32_t gain_code = (int32_t)std::lround(lg * 256.0);
  if (gain_code > 32767) gain_code = 32767;
  if (gain_code < -32768) gain_code = -32768;
  out->gain_code = gain_code;
}

static void reconstruct_block(const std::vector<int32_t>& q,
                              const std::vector<int8_t>& sign,
                              int32_t gain_code, int n, int sample_rate,
                              float* out) {
  int levels = wavelet_levels(n);
  double cmax = std::pow(2.0, gain_code / 256.0);
  double scale = 32767.0 / (cmax > 0 ? cmax : 1.0);
  std::vector<double> c(n);
  std::vector<double> w;
  band_weights(n, levels, sample_rate, &w);
  for (int i = 0; i < n; ++i) c[i] = sign[i] * (double)q[i] / scale / w[i];
  dwt97_inverse(c, levels);
  for (int i = 0; i < n; ++i) out[i] = (float)c[i];
}

// Adaptive contexts shared across all blocks of a stream.
struct V2Contexts {
  uint16_t group = rc::kProbInit;   // group-significance decisions
  uint16_t sig[2] = {rc::kProbInit, rc::kProbInit};  // ctx: left-neighbor sig
  uint16_t ref = rc::kProbInit;     // refinement bits
};

static const int kGroup = 16;

std::vector<uint8_t> encode_v2(const float* x, uint32_t n,
                               uint32_t sample_rate, uint32_t block_len,
                               uint32_t b);
std::vector<float> decode_v2(const uint8_t* data, size_t size);

// ------------------------------------------------------------ stream codec

struct Header {
  uint32_t sample_rate, block_len, n_samples, b;
};

std::vector<uint8_t> encode(const float* x, uint32_t n, uint32_t sample_rate,
                            uint32_t block_len, uint32_t b) {
  // bit budget per block scales linearly with the quality parameter b
  int budget_bits = (int)(b * 24);
  uint32_t n_blocks = (n + block_len - 1) / block_len;

  std::vector<uint8_t> out;
  out.insert(out.end(), {'V', 'P', 'W', 'Q'});
  Header h{sample_rate, block_len, n, b};
  const uint8_t* hp = reinterpret_cast<const uint8_t*>(&h);
  out.insert(out.end(), hp, hp + sizeof(h));

  std::vector<float> block(block_len);
  for (uint32_t bi = 0; bi < n_blocks; ++bi) {
    uint32_t s = bi * block_len;
    uint32_t len = std::min(block_len, n - s);
    std::fill(block.begin(), block.end(), 0.0f);
    std::memcpy(block.data(), x + s, len * sizeof(float));

    BitWriter bw;
    uint8_t msb = 0;
    encode_block(block.data(), (int)block_len, (int)sample_rate, budget_bits,
                 &bw, &msb);
    const std::vector<uint8_t>& payload = bw.done();
    uint16_t nbytes = (uint16_t)payload.size();
    out.push_back(msb);
    out.push_back((uint8_t)(nbytes & 0xff));
    out.push_back((uint8_t)(nbytes >> 8));
    out.insert(out.end(), payload.begin(), payload.end());
  }
  return out;
}

std::vector<uint8_t> encode_v2(const float* x, uint32_t n,
                               uint32_t sample_rate, uint32_t block_len,
                               uint32_t b) {
  // Same per-block decision budget as v1 (b*24 model-cost bits), but coded
  // decisions cost their entropy, so more planes land inside the budget.
  const uint64_t budget256 = (uint64_t)(b * 24) * 256;
  uint32_t n_blocks = (n + block_len - 1) / block_len;

  std::vector<uint8_t> out;
  out.insert(out.end(), {'V', 'P', 'W', '2'});
  Header h{sample_rate, block_len, n, b};
  const uint8_t* hp = reinterpret_cast<const uint8_t*>(&h);
  out.insert(out.end(), hp, hp + sizeof(h));

  rc::Encoder enc;
  V2Contexts cx;
  const int bl = (int)block_len;
  int n_groups = (bl + kGroup - 1) / kGroup;
  std::vector<float> block(block_len);
  std::vector<uint8_t> significant(bl), group_sig(n_groups);

  for (uint32_t bi = 0; bi < n_blocks; ++bi) {
    uint32_t s = bi * block_len;
    uint32_t len = std::min(block_len, n - s);
    std::fill(block.begin(), block.end(), 0.0f);
    std::memcpy(block.data(), x + s, len * sizeof(float));

    QuantBlock qb;
    quantize_block(block.data(), bl, (int)sample_rate, &qb);
    enc.encode_raw_bits((uint16_t)qb.gain_code, 16);
    enc.encode_raw_bits((uint32_t)qb.msb, 5);

    std::fill(significant.begin(), significant.end(), 0);
    std::fill(group_sig.begin(), group_sig.end(), 0);
    uint64_t start = enc.cost256();
    auto left = [&]() { return enc.cost256() - start < budget256; };

    for (int plane = qb.msb; plane >= 0 && left(); --plane) {
      for (int g = 0; g < n_groups && left(); ++g) {
        int lo = g * kGroup, hi = std::min(bl, lo + kGroup);
        if (!group_sig[g]) {
          int any = 0;
          for (int i = lo; i < hi; ++i)
            if (std::abs(qb.q[i]) >> plane) { any = 1; break; }
          enc.encode(&cx.group, any);
          if (!any) continue;
          group_sig[g] = 1;
        }
        for (int i = lo; i < hi && left(); ++i) {
          int32_t a = std::abs(qb.q[i]);
          if (!significant[i]) {
            int sig = ((a >> plane) & 1) && (a >> (plane + 1)) == 0;
            int ctx = (i > lo && significant[i - 1]) ? 1 : 0;
            enc.encode(&cx.sig[ctx], sig);
            if (sig) {
              enc.encode_raw(qb.q[i] < 0);
              significant[i] = 1;
            }
          } else {
            enc.encode(&cx.ref, (a >> plane) & 1);
          }
        }
      }
    }
  }
  enc.flush();
  out.insert(out.end(), enc.bytes().begin(), enc.bytes().end());
  return out;
}

std::vector<float> decode_v2(const uint8_t* data, size_t size) {
  if (size < 4 + sizeof(Header) || std::memcmp(data, "VPW2", 4) != 0)
    return {};
  Header h;
  std::memcpy(&h, data + 4, sizeof(h));
  const uint64_t budget256 = (uint64_t)(h.b * 24) * 256;
  size_t pos = 4 + sizeof(h);
  uint32_t n_blocks = (h.n_samples + h.block_len - 1) / h.block_len;

  rc::Decoder dec(data + pos, size - pos);
  V2Contexts cx;
  const int bl = (int)h.block_len;
  int n_groups = (bl + kGroup - 1) / kGroup;
  std::vector<float> out(h.n_samples, 0.0f);
  std::vector<float> block(h.block_len);
  std::vector<int32_t> q(bl);
  std::vector<int8_t> sign(bl);
  std::vector<uint8_t> significant(bl), group_sig(n_groups);

  for (uint32_t bi = 0; bi < n_blocks; ++bi) {
    int32_t gain_code = (int16_t)dec.decode_raw_bits(16);
    int msb = (int)dec.decode_raw_bits(5);

    std::fill(q.begin(), q.end(), 0);
    std::fill(sign.begin(), sign.end(), 1);
    std::fill(significant.begin(), significant.end(), 0);
    std::fill(group_sig.begin(), group_sig.end(), 0);
    uint64_t start = dec.cost256();
    auto left = [&]() { return dec.cost256() - start < budget256; };

    for (int plane = msb; plane >= 0 && left(); --plane) {
      for (int g = 0; g < n_groups && left(); ++g) {
        int lo = g * kGroup, hi = std::min(bl, lo + kGroup);
        if (!group_sig[g]) {
          int any = dec.decode(&cx.group);
          if (!any) continue;
          group_sig[g] = 1;
        }
        for (int i = lo; i < hi && left(); ++i) {
          if (!significant[i]) {
            int ctx = (i > lo && significant[i - 1]) ? 1 : 0;
            int sig = dec.decode(&cx.sig[ctx]);
            if (sig) {
              sign[i] = dec.decode_raw() ? -1 : 1;
              significant[i] = 1;
              q[i] = (1 << plane) + (plane > 0 ? (1 << (plane - 1)) : 0);
            }
          } else {
            int bit = dec.decode(&cx.ref);
            if (bit) q[i] |= (1 << plane);
            else q[i] &= ~(1 << plane);
            if (plane > 0)
              q[i] = (q[i] & ~((1 << plane) - 1)) | (1 << (plane - 1));
          }
        }
      }
    }

    reconstruct_block(q, sign, gain_code, bl, (int)h.sample_rate,
                      block.data());
    uint32_t s = bi * h.block_len;
    uint32_t len = std::min(h.block_len, h.n_samples - s);
    std::memcpy(out.data() + s, block.data(), len * sizeof(float));
  }
  return out;
}

std::vector<float> decode_v1(const uint8_t* data, size_t size) {
  if (size < 4 + sizeof(Header) || std::memcmp(data, "VPWQ", 4) != 0)
    return {};
  Header h;
  std::memcpy(&h, data + 4, sizeof(h));
  int budget_bits = (int)(h.b * 24);
  size_t pos = 4 + sizeof(h);
  uint32_t n_blocks = (h.n_samples + h.block_len - 1) / h.block_len;

  std::vector<float> out(h.n_samples, 0.0f);
  std::vector<float> block(h.block_len);
  for (uint32_t bi = 0; bi < n_blocks && pos + 3 <= size; ++bi) {
    uint8_t msb = data[pos];
    uint16_t nbytes = (uint16_t)(data[pos + 1] | (data[pos + 2] << 8));
    pos += 3;
    if (pos + nbytes > size) break;
    BitReader br(data + pos, nbytes);
    decode_block(&br, (int)h.block_len, (int)h.sample_rate, budget_bits, msb,
                 block.data());
    pos += nbytes;
    uint32_t s = bi * h.block_len;
    uint32_t len = std::min(h.block_len, h.n_samples - s);
    std::memcpy(out.data() + s, block.data(), len * sizeof(float));
  }
  return out;
}

// Magic-dispatching decoder: reads both stream versions.
std::vector<float> decode(const uint8_t* data, size_t size) {
  if (size >= 4 && std::memcmp(data, "VPW2", 4) == 0)
    return decode_v2(data, size);
  return decode_v1(data, size);
}

}  // namespace vcpwq

// ----------------------------------------------------------------- C API

extern "C" {

// Encode (v2 range-coded stream, the default): returns number of bytes
// written to out (caller allocates cap bytes).
int64_t vcpwq_encode(const float* x, uint32_t n, uint32_t sample_rate,
                     uint32_t block_len, uint32_t b, uint8_t* out,
                     int64_t cap) {
  std::vector<uint8_t> enc = vcpwq::encode_v2(x, n, sample_rate, block_len, b);
  if ((int64_t)enc.size() > cap) return -(int64_t)enc.size();
  std::memcpy(out, enc.data(), enc.size());
  return (int64_t)enc.size();
}

// Legacy v1 (raw bitplane) encoder, kept for format compatibility tests.
int64_t vcpwq_encode_v1(const float* x, uint32_t n, uint32_t sample_rate,
                        uint32_t block_len, uint32_t b, uint8_t* out,
                        int64_t cap) {
  std::vector<uint8_t> enc = vcpwq::encode(x, n, sample_rate, block_len, b);
  if ((int64_t)enc.size() > cap) return -(int64_t)enc.size();
  std::memcpy(out, enc.data(), enc.size());
  return (int64_t)enc.size();
}

// Decode: returns number of samples written (caller allocates cap floats).
int64_t vcpwq_decode(const uint8_t* data, int64_t size, float* out,
                     int64_t cap) {
  std::vector<float> dec = vcpwq::decode(data, (size_t)size);
  if ((int64_t)dec.size() > cap) return -(int64_t)dec.size();
  std::memcpy(out, dec.data(), dec.size() * sizeof(float));
  return (int64_t)dec.size();
}

}  // extern "C"
