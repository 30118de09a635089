// Host-side packed-weight toolkit for quip_tpu.
//
// The TPU-native counterpart of the reference's native packing path
// (Quant3Linear.pack, /root/reference/quant.py:185-220, runs serial Python
// bit surgery; the matching CUDA kernels lived in the external quant_cuda
// extension). Here the device side is a Pallas kernel; this C++ library owns
// the *host* side: multithreaded bit packing/unpacking used when transcoding
// large checkpoints (a 70B 2-bit payload is ~17 GB — numpy packing is
// minutes, this is seconds).
//
// Layout contract (must match quip_tpu/pack/format.py — halfword-spread,
// transposed): a plane is (nwords, m) uint32 with nwords = d*bits/32.
// Word (j, i) holds the code of weight row i, fan-in column
//     c = k * (2 * nwords) + 2 * j + h
// in bit-field [16*h + bits*k, 16*h + bits*(k+1)), h in {0,1},
// k in 0..(16/bits)-1. This layout lets the TPU kernel bit-pattern each
// 16-bit half directly into bf16(128 + code) with one shift+mask+or.
// Composite widths (3 = 2+1, 8 = 4+4) are stacks of these planes, composed
// on the Python side (pack/format.py:PLANE_SPLITS).
//
// Exposed via ctypes (see quip_tpu/pack/native.py). Build: make -C native.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline bool valid_field_bits(int bits) {
  return bits == 1 || bits == 2 || bits == 4;
}

// Both directions iterate 64-weight-row sub-blocks so the large (m, d)
// byte-matrix side stays L2-resident per block (64 rows x d<=32k columns
// is <=2 MB), while the packed side is touched in short contiguous runs of
// 64 words per word-row j.
constexpr int64_t kRowBlock = 64;

void pack_rowblock(const uint8_t* codes, uint32_t* out, int64_t m, int64_t d,
                   int bits, int64_t ib0, int64_t ib1) {
  const int fph = 16 / bits;        // fields per 16-bit half
  const int64_t nw = d / (2 * fph); // words per fan-in row
  for (int64_t b = ib0; b < ib1; b += kRowBlock) {
  const int64_t i0 = b, i1 = std::min<int64_t>(ib1, b + kRowBlock);
  for (int64_t j = 0; j < nw; ++j) {
    uint32_t* orow = out + j * m;
    for (int64_t i = i0; i < i1; ++i) {
      const uint8_t* crow = codes + i * d;
      uint32_t w = 0;
      for (int k = 0; k < fph; ++k) {
        const int64_t c = static_cast<int64_t>(k) * 2 * nw + 2 * j;
        w |= static_cast<uint32_t>(crow[c]) << (bits * k);
        w |= static_cast<uint32_t>(crow[c + 1]) << (16 + bits * k);
      }
      orow[i] = w;
    }
  }
  }
}

void unpack_rowblock(const uint32_t* words, uint8_t* out, int64_t m,
                     int64_t d, int bits, int64_t ib0, int64_t ib1) {
  const int fph = 16 / bits;
  const int64_t nw = d / (2 * fph);
  const uint32_t mask = (1u << bits) - 1u;
  for (int64_t b = ib0; b < ib1; b += kRowBlock) {
  const int64_t i0 = b, i1 = std::min<int64_t>(ib1, b + kRowBlock);
  for (int64_t j = 0; j < nw; ++j) {
    const uint32_t* wrow = words + j * m;
    for (int64_t i = i0; i < i1; ++i) {
      const uint32_t w = wrow[i];
      uint8_t* crow = out + i * d;
      for (int k = 0; k < fph; ++k) {
        const int64_t c = static_cast<int64_t>(k) * 2 * nw + 2 * j;
        crow[c] = static_cast<uint8_t>((w >> (bits * k)) & mask);
        crow[c + 1] = static_cast<uint8_t>((w >> (16 + bits * k)) & mask);
      }
    }
  }
  }
}

template <typename Fn>
void parallel_range(int64_t n, int threads, Fn&& fn) {
  if (threads <= 1 || n < 16) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t r0 = t * chunk;
    const int64_t r1 = std::min<int64_t>(n, r0 + chunk);
    if (r0 >= r1) break;
    pool.emplace_back([=, &fn] { fn(r0, r1); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// codes: (m, d) uint8 with values < 2^bits; out: (d*bits/32, m) uint32.
// bits in {1, 2, 4} (field width of one plane). Returns 0 on success.
int quip_pack(const uint8_t* codes, uint32_t* out, int64_t m, int64_t d,
              int bits, int threads) {
  if (!valid_field_bits(bits)) return 1;
  const int cpw = 32 / bits;
  if (d % cpw != 0) return 2;
  parallel_range(m, threads, [&](int64_t i0, int64_t i1) {
    pack_rowblock(codes, out, m, d, bits, i0, i1);
  });
  return 0;
}

int quip_unpack(const uint32_t* words, uint8_t* out, int64_t m, int64_t d,
                int bits, int threads) {
  if (!valid_field_bits(bits)) return 1;
  const int cpw = 32 / bits;
  if (d % cpw != 0) return 2;
  parallel_range(m, threads, [&](int64_t i0, int64_t i1) {
    unpack_rowblock(words, out, m, d, bits, i0, i1);
  });
  return 0;
}

// Dequantize a single-plane qfn-b matrix straight to float32 (checkpoint
// transcoding: packed -> dense (m, d) without a Python intermediate).
//   w = ((q / maxq) * 2 - 1) * scale,   bits in {2, 4}.
int quip_dequant_qfnb(const uint32_t* words, float* out, int64_t m,
                      int64_t d, int bits, float scale, int threads) {
  if (bits != 2 && bits != 4) return 1;
  const int fph = 16 / bits;
  const int cpw = 32 / bits;
  if (d % cpw != 0) return 2;
  const int64_t nw = d / cpw;
  const uint32_t mask = (1u << bits) - 1u;
  const float maxq = static_cast<float>((1 << bits) - 1);
  const float a = 2.0f * scale / maxq;
  parallel_range(m, threads, [&](int64_t ib0, int64_t ib1) {
    for (int64_t b = ib0; b < ib1; b += kRowBlock) {
    const int64_t i0 = b, i1 = std::min<int64_t>(ib1, b + kRowBlock);
    for (int64_t j = 0; j < nw; ++j) {
      const uint32_t* wrow = words + j * m;
      for (int64_t i = i0; i < i1; ++i) {
        const uint32_t w = wrow[i];
        float* orow = out + i * d;
        for (int k = 0; k < fph; ++k) {
          const int64_t c = static_cast<int64_t>(k) * 2 * nw + 2 * j;
          orow[c] = a * static_cast<float>((w >> (bits * k)) & mask) - scale;
          orow[c + 1] =
              a * static_cast<float>((w >> (16 + bits * k)) & mask) - scale;
        }
      }
    }
    }
  });
  return 0;
}

}  // extern "C"
