// Host-side packed-weight toolkit for quip_tpu.
//
// The TPU-native counterpart of the reference's native packing path
// (Quant3Linear.pack, /root/reference/quant.py:185-220, runs serial Python
// bit surgery; the matching CUDA kernels lived in the external quant_cuda
// extension). Here the device side is a Pallas kernel; this C++ library owns
// the *host* side: multithreaded slab-major bit packing/unpacking used when
// transcoding large checkpoints (a 70B 2-bit payload is ~17 GB — numpy
// packing is minutes, this is seconds).
//
// Layout contract (must match quip_tpu/pack/format.py):
//   word j of a row holds code columns {b*nwords + j} in bits [B*b, B*(b+1)),
//   B = bit width, nwords = d * B / 32.
//
// Exposed via ctypes (see quip_tpu/pack/native.py). Build: make -C native.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// pack rows [r0, r1) of an (m, d) uint8 code matrix
void pack_rows(const uint8_t* codes, uint32_t* out, int64_t d, int bits,
               int64_t r0, int64_t r1) {
  const int cpw = 32 / bits;
  const int64_t nw = d / cpw;
  for (int64_t r = r0; r < r1; ++r) {
    const uint8_t* row = codes + r * d;
    uint32_t* orow = out + r * nw;
    std::memset(orow, 0, nw * sizeof(uint32_t));
    for (int b = 0; b < cpw; ++b) {
      const uint8_t* slab = row + b * nw;
      const int shift = bits * b;
      for (int64_t j = 0; j < nw; ++j) {
        orow[j] |= static_cast<uint32_t>(slab[j]) << shift;
      }
    }
  }
}

void unpack_rows(const uint32_t* words, uint8_t* out, int64_t d, int bits,
                 int64_t r0, int64_t r1) {
  const int cpw = 32 / bits;
  const int64_t nw = d / cpw;
  const uint32_t mask = (bits == 32) ? 0xffffffffu : ((1u << bits) - 1u);
  for (int64_t r = r0; r < r1; ++r) {
    const uint32_t* row = words + r * nw;
    uint8_t* orow = out + r * d;
    for (int b = 0; b < cpw; ++b) {
      uint8_t* slab = orow + b * nw;
      const int shift = bits * b;
      for (int64_t j = 0; j < nw; ++j) {
        slab[j] = static_cast<uint8_t>((row[j] >> shift) & mask);
      }
    }
  }
}

template <typename Fn>
void parallel_rows(int64_t m, int threads, Fn&& fn) {
  if (threads <= 1 || m < 64) {
    fn(0, m);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (m + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t r0 = t * chunk;
    const int64_t r1 = std::min<int64_t>(m, r0 + chunk);
    if (r0 >= r1) break;
    pool.emplace_back([=, &fn] { fn(r0, r1); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// codes: (m, d) uint8 with values < 2^bits; out: (m, d*bits/32) uint32.
// bits in {1, 2, 4, 8}. Returns 0 on success.
int quip_pack(const uint8_t* codes, uint32_t* out, int64_t m, int64_t d,
              int bits, int threads) {
  if (bits != 1 && bits != 2 && bits != 4 && bits != 8) return 1;
  if (d % (32 / bits) != 0) return 2;
  parallel_rows(m, threads, [&](int64_t r0, int64_t r1) {
    pack_rows(codes, out, d, bits, r0, r1);
  });
  return 0;
}

int quip_unpack(const uint32_t* words, uint8_t* out, int64_t m, int64_t d,
                int bits, int threads) {
  if (bits != 1 && bits != 2 && bits != 4 && bits != 8) return 1;
  if (d % (32 / bits) != 0) return 2;
  parallel_rows(m, threads, [&](int64_t r0, int64_t r1) {
    unpack_rows(words, out, d, bits, r0, r1);
  });
  return 0;
}

// Dequantize a packed qfn-b matrix straight to float32 (checkpoint
// transcoding: packed -> dense without a Python intermediate).
//   w = ((q / maxq) * 2 - 1) * scale
int quip_dequant_qfnb(const uint32_t* words, float* out, int64_t m,
                      int64_t d, int bits, float scale, int threads) {
  if (bits != 2 && bits != 4 && bits != 8) return 1;
  const int cpw = 32 / bits;
  if (d % cpw != 0) return 2;
  const int64_t nw = d / cpw;
  const uint32_t mask = (1u << bits) - 1u;
  const float maxq = static_cast<float>((1 << bits) - 1);
  const float a = 2.0f * scale / maxq;
  parallel_rows(m, threads, [&](int64_t r0, int64_t r1) {
    for (int64_t r = r0; r < r1; ++r) {
      const uint32_t* row = words + r * nw;
      float* orow = out + r * d;
      for (int b = 0; b < cpw; ++b) {
        float* slab = orow + b * nw;
        const int shift = bits * b;
        for (int64_t j = 0; j < nw; ++j) {
          slab[j] = a * static_cast<float>((row[j] >> shift) & mask) - scale;
        }
      }
    }
  });
  return 0;
}

}  // extern "C"
