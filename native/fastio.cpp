// fastio — native helpers for ecog2txt_tpu record IO.
//
// TFRecord files frame every record with two CRC32C (Castagnoli)
// checksums; computing those in pure Python dominates record
// serialization cost for megabyte-scale ECoG trials.  This library
// provides a hardware-accelerated crc32c (SSE4.2 CRC32 instruction when
// available, slice-by-8 table fallback otherwise), exposed over a plain
// C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC [-msse4.2] fastio.cpp -o libfastio.so

#include <cstddef>
#include <cstdint>
#include <cstring>

#if defined(__SSE4_2__)
#include <nmmintrin.h>
#endif

namespace {

// ---- slice-by-8 table fallback ------------------------------------------

uint32_t g_tables[8][256];
bool g_tables_ready = false;

void init_tables() {
  const uint32_t poly = 0x82f63b78u;  // reversed Castagnoli polynomial
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int j = 0; j < 8; ++j)
      crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    g_tables[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = g_tables[0][i];
    for (int t = 1; t < 8; ++t) {
      crc = g_tables[0][crc & 0xff] ^ (crc >> 8);
      g_tables[t][i] = crc;
    }
  }
  g_tables_ready = true;
}

uint32_t crc32c_sw(uint32_t crc, const uint8_t* data, size_t n) {
  if (!g_tables_ready) init_tables();
  crc = ~crc;
  while (n >= 8) {
    uint64_t word;
    std::memcpy(&word, data, 8);
    word ^= crc;
    crc = g_tables[7][word & 0xff] ^ g_tables[6][(word >> 8) & 0xff] ^
          g_tables[5][(word >> 16) & 0xff] ^ g_tables[4][(word >> 24) & 0xff] ^
          g_tables[3][(word >> 32) & 0xff] ^ g_tables[2][(word >> 40) & 0xff] ^
          g_tables[1][(word >> 48) & 0xff] ^ g_tables[0][(word >> 56) & 0xff];
    data += 8;
    n -= 8;
  }
  while (n--) crc = g_tables[0][(crc ^ *data++) & 0xff] ^ (crc >> 8);
  return ~crc;
}

#if defined(__SSE4_2__)
uint32_t crc32c_hw(uint32_t crc, const uint8_t* data, size_t n) {
  crc = ~crc;
  while (n >= 8) {
    uint64_t word;
    std::memcpy(&word, data, 8);
    crc = static_cast<uint32_t>(_mm_crc32_u64(crc, word));
    data += 8;
    n -= 8;
  }
  while (n--) crc = _mm_crc32_u8(crc, *data++);
  return ~crc;
}
#endif

}  // namespace

extern "C" {

uint32_t fastio_crc32c(const uint8_t* data, size_t n) {
#if defined(__SSE4_2__)
  return crc32c_hw(0, data, n);
#else
  return crc32c_sw(0, data, n);
#endif
}

// Masked CRC as used by the TFRecord framing:
// mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8
uint32_t fastio_masked_crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = fastio_crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// Scan a TFRecord byte buffer, writing (offset, length) pairs of each
// record's payload into out_offsets/out_lengths (capacity max_records).
// Returns the number of records found, or -1 on framing corruption.
long fastio_tfrecord_index(const uint8_t* buf, size_t n, uint64_t* out_offsets,
                           uint64_t* out_lengths, long max_records) {
  size_t pos = 0;
  long count = 0;
  while (pos + 12 <= n && count < max_records) {
    uint64_t length;
    std::memcpy(&length, buf + pos, 8);
    if (pos + 12 + length + 4 > n) return -1;
    out_offsets[count] = pos + 12;
    out_lengths[count] = length;
    pos += 12 + length + 4;
    ++count;
  }
  return count;
}

}  // extern "C"
