// fastio — the native data-loader core for ecog2txt_tpu record IO
// (the runtime role TensorFlow's native TFRecordDataset plays for the
// reference toolchain).
//
// Provides, over a plain C ABI for ctypes:
//  * hardware-accelerated CRC32C (SSE4.2 when available, slice-by-8
//    fallback) — TFRecord frames every record with two such checksums;
//  * one-pass TFRecord framing index with optional CRC verification;
//  * tf.train.Example protobuf decoding: feature-table indexing plus
//    packed FloatList/Int64List decoders that write straight into
//    caller-provided (numpy) buffers — no per-varint Python.
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
    // overflow-safe bound: a corrupt huge length must not wrap
    size_t avail = n - pos - 12;
    if (length > avail || avail - length < 4) return -1;
    out_offsets[count] = pos + 12;
    out_lengths[count] = length;
    pos += 12 + length + 4;
    ++count;
  }
  return count;
}

// Like fastio_tfrecord_index, additionally checking both per-record
// CRC32Cs when verify != 0.  Returns the record count, or -1 on framing
// corruption, -2 on a header-CRC mismatch, -3 on a payload-CRC
// mismatch.
long fastio_tfrecord_index2(const uint8_t* buf, size_t n, int verify,
                            uint64_t* out_offsets, uint64_t* out_lengths,
                            long max_records) {
  size_t pos = 0;
  long count = 0;
  while (pos + 12 <= n && count < max_records) {
    uint64_t length;
    std::memcpy(&length, buf + pos, 8);
    // overflow-safe bound: a corrupt huge length must not wrap
    size_t avail = n - pos - 12;
    if (length > avail || avail - length < 4) return -1;
    if (verify) {
      uint32_t hdr_crc, pay_crc;
      std::memcpy(&hdr_crc, buf + pos + 8, 4);
      std::memcpy(&pay_crc, buf + pos + 12 + length, 4);
      if (fastio_masked_crc32c(buf + pos, 8) != hdr_crc) return -2;
      if (fastio_masked_crc32c(buf + pos + 12, length) != pay_crc) return -3;
    }
    out_offsets[count] = pos + 12;
    out_lengths[count] = length;
    pos += 12 + length + 4;
    ++count;
  }
  if (pos != n) {
    // bytes remain: capacity exhaustion is the caller's sizing problem,
    // not file corruption — return a distinct code (ADVICE r2)
    if (count == max_records) return -4;
    return -1;  // trailing garbage / truncated record
  }
  return count;
}

namespace {

// Protobuf base-128 varint.  Returns new position, or SIZE_MAX on
// malformed input.
size_t read_varint(const uint8_t* buf, size_t n, size_t pos, uint64_t* out) {
  uint64_t value = 0;
  int shift = 0;
  while (pos < n && shift < 64) {
    uint8_t b = buf[pos++];
    value |= static_cast<uint64_t>(b & 0x7f) << shift;
    if (!(b & 0x80)) {
      *out = value;
      return pos;
    }
    shift += 7;
  }
  return SIZE_MAX;
}

size_t skip_field(const uint8_t* buf, size_t n, size_t pos, uint32_t wire) {
  uint64_t v;
  switch (wire) {
    case 0:
      return read_varint(buf, n, pos, &v);
    case 1:
      return pos + 8 <= n ? pos + 8 : SIZE_MAX;
    case 2:
      pos = read_varint(buf, n, pos, &v);
      if (pos == SIZE_MAX || pos + v > n) return SIZE_MAX;
      return pos + v;
    case 5:
      return pos + 4 <= n ? pos + 4 : SIZE_MAX;
    default:
      return SIZE_MAX;
  }
}

}  // namespace

// Index the features of one serialized tf.train.Example: for feature k,
// record the key's (offset, length) within payload, the value kind
// (1 = bytes_list, 2 = float_list, 3 = int64_list) and the (offset,
// length) of the value LIST BODY (the serialized BytesList/FloatList/
// Int64List message).  Returns the feature count; -1 on malformed
// input; -2 when the Example has more than max_features features; -3
// when a Feature's list field is split across multiple occurrences
// (legal protobuf merge encoding this indexer cannot represent) —
// callers fall back to a full decoder for -2/-3.
long fastio_example_index(const uint8_t* payload, size_t n,
                          uint64_t* keys_off, uint64_t* keys_len,
                          int32_t* kinds, uint64_t* vals_off,
                          uint64_t* vals_len, long max_features) {
  long count = 0;
  size_t pos = 0;
  uint64_t v;
  while (pos < n) {
    uint64_t tag;
    pos = read_varint(payload, n, pos, &tag);
    if (pos == SIZE_MAX) return -1;
    if ((tag >> 3) != 1 || (tag & 7) != 2) {  // Example.features
      pos = skip_field(payload, n, pos, tag & 7);
      if (pos == SIZE_MAX) return -1;
      continue;
    }
    pos = read_varint(payload, n, pos, &v);
    if (pos == SIZE_MAX || pos + v > n) return -1;
    size_t fend = pos + v;
    while (pos < fend) {  // Features.feature map entries
      uint64_t ftag;
      pos = read_varint(payload, fend, pos, &ftag);
      if (pos == SIZE_MAX) return -1;
      if ((ftag >> 3) != 1 || (ftag & 7) != 2) {
        pos = skip_field(payload, fend, pos, ftag & 7);
        if (pos == SIZE_MAX) return -1;
        continue;
      }
      pos = read_varint(payload, fend, pos, &v);
      if (pos == SIZE_MAX || pos + v > fend) return -1;
      size_t eend = pos + v;
      uint64_t koff = 0, klen = 0, voff = 0, vlen = 0;
      int32_t kind = 0;
      while (pos < eend) {  // map entry: key = 1, value(Feature) = 2
        uint64_t etag;
        pos = read_varint(payload, eend, pos, &etag);
        if (pos == SIZE_MAX) return -1;
        uint32_t efield = etag >> 3, ewire = etag & 7;
        if (ewire != 2) {
          pos = skip_field(payload, eend, pos, ewire);
          if (pos == SIZE_MAX) return -1;
          continue;
        }
        pos = read_varint(payload, eend, pos, &v);
        if (pos == SIZE_MAX || pos + v > eend) return -1;
        if (efield == 1) {
          koff = pos;
          klen = v;
          pos += v;
        } else if (efield == 2) {
          // Feature: bytes_list = 1, float_list = 2, int64_list = 3
          size_t fpos = pos, fe = pos + v;
          pos += v;
          while (fpos < fe) {
            uint64_t vtag;
            fpos = read_varint(payload, fe, fpos, &vtag);
            if (fpos == SIZE_MAX) return -1;
            uint32_t vfield = vtag >> 3, vwire = vtag & 7;
            if (vwire != 2 || vfield < 1 || vfield > 3) {
              fpos = skip_field(payload, fe, fpos, vwire);
              if (fpos == SIZE_MAX) return -1;
              continue;
            }
            uint64_t blen;
            fpos = read_varint(payload, fe, fpos, &blen);
            if (fpos == SIZE_MAX || fpos + blen > fe) return -1;
            if (kind != 0) return -3;  // split/merged list field
            kind = static_cast<int32_t>(vfield);
            voff = fpos;
            vlen = blen;
            fpos += blen;
          }
        } else {
          pos += v;
        }
      }
      if (klen) {
        if (count >= max_features) return -2;
        keys_off[count] = koff;
        keys_len[count] = klen;
        kinds[count] = kind;
        vals_off[count] = voff;
        vals_len[count] = vlen;
        ++count;
      }
    }
  }
  return count;
}

// Decode a FloatList body (field 1; packed fixed32 chunks and/or
// unpacked fixed32 values) into out.  Returns the float count, or -1 on
// malformed input / capacity overflow.
long fastio_decode_floats(const uint8_t* body, size_t n, float* out,
                          long cap) {
  size_t pos = 0;
  long count = 0;
  uint64_t v;
  while (pos < n) {
    uint64_t tag;
    pos = read_varint(body, n, pos, &tag);
    if (pos == SIZE_MAX) return -1;
    uint32_t field = tag >> 3, wire = tag & 7;
    if (field == 1 && wire == 2) {  // packed chunk
      pos = read_varint(body, n, pos, &v);
      if (pos == SIZE_MAX || pos + v > n || (v & 3)) return -1;
      long k = static_cast<long>(v / 4);
      if (count + k > cap) return -1;
      std::memcpy(out + count, body + pos, v);
      count += k;
      pos += v;
    } else if (field == 1 && wire == 5) {  // single fixed32
      if (pos + 4 > n || count + 1 > cap) return -1;
      std::memcpy(out + count, body + pos, 4);
      ++count;
      pos += 4;
    } else {
      pos = skip_field(body, n, pos, wire);
      if (pos == SIZE_MAX) return -1;
    }
  }
  return count;
}

// Decode an Int64List body (field 1; packed varint chunks and/or
// unpacked varints) into out.  Returns the count, or -1.
long fastio_decode_int64s(const uint8_t* body, size_t n, int64_t* out,
                          long cap) {
  size_t pos = 0;
  long count = 0;
  uint64_t v;
  while (pos < n) {
    uint64_t tag;
    pos = read_varint(body, n, pos, &tag);
    if (pos == SIZE_MAX) return -1;
    uint32_t field = tag >> 3, wire = tag & 7;
    if (field == 1 && wire == 2) {  // packed chunk
      pos = read_varint(body, n, pos, &v);
      if (pos == SIZE_MAX || pos + v > n) return -1;
      size_t end = pos + v;
      while (pos < end) {
        uint64_t u;
        pos = read_varint(body, end, pos, &u);
        if (pos == SIZE_MAX || count >= cap) return -1;
        out[count++] = static_cast<int64_t>(u);
      }
    } else if (field == 1 && wire == 0) {
      uint64_t u;
      pos = read_varint(body, n, pos, &u);
      if (pos == SIZE_MAX || count >= cap) return -1;
      out[count++] = static_cast<int64_t>(u);
    } else {
      pos = skip_field(body, n, pos, wire);
      if (pos == SIZE_MAX) return -1;
    }
  }
  return count;
}

}  // extern "C"
