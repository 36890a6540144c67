// Minimal MAT-file (v5) reader for 2D numeric arrays.
//
// Native companion to the Python data layer: the torch reference loads every
// experimental hologram through scipy.io.loadmat on the host
// (reference: utils/Data_loader.py:177-179); this implements the subset of
// the Level-5 MAT format that the holography trees use — real 2D numeric
// matrices, plain or zlib-compressed (miCOMPRESSED) — in C++ with a C ABI
// for ctypes, so the streaming input pipeline's hot path does not go through
// Python object machinery.
//
// Format notes (MAT-File Format, R2019b):
//  * 128-byte header; bytes 126..127 are the endian indicator "IM" (LE).
//  * A sequence of [tag(8B): uint32 type, uint32 nbytes][data][pad to 8].
//    Small-data elements pack type in the low 16 bits, size in the high 16,
//    and up to 4 data bytes inside the tag's second word.
//  * miCOMPRESSED (15) wraps one whole element in a zlib stream.
//  * miMATRIX (14) holds subelements: array flags (class in the low byte of
//    the first uint32), dimensions (miINT32), name (miINT8), real data.
//    Numeric data may be stored in a narrower type than the array class
//    ("automatic data compression") and is column-major.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC matio.cc -lz).

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <vector>

namespace {

enum MiType : uint32_t {
  miINT8 = 1,
  miUINT8 = 2,
  miINT16 = 3,
  miUINT16 = 4,
  miINT32 = 5,
  miUINT32 = 6,
  miSINGLE = 7,
  miDOUBLE = 9,
  miINT64 = 12,
  miUINT64 = 13,
  miMATRIX = 14,
  miCOMPRESSED = 15,
  miUTF8 = 16,
};

struct Slice {
  const uint8_t* p;
  size_t n;
};

struct Element {
  uint32_t type = 0;
  Slice data{nullptr, 0};
  size_t total = 0;  // bytes consumed including tag + padding
};

bool read_element(const Slice& s, size_t off, Element* out) {
  if (off + 8 > s.n) return false;
  uint32_t word0, word1;
  std::memcpy(&word0, s.p + off, 4);
  std::memcpy(&word1, s.p + off + 4, 4);
  if (word0 >> 16) {  // small data element
    out->type = word0 & 0xffff;
    size_t nbytes = word0 >> 16;
    if (nbytes > 4) return false;
    out->data = {s.p + off + 4, nbytes};
    out->total = 8;
    return true;
  }
  out->type = word0;
  size_t nbytes = word1;
  if (off + 8 + nbytes > s.n) return false;
  out->data = {s.p + off + 8, nbytes};
  size_t padded = (nbytes + 7) & ~size_t(7);
  out->total = 8 + (off + 8 + padded <= s.n ? padded : nbytes);
  return true;
}

// Does `off` look like the start of a data-element tag?
bool plausible_tag(const Slice& s, size_t off) {
  if (off + 8 > s.n) return false;
  uint32_t word0;
  std::memcpy(&word0, s.p + off, 4);
  uint32_t type = (word0 >> 16) ? (word0 & 0xffff) : word0;
  return type >= miINT8 && type <= miUTF8;
}

double convert_at(const Slice& d, uint32_t type, size_t i) {
  switch (type) {
    case miINT8: return static_cast<int8_t>(d.p[i]);
    case miUINT8: return d.p[i];
    case miINT16: { int16_t v; std::memcpy(&v, d.p + 2 * i, 2); return v; }
    case miUINT16: { uint16_t v; std::memcpy(&v, d.p + 2 * i, 2); return v; }
    case miINT32: { int32_t v; std::memcpy(&v, d.p + 4 * i, 4); return v; }
    case miUINT32: { uint32_t v; std::memcpy(&v, d.p + 4 * i, 4); return v; }
    case miSINGLE: { float v; std::memcpy(&v, d.p + 4 * i, 4); return v; }
    case miDOUBLE: { double v; std::memcpy(&v, d.p + 8 * i, 8); return v; }
    case miINT64: { int64_t v; std::memcpy(&v, d.p + 8 * i, 8); return (double)v; }
    case miUINT64: { uint64_t v; std::memcpy(&v, d.p + 8 * i, 8); return (double)v; }
    default: return 0.0;
  }
}

size_t type_size(uint32_t type) {
  switch (type) {
    case miINT8: case miUINT8: case miUTF8: return 1;
    case miINT16: case miUINT16: return 2;
    case miINT32: case miUINT32: case miSINGLE: return 4;
    default: return 8;
  }
}

// Parse one miMATRIX payload; fill dims and (optionally) out row-major.
// On a dims query (out == NULL) the converted data is also written into
// *cache when possible, so the caller can serve the subsequent fill call
// without re-reading and re-inflating the file.
// Returns 0 on name mismatch, 1 on match, negative on parse error.
int parse_matrix(const Slice& body, const char* want, double* out,
                 int64_t* rows, int64_t* cols, std::vector<double>* cache) {
  size_t off = 0;
  Element flags, dims, name;
  if (!read_element(body, off, &flags) || flags.type != miUINT32 ||
      flags.data.n < 8)
    return -10;
  off += flags.total;
  if (!read_element(body, off, &dims) || dims.type != miINT32) return -11;
  off += dims.total;
  if (!read_element(body, off, &name) || name.type != miINT8) return -12;
  off += name.total;

  std::string nm(reinterpret_cast<const char*>(name.data.p), name.data.n);
  nm = nm.c_str();  // trim embedded NULs
  if (nm != want) return 0;

  uint32_t flag_word;
  std::memcpy(&flag_word, flags.data.p, 4);
  bool is_complex = (flag_word >> 8) & 0x8;
  uint8_t klass = flag_word & 0xff;
  // numeric classes only: mxDOUBLE(6) mxSINGLE(7) mx{I,UI}{8,16,32,64}(8..15)
  if (klass < 6 || klass > 15) return -13;
  if (dims.data.n != 8) return -14;  // 2D only
  int32_t d0, d1;
  std::memcpy(&d0, dims.data.p, 4);
  std::memcpy(&d1, dims.data.p + 4, 4);
  if (out == nullptr) {
    *rows = d0;
    *cols = d1;
    if (cache != nullptr && !is_complex) {
      size_t off2 = off;
      Element real;
      size_t n = static_cast<size_t>(d0) * static_cast<size_t>(d1);
      if (read_element(body, off2, &real) &&
          real.data.n >= n * type_size(real.type)) {
        cache->resize(n);
        for (int64_t c = 0; c < d1; ++c)
          for (int64_t r = 0; r < d0; ++r)
            (*cache)[r * d1 + c] = convert_at(real.data, real.type, c * d0 + r);
      }
    }
    return 1;  // dims query
  }
  // Fill phase: *rows/*cols carry the caller's buffer dimensions (from the
  // dims query). Re-validate so a file rewritten between the two reads can
  // never overflow the caller's allocation.
  if (*rows != d0 || *cols != d1) return -18;
  if (is_complex) return -15;

  Element real;
  if (!read_element(body, off, &real)) return -16;
  size_t n = static_cast<size_t>(d0) * static_cast<size_t>(d1);
  if (real.data.n < n * type_size(real.type)) return -17;
  // column-major -> row-major
  for (int64_t c = 0; c < d1; ++c)
    for (int64_t r = 0; r < d0; ++r)
      out[r * d1 + c] = convert_at(real.data, real.type, c * d0 + r);
  return 1;
}

int inflate_all(const Slice& in, std::vector<uint8_t>* out) {
  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return -20;
  out->resize(in.n * 4 + 1024);
  zs.next_in = const_cast<Bytef*>(in.p);
  zs.avail_in = static_cast<uInt>(in.n);
  int ret;
  size_t written = 0;
  for (;;) {
    zs.next_out = out->data() + written;
    zs.avail_out = static_cast<uInt>(out->size() - written);
    ret = inflate(&zs, Z_NO_FLUSH);
    written = out->size() - zs.avail_out;
    if (ret == Z_STREAM_END) break;
    if (ret != Z_OK) { inflateEnd(&zs); return -21; }
    if (zs.avail_out == 0) out->resize(out->size() * 2);
  }
  inflateEnd(&zs);
  out->resize(written);
  return 0;
}

std::mutex g_cache_mu;
std::string g_cache_path, g_cache_var;
int64_t g_cache_r = 0, g_cache_c = 0;
std::vector<double> g_cache_data;

}  // namespace

extern "C" {

// Read the real 2D numeric variable `var` from a v5 MAT file.
//   out == NULL: dims query — sets *rows/*cols, returns 0.
//   out != NULL: *rows/*cols are INPUTS (the buffer's dims from the query);
//                fills out (row-major doubles, rows*cols), returns 0. A dims
//                mismatch (file changed between calls) returns -18 instead
//                of writing out of bounds.
// Errors: -1 io, -2 not a v5 MAT, -3 variable not found, < -9 parse error.
int mat_read2d(const char* path, const char* var, double* out,
               int64_t* rows, int64_t* cols) {
  if (out != nullptr) {
    // Serve the fill phase from the dims-query cache when it matches —
    // avoids reading and re-inflating the whole file a second time.
    std::lock_guard<std::mutex> lk(g_cache_mu);
    if (g_cache_path == path && g_cache_var == var && g_cache_r == *rows &&
        g_cache_c == *cols &&
        g_cache_data.size() ==
            static_cast<size_t>(g_cache_r) * static_cast<size_t>(g_cache_c) &&
        !g_cache_data.empty()) {
      std::memcpy(out, g_cache_data.data(), g_cache_data.size() * sizeof(double));
      g_cache_path.clear();  // one-shot: a rewritten file must be re-parsed
      return 0;
    }
  }
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz < 136) { std::fclose(f); return -2; }
  std::vector<uint8_t> buf(static_cast<size_t>(sz));
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  if (buf[126] != 'I' || buf[127] != 'M') return -2;  // little-endian v5 only

  Slice s{buf.data(), buf.size()};
  size_t off = 128;
  while (off + 8 <= s.n) {
    Element el;
    if (!read_element(s, off, &el)) break;
    if (el.type == miMATRIX) {
      std::vector<double> cached;
      int r = parse_matrix({el.data.p, el.data.n}, var, out, rows, cols,
                           out == nullptr ? &cached : nullptr);
      if (r == 1) {
        if (out == nullptr && !cached.empty()) {
          std::lock_guard<std::mutex> lk(g_cache_mu);
          g_cache_path = path; g_cache_var = var;
          g_cache_r = *rows; g_cache_c = *cols;
          g_cache_data = std::move(cached);
        }
        return 0;
      }
      if (r < 0) return r;
    } else if (el.type == miCOMPRESSED) {
      std::vector<uint8_t> raw;
      if (inflate_all(el.data, &raw) == 0 && raw.size() > 8) {
        Element inner;
        Slice rs{raw.data(), raw.size()};
        if (read_element(rs, 0, &inner) && inner.type == miMATRIX) {
          std::vector<double> cached;
          int r = parse_matrix({inner.data.p, inner.data.n}, var, out, rows,
                               cols, out == nullptr ? &cached : nullptr);
          if (r == 1) {
            if (out == nullptr && !cached.empty()) {
              std::lock_guard<std::mutex> lk(g_cache_mu);
              g_cache_path = path; g_cache_var = var;
              g_cache_r = *rows; g_cache_c = *cols;
              g_cache_data = std::move(cached);
            }
            return 0;
          }
          if (r < 0) return r;
        }
      }
      // miCOMPRESSED elements are written UNPADDED by most writers (incl.
      // scipy/MATLAB), while everything else pads to 8 bytes. Re-synchronise
      // on whichever next offset looks like a valid tag.
      size_t unpadded = off + 8 + el.data.n;
      if (plausible_tag(s, unpadded) || unpadded >= s.n) {
        off = unpadded;
        continue;
      }
    }
    off += el.total;
  }
  return -3;
}

}  // extern "C"
