// Native TFRecord reader for the hypervla_tpu input pipeline.
//
// Replaces tf.data's C++ record readers (the reference reads RLDS shards
// through TFDS/tf.data; SURVEY.md §2.6). Exposes a minimal C API consumed via
// ctypes (hypervla_tpu/data/tfrecord_native.py): buffered sequential reads of
// length-prefixed records with masked-crc32c validation, far faster than the
// pure-Python framing parser for multi-GB shards.
//
// Build: g++ -O3 -shared -fPIC -o libhvtfrecord.so tfrecord_reader.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

uint32_t g_crc_table[256];
bool g_crc_init = false;

void init_crc_table() {
  if (g_crc_init) return;
  const uint32_t poly = 0x82F63B78u;  // crc32c (Castagnoli)
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int j = 0; j < 8; ++j) {
      crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    }
    g_crc_table[i] = crc;
  }
  g_crc_init = true;
}

uint32_t crc32c(const uint8_t* data, size_t n) {
  init_crc_table();
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) {
    crc = (crc >> 8) ^ g_crc_table[(crc ^ data[i]) & 0xFF];
  }
  return crc ^ 0xFFFFFFFFu;
}

uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

}  // namespace

extern "C" {

struct HvReader {
  FILE* file;
  uint8_t* buffer;
  size_t capacity;
  int validate_crc;
  char error[256];
};

HvReader* hv_open(const char* path, int validate_crc) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  // large stdio buffer for sequential throughput
  setvbuf(f, nullptr, _IOFBF, 4 << 20);
  HvReader* r = static_cast<HvReader*>(calloc(1, sizeof(HvReader)));
  r->file = f;
  r->capacity = 1 << 20;
  r->buffer = static_cast<uint8_t*>(malloc(r->capacity));
  r->validate_crc = validate_crc;
  return r;
}

// Reads the next record. Returns its length, 0 at EOF, -1 on error
// (hv_error() describes it). The returned pointer stays valid until the
// next hv_next/hv_close call.
int64_t hv_next(HvReader* r, const uint8_t** out_data) {
  uint8_t header[12];
  size_t got = fread(header, 1, 12, r->file);
  if (got == 0) return 0;  // clean EOF
  if (got < 12) {
    snprintf(r->error, sizeof(r->error), "truncated record header");
    return -1;
  }
  uint64_t length;
  memcpy(&length, header, 8);
  if (r->validate_crc) {
    uint32_t expect;
    memcpy(&expect, header + 8, 4);
    if (expect != masked_crc(header, 8)) {
      snprintf(r->error, sizeof(r->error), "corrupt length crc");
      return -1;
    }
  }
  if (length + 4 > r->capacity) {
    while (r->capacity < length + 4) r->capacity *= 2;
    r->buffer = static_cast<uint8_t*>(realloc(r->buffer, r->capacity));
  }
  if (fread(r->buffer, 1, length + 4, r->file) != length + 4) {
    snprintf(r->error, sizeof(r->error), "truncated record payload");
    return -1;
  }
  if (r->validate_crc) {
    uint32_t expect;
    memcpy(&expect, r->buffer + length, 4);
    if (expect != masked_crc(r->buffer, length)) {
      snprintf(r->error, sizeof(r->error), "corrupt data crc");
      return -1;
    }
  }
  *out_data = r->buffer;
  return static_cast<int64_t>(length);
}

const char* hv_error(HvReader* r) { return r->error; }

void hv_close(HvReader* r) {
  if (!r) return;
  if (r->file) fclose(r->file);
  free(r->buffer);
  free(r);
}

uint32_t hv_crc32c(const uint8_t* data, int64_t n) {
  return crc32c(data, static_cast<size_t>(n));
}

uint32_t hv_masked_crc(const uint8_t* data, int64_t n) {
  return masked_crc(data, static_cast<size_t>(n));
}

}  // extern "C"
