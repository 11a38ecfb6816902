// Native frame loader: parallel .npz entry extraction into caller buffers.
//
// TPU-native counterpart of the reference's native data-path pieces (the
// CPython shared-memory loader + torch DataLoader worker processes,
// reference: hulc2/datasets/utils/shared_memory_loader.py:43,
// hulc2/datasets/npz_dataset.py:96-115): the hot host-side loop — open a
// per-frame .npz, locate a named entry, inflate it, copy the npy payload —
// runs here in C++ threads with no GIL, writing straight into a
// caller-provided contiguous batch buffer (zero intermediate copies on the
// Python side).
//
// Format notes:
// - .npz is a ZIP archive; we parse local file headers sequentially (the
//   layout numpy writes), handling stored (0) and deflated (8) entries.
// - entry payloads are .npy files: magic \x93NUMPY, 1 version byte pair,
//   2- or 4-byte header length, then raw little-endian data.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 frameloader.cpp -o libframeloader.so -lz -lpthread
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Buf {
  std::vector<unsigned char> data;
};

bool read_file(const char* path, Buf& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.data.resize(static_cast<size_t>(size));
  size_t got = std::fread(out.data.data(), 1, out.data.size(), f);
  std::fclose(f);
  return got == out.data.size();
}

uint16_t rd16(const unsigned char* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const unsigned char* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}

// Find a zip entry whose name starts with `key` (numpy names entries
// "<key>.npy"); returns the npy payload (after the npy header) copied into
// `out`, at most `out_cap` bytes. Returns payload bytes or -1.
int64_t extract_entry(const Buf& zip, const char* key, unsigned char* out, int64_t out_cap) {
  const unsigned char* p = zip.data.data();
  const unsigned char* end = p + zip.data.size();
  const size_t key_len = std::strlen(key);
  std::vector<unsigned char> scratch;

  while (p + 30 <= end && rd32(p) == 0x04034b50) {  // local file header
    uint16_t flags = rd16(p + 6);
    uint16_t method = rd16(p + 8);
    uint64_t comp_size = rd32(p + 18);
    uint64_t uncomp_size = rd32(p + 22);
    uint16_t name_len = rd16(p + 26);
    uint16_t extra_len = rd16(p + 28);
    const char* name = reinterpret_cast<const char*>(p + 30);
    const unsigned char* extra = p + 30 + name_len;
    const unsigned char* payload = extra + extra_len;
    // numpy writes zip64 placeholders: sizes 0xFFFFFFFF with the real values
    // in the zip64 extra field (header id 0x0001: uncomp u64, comp u64)
    if (comp_size == 0xFFFFFFFFu || uncomp_size == 0xFFFFFFFFu) {
      const unsigned char* q = extra;
      while (q + 4 <= extra + extra_len) {
        uint16_t id = rd16(q);
        uint16_t sz = rd16(q + 2);
        if (id == 0x0001 && sz >= 16) {
          uncomp_size = rd32(q + 4) | (uint64_t(rd32(q + 8)) << 32);
          comp_size = rd32(q + 12) | (uint64_t(rd32(q + 16)) << 32);
          break;
        }
        q += 4 + sz;
      }
      if (comp_size == 0xFFFFFFFFu) return -8;  // zip64 extra missing
    }
    if (flags & 0x8) return -3;  // streaming descriptors unsupported (numpy doesn't emit them)
    if (payload + comp_size > end) return -2;

    bool match = name_len >= key_len && std::memcmp(name, key, key_len) == 0 &&
                 (name_len == key_len ||
                  (name_len == key_len + 4 && std::memcmp(name + key_len, ".npy", 4) == 0));
    if (match) {
      const unsigned char* npy = nullptr;
      size_t npy_size = 0;
      if (method == 0) {
        npy = payload;
        npy_size = static_cast<size_t>(comp_size);
      } else if (method == 8) {
        scratch.resize(static_cast<size_t>(uncomp_size));
        z_stream zs{};
        inflateInit2(&zs, -MAX_WBITS);  // raw deflate
        zs.next_in = const_cast<unsigned char*>(payload);
        zs.avail_in = static_cast<unsigned>(comp_size);
        zs.next_out = scratch.data();
        zs.avail_out = static_cast<unsigned>(uncomp_size);
        int rc = inflate(&zs, Z_FINISH);
        inflateEnd(&zs);
        if (rc != Z_STREAM_END) return -4;
        npy = scratch.data();
        npy_size = static_cast<size_t>(uncomp_size);
      } else {
        return -5;
      }
      // parse npy header: magic(6) version(2) hlen(2 or 4)
      if (npy_size < 10 || std::memcmp(npy, "\x93NUMPY", 6) != 0) return -6;
      uint8_t major = npy[6];
      size_t hlen_off = 8, hlen;
      if (major == 1) {
        hlen = rd16(npy + 8);
        hlen_off = 10;
      } else {
        hlen = rd32(npy + 8);
        hlen_off = 12;
      }
      const unsigned char* data = npy + hlen_off + hlen;
      int64_t data_size = static_cast<int64_t>(npy_size - hlen_off - hlen);
      if (data_size > out_cap) return -7;
      std::memcpy(out, data, static_cast<size_t>(data_size));
      return data_size;
    }
    p = payload + comp_size;
  }
  return -1;  // not found
}

}  // namespace

extern "C" {

// Load entry `key` from each of n npz files into out (contiguous, row i at
// out + i*frame_bytes). Parallel over `n_threads`. Returns 0 on success or
// the first error code encountered.
int fl_load_frames(const char** paths, int64_t n, const char* key,
                   unsigned char* out, int64_t frame_bytes, int n_threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    Buf buf;
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n || err.load() != 0) return;
      if (!read_file(paths[i], buf)) {
        err.store(-10);
        return;
      }
      int64_t got = extract_entry(buf, key, out + i * frame_bytes, frame_bytes);
      if (got < 0) {
        err.store(static_cast<int>(got));
        return;
      }
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return err.load();
}

// Probe a single entry's payload size (for buffer allocation). Returns size
// in bytes or a negative error code.
int64_t fl_probe_entry(const char* path, const char* key) {
  Buf buf;
  if (!read_file(path, buf)) return -10;
  std::vector<unsigned char> tmp(64 << 20);  // 64 MiB cap per frame entry
  return extract_entry(buf, key, tmp.data(), static_cast<int64_t>(tmp.size()));
}
}
