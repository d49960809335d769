// Threaded .npy corpus loader for mdvit_tpu.
//
// The reference streams individual .npy files through torch DataLoader worker
// processes every step; mdvit_tpu instead loads each split ONCE into a dense
// array that then lives in device HBM (data/loader.py). This library makes
// that one-time load fast on a weak host: a thread pool overlaps file I/O
// waits (even with one core, threads park in read(2)) and parses the minimal
// npy v1/v2 header inline instead of going through numpy's Python reader.
//
// Exposed C ABI (ctypes, see data/native_loader.py):
//   int npy_batch_load(const char** paths, int n, unsigned char* out,
//                      long long item_bytes, long long header_skip_probe,
//                      int n_threads)
// Each file's payload must decode to exactly `item_bytes` bytes (uint8
// arrays of identical shape — the corpus contract); returns 0 on success,
// else the 1-based index of the first failing file.
//
// Build: g++ -O2 -shared -fPIC -pthread -o mdvit_tpu/data/_npy_loader.so
//        csrc/npy_loader.cpp

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Parse the npy header; returns payload offset or -1. Validates dtype is
// byte-sized ('|u1' / '|i1' / '|b1') when strict_u8 is set.
long long payload_offset(FILE* f, bool strict_u8) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return -1;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return -1;
  int major = magic[6];
  unsigned int header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return -1;
    header_len = b[0] | (b[1] << 8);
    if (strict_u8) {
      std::string hdr(header_len, '\0');
      if (fread(&hdr[0], 1, header_len, f) != header_len) return -1;
      if (hdr.find("u1") == std::string::npos &&
          hdr.find("i1") == std::string::npos &&
          hdr.find("b1") == std::string::npos)
        return -2;  // wrong dtype
      return 10 + (long long)header_len;
    }
    return 10 + (long long)header_len;
  } else if (major == 2 || major == 3) {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return -1;
    unsigned int hl = b[0] | (b[1] << 8) | (b[2] << 16) | ((unsigned)b[3] << 24);
    return 12 + (long long)hl;
  }
  return -1;
}

bool load_one(const char* path, unsigned char* dst, long long item_bytes,
              bool strict_u8) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  long long off = payload_offset(f, strict_u8);
  if (off < 0) {
    fclose(f);
    return false;
  }
  if (fseek(f, (long)off, SEEK_SET) != 0) {
    fclose(f);
    return false;
  }
  size_t got = fread(dst, 1, (size_t)item_bytes, f);
  fclose(f);
  return got == (size_t)item_bytes;
}

}  // namespace

extern "C" {

int npy_batch_load(const char** paths, int n, unsigned char* out,
                   long long item_bytes, int strict_u8, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> first_fail(0);  // 0 = ok, else 1-based index
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || first_fail.load() != 0) return;
      if (!load_one(paths[i], out + (long long)i * item_bytes, item_bytes,
                    strict_u8 != 0)) {
        int expected = 0;
        first_fail.compare_exchange_strong(expected, i + 1);
        return;
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return first_fail.load();
}

}  // extern "C"
