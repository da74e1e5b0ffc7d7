// sav_loader: native track-file loader + batch assembler.
//
// TPU-native replacement for the runtime role the reference delegates to
// torch's C++ DataLoader workers (num_workers=4, reference
// src/configs/config.txt:16) plus the per-step track-file reads the
// reference performs from Python inside the hot loop
// (src/trainer_fragGS.py:537-538). This library:
//
//   * indexes and memory-maps the per-pair TAPIR track files
//     `<q>_<t>.npy` ([N,4] float32 little-endian, standard NPY v1/v2);
//   * assembles fixed-size training batches (query pixels, target tracks,
//     validity mask) with deterministic per-step subsampling entirely in
//     C++ — zero Python in the per-step path;
//   * is exposed through a plain C ABI consumed via ctypes
//     (splatter_a_video_tpu/data/native_loader.py).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 sav_loader.cpp -o libsav_loader.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

struct MappedNpy {
  const float* data = nullptr;   // payload, row-major [rows, cols]
  int64_t rows = 0;
  int64_t cols = 0;
  void* map_base = nullptr;
  size_t map_len = 0;
};

// Minimal NPY parser: v1.0/v2.0, little-endian f4, C-order, 2-D.
bool parse_npy(const char* path, MappedNpy* out) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 16) { ::close(fd); return false; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (base == MAP_FAILED) return false;
  const uint8_t* p = static_cast<const uint8_t*>(base);
  if (memcmp(p, "\x93NUMPY", 6) != 0) { munmap(base, st.st_size); return false; }
  uint8_t major = p[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = p[8] | (p[9] << 8);
    header_off = 10;
  } else {
    header_len = p[8] | (p[9] << 8) | (p[10] << 16) | (uint32_t(p[11]) << 24);
    header_off = 12;
  }
  std::string header(reinterpret_cast<const char*>(p + header_off), header_len);
  if (header.find("'<f4'") == std::string::npos ||
      header.find("'fortran_order': False") == std::string::npos) {
    munmap(base, st.st_size);
    return false;
  }
  size_t sh = header.find("'shape':");
  if (sh == std::string::npos) { munmap(base, st.st_size); return false; }
  long r = 0, c = 1;
  if (sscanf(header.c_str() + sh, "'shape': (%ld, %ld", &r, &c) < 1) {
    munmap(base, st.st_size);
    return false;
  }
  out->data = reinterpret_cast<const float*>(p + header_off + header_len);
  out->rows = r;
  out->cols = c;
  out->map_base = base;
  out->map_len = st.st_size;
  return true;
}

struct Clip {
  std::string tracks_dir;
  std::vector<std::string> names;                  // frame names
  std::unordered_map<int64_t, MappedNpy> cache;    // (q * T + t) -> mapping
  int T = 0;

  ~Clip() {
    for (auto& kv : cache)
      if (kv.second.map_base) munmap(kv.second.map_base, kv.second.map_len);
  }

  const MappedNpy* get(int q, int t) {
    int64_t key = int64_t(q) * T + t;
    auto it = cache.find(key);
    if (it != cache.end()) return &it->second;
    std::string path = tracks_dir + "/" + names[q] + "_" + names[t] + ".npy";
    MappedNpy m;
    if (!parse_npy(path.c_str(), &m)) return nullptr;
    auto res = cache.emplace(key, m);
    return &res.first->second;
  }
};

// splitmix64: deterministic, seedable sampling
inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

}  // namespace

extern "C" {

// names: '\n'-joined frame names. Returns an opaque handle (or 0).
void* sav_open_clip(const char* tracks_dir, const char* names_joined) {
  auto* clip = new Clip();
  clip->tracks_dir = tracks_dir;
  const char* s = names_joined;
  while (*s) {
    const char* e = strchr(s, '\n');
    if (!e) e = s + strlen(s);
    clip->names.emplace_back(s, e - s);
    s = (*e) ? e + 1 : e;
  }
  clip->T = static_cast<int>(clip->names.size());
  return clip;
}

void sav_close_clip(void* handle) { delete static_cast<Clip*>(handle); }

// Number of tracks for pair (q, t); -1 on error.
int64_t sav_num_tracks(void* handle, int q, int t) {
  auto* clip = static_cast<Clip*>(handle);
  const MappedNpy* m = clip->get(q, t);
  return m ? m->rows : -1;
}

// Assemble one training batch for pair (q, t):
//   out_query [P,2]  query pixels (the q->q track positions)
//   out_tracks [P,4] target tracks (x, y, occ_logit, expected_dist)
//   out_valid [P]    1.0 for real rows, 0.0 for padding
// Subsamples P of N rows without replacement (deterministic in seed).
// Returns number of valid rows, or -1 on error.
int64_t sav_build_batch(void* handle, int q, int t, int64_t P, uint64_t seed,
                        float* out_query, float* out_tracks,
                        float* out_valid) {
  auto* clip = static_cast<Clip*>(handle);
  const MappedNpy* self = clip->get(q, q);
  const MappedNpy* tgt = clip->get(q, t);
  if (!self || !tgt || self->rows != tgt->rows || self->cols < 2 ||
      tgt->cols < 4)
    return -1;
  const int64_t N = self->rows;
  const int64_t n_out = P < N ? P : N;

  // partial Fisher-Yates over an index array for sampling w/o replacement
  std::vector<int64_t> idx(N);
  for (int64_t i = 0; i < N; i++) idx[i] = i;
  uint64_t state = seed * 0x9e3779b97f4a7c15ULL + (uint64_t(q) << 32) + t;
  if (P < N) {
    for (int64_t i = 0; i < n_out; i++) {
      int64_t jr = i + static_cast<int64_t>(splitmix64(state) % (N - i));
      std::swap(idx[i], idx[jr]);
    }
  }
  for (int64_t i = 0; i < n_out; i++) {
    const float* srow = self->data + idx[i] * self->cols;
    const float* trow = tgt->data + idx[i] * tgt->cols;
    out_query[i * 2 + 0] = srow[0];
    out_query[i * 2 + 1] = srow[1];
    for (int k = 0; k < 4; k++) out_tracks[i * 4 + k] = trow[k];
    out_valid[i] = 1.0f;
  }
  for (int64_t i = n_out; i < P; i++) {
    out_query[i * 2 + 0] = 0.0f;
    out_query[i * 2 + 1] = 0.0f;
    for (int k = 0; k < 4; k++) out_tracks[i * 4 + k] = 0.0f;
    out_valid[i] = 0.0f;
  }
  return n_out;
}

}  // extern "C"
