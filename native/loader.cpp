// Native data loader: fast parser for the reference's whitespace-number
// text files (features.txt / row_ptr.txt / col_idx.txt / labels.txt —
// format per reference README.md:22-27).
//
// The reference's loaders (load_features / load_int_array,
// GATv2_edge_based.cu:24-64) parse with single-threaded istringstream —
// minutes for OGBN-Products' multi-GB features.txt. This library mmap-reads
// the file once and parses in parallel chunks aligned to whitespace
// boundaries. Exposed via a minimal C ABI consumed by ctypes
// (gatv2_tpu/utils/native_loader.py).
//
// Build: make -C native   ->  libgatv2_loader.so

#include <cctype>
#include <cerrno>
#include <cstdint>
#include <climits>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sched.h>

#include "cpuinfo.h"
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// Whole-file read into a NUL-terminated heap buffer (strtof/strtol need the
// terminator; an mmap of an exactly page-sized file would not have one).
struct MappedFile {
  char* buf = nullptr;
  const char* data = nullptr;
  size_t size = 0;
  bool ok() const { return data != nullptr || size == 0; }
  ~MappedFile() { free(buf); }
};

bool map_file(const char* path, MappedFile* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return false;
  }
  out->size = static_cast<size_t>(st.st_size);
  out->buf = static_cast<char*>(malloc(out->size + 1));
  if (!out->buf) {
    close(fd);
    return false;
  }
  size_t done = 0;
  while (done < out->size) {
    ssize_t r = read(fd, out->buf + done, out->size - done);
    if (r <= 0) {
      close(fd);
      return false;
    }
    done += static_cast<size_t>(r);
  }
  close(fd);
  out->buf[out->size] = '\0';
  out->data = out->buf;
  return true;
}

inline bool is_space(char c) {
  return c == ' ' || c == '\n' || c == '\t' || c == '\r' || c == '\v' || c == '\f';
}

// Advance `pos` forward to the first whitespace at or after it (so chunks
// split on token boundaries).
size_t align_to_boundary(const char* data, size_t size, size_t pos) {
  while (pos < size && !is_space(data[pos])) ++pos;
  return pos;
}

size_t count_chunk(const char* data, size_t begin, size_t end) {
  size_t count = 0;
  bool in_token = false;
  for (size_t i = begin; i < end; ++i) {
    bool sp = is_space(data[i]);
    if (!sp && !in_token) ++count;
    in_token = !sp;
  }
  return count;
}

unsigned num_threads(size_t size) {
  unsigned hw = gatv2_usable_cpus();
  // don't spawn threads for small files
  size_t per = 1 << 20;
  size_t want = size / per + 1;
  return static_cast<unsigned>(want < hw ? want : hw);
}

struct Chunks {
  std::vector<size_t> begin, end;
};

Chunks make_chunks(const char* data, size_t size, unsigned nt) {
  Chunks c;
  size_t prev = 0;
  for (unsigned t = 0; t < nt; ++t) {
    size_t hi = (t + 1 == nt) ? size : align_to_boundary(data, size, size * (t + 1) / nt);
    c.begin.push_back(prev);
    c.end.push_back(hi);
    prev = hi;
  }
  return c;
}

template <typename T, typename ParseFn>
int64_t parse_parallel(const char* path, T* out, int64_t capacity, ParseFn parse_one) {
  MappedFile mf;
  if (!map_file(path, &mf) || !mf.ok()) return -1;
  if (mf.size == 0) return 0;
  unsigned nt = num_threads(mf.size);
  Chunks chunks = make_chunks(mf.data, mf.size, nt);

  // Pass 1: count tokens per chunk (parallel) to get output offsets.
  std::vector<size_t> counts(nt);
  {
    std::vector<std::thread> threads;
    for (unsigned t = 0; t < nt; ++t)
      threads.emplace_back([&, t] {
        counts[t] = count_chunk(mf.data, chunks.begin[t], chunks.end[t]);
      });
    for (auto& th : threads) th.join();
  }
  std::vector<size_t> offsets(nt + 1, 0);
  for (unsigned t = 0; t < nt; ++t) offsets[t + 1] = offsets[t] + counts[t];
  int64_t total = static_cast<int64_t>(offsets[nt]);
  if (total > capacity) return -2;

  // Pass 2: parse (parallel). Tokens must convert IN FULL: a partially
  // numeric token ("2.5x3") or an out-of-range int marks the file
  // malformed (-4) — silently dropping the tail would load corrupted data
  // that diverges from the numpy fallback.
  std::vector<int64_t> parsed(nt);
  std::vector<char> badv(nt, 0);
  {
    std::vector<std::thread> threads;
    for (unsigned t = 0; t < nt; ++t)
      threads.emplace_back([&, t] {
        const char* p = mf.data + chunks.begin[t];
        const char* hi = mf.data + chunks.end[t];
        T* dst = out + offsets[t];
        int64_t n = 0;
        bool bad = false;
        while (p < hi) {
          while (p < hi && is_space(*p)) ++p;
          if (p >= hi) break;
          const char* before = p;
          bool ok = true;
          T v = parse_one(&p, &ok);
          if (p == before || !ok || (p < hi && !is_space(*p))) {
            // no progress, range error, or unconsumed token tail
            bad = true;
            while (p < hi && !is_space(*p)) ++p;  // always advance
          } else {
            dst[n++] = v;
          }
        }
        parsed[t] = n;
        badv[t] = bad ? 1 : 0;
      });
    for (auto& th : threads) th.join();
  }
  for (unsigned t = 0; t < nt; ++t)
    if (badv[t]) return -4;
  int64_t got = 0;
  for (unsigned t = 0; t < nt; ++t) got += parsed[t];
  return got == total ? total : -3;
}

}  // namespace

extern "C" {

// Returns the number of whitespace-separated tokens, or -1 on IO error.
int64_t count_numbers(const char* path) {
  MappedFile mf;
  if (!map_file(path, &mf) || !mf.ok()) return -1;
  if (mf.size == 0) return 0;
  unsigned nt = num_threads(mf.size);
  Chunks chunks = make_chunks(mf.data, mf.size, nt);
  std::vector<size_t> counts(nt);
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < nt; ++t)
    threads.emplace_back([&, t] {
      counts[t] = count_chunk(mf.data, chunks.begin[t], chunks.end[t]);
    });
  for (auto& th : threads) th.join();
  int64_t total = 0;
  for (size_t c : counts) total += static_cast<int64_t>(c);
  return total;
}

// Parse all floats into `out` (capacity elements). Returns count parsed or
// <0 (-1 io, -2 capacity, -3 count mismatch, -4 malformed token).
int64_t parse_floats(const char* path, float* out, int64_t capacity) {
  return parse_parallel<float>(path, out, capacity,
                               [](const char** p, bool* /*ok*/) {
    char* endp;
    float v = strtof(*p, &endp);  // ERANGE -> +-inf/0, like the reference
    *p = endp;
    return v;
  });
}

// Parse all ints into `out`. Returns count parsed or <0 (see parse_floats;
// values outside int32 are malformed, not silently wrapped).
int64_t parse_ints(const char* path, int32_t* out, int64_t capacity) {
  return parse_parallel<int32_t>(path, out, capacity,
                                 [](const char** p, bool* ok) {
    char* endp;
    errno = 0;
    long long v = strtoll(*p, &endp, 10);
    if (errno == ERANGE || v > INT32_MAX || v < INT32_MIN) *ok = false;
    *p = endp;
    return static_cast<int32_t>(v);
  });
}

}  // extern "C"
