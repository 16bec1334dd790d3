// Append-only mmap record store: the preprocessed-graph cache backend.
//
// Native replacement for the reference's LMDB dependency
// (alignn/lmdb_dataset.py:47,155-226 — pickled (g, lg, ...) tuples in an
// LMDB environment).  Records are opaque byte blobs addressed by dense
// integer index; layout:
//
//   data file   : [blob 0][blob 1]...[blob n-1]
//   index file  : int64 n, then n x (int64 offset, int64 length)
//
// Writes are append-only (one writer); reads mmap both files and serve
// zero-copy pointers (many readers, e.g. dataloader workers).
//
// Build: g++ -O3 -shared -fPIC -o librecordstore.so recordstore.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct Writer {
  FILE* data;
  std::vector<int64_t> offsets;
  std::vector<int64_t> lengths;
  int64_t pos = 0;
  std::string path;
};

struct Reader {
  const uint8_t* data = nullptr;
  size_t data_size = 0;
  const int64_t* index = nullptr;  // [1 + 2n]
  size_t index_size = 0;
  int64_t n = 0;
};

}  // namespace

extern "C" {

void* rs_writer_open(const char* path) {
  auto* w = new Writer();
  w->path = path;
  std::string dpath = w->path + ".data";
  // invalidate any PREVIOUS index up front: "wb" truncates .data at
  // open, and an interrupted rebuild would otherwise leave a stale
  // .idx pointing into the truncated data (SIGBUS / silently corrupt
  // records); the new index is only published at close.
  unlink((w->path + ".idx").c_str());
  w->data = fopen(dpath.c_str(), "wb");
  if (!w->data) {
    delete w;
    return nullptr;
  }
  return w;
}

int64_t rs_writer_put(void* handle, const uint8_t* buf, int64_t len) {
  auto* w = (Writer*)handle;
  if (fwrite(buf, 1, (size_t)len, w->data) != (size_t)len) return -1;
  w->offsets.push_back(w->pos);
  w->lengths.push_back(len);
  w->pos += len;
  return (int64_t)w->offsets.size() - 1;
}

int rs_writer_close(void* handle) {
  // every write/close return is checked: buffered ENOSPC often only
  // surfaces at fclose, and a swallowed failure publishes a cache the
  // next run trusts (data/cache.py raises on our -1)
  auto* w = (Writer*)handle;
  int rc = 0;
  if (fclose(w->data) != 0) rc = -1;
  std::string ipath = w->path + ".idx";
  FILE* idx = fopen(ipath.c_str(), "wb");
  if (!idx) {
    delete w;
    return -1;
  }
  int64_t n = (int64_t)w->offsets.size();
  if (fwrite(&n, sizeof(int64_t), 1, idx) != 1) rc = -1;
  for (int64_t i = 0; i < n; ++i) {
    if (fwrite(&w->offsets[i], sizeof(int64_t), 1, idx) != 1) rc = -1;
    if (fwrite(&w->lengths[i], sizeof(int64_t), 1, idx) != 1) rc = -1;
  }
  if (fclose(idx) != 0) rc = -1;
  if (rc != 0) unlink(ipath.c_str());  // do not publish a bad index
  delete w;
  return rc;
}

static void* map_file(const std::string& path, size_t* size) {
  int fd = open(path.c_str(), O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    return nullptr;
  }
  void* p = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  close(fd);
  if (p == MAP_FAILED) return nullptr;
  *size = (size_t)st.st_size;
  return p;
}

void* rs_reader_open(const char* path) {
  auto* r = new Reader();
  std::string base(path);
  size_t dsize = 0, isize = 0;
  void* d = map_file(base + ".data", &dsize);
  void* i = map_file(base + ".idx", &isize);
  if (!i || (isize < sizeof(int64_t))) {
    if (d) munmap(d, dsize);
    if (i) munmap(i, isize);
    delete r;
    return nullptr;
  }
  r->data = (const uint8_t*)d;
  r->data_size = dsize;
  r->index = (const int64_t*)i;
  r->index_size = isize;
  r->n = r->index[0];
  // clamp n to what the mapped index actually holds (truncated .idx
  // from a disk-full close must not drive out-of-bounds reads)
  int64_t max_n = (int64_t)((isize - sizeof(int64_t)) /
                            (2 * sizeof(int64_t)));
  if (r->n < 0 || r->n > max_n) r->n = max_n < 0 ? 0 : max_n;
  return r;
}

int64_t rs_reader_count(void* handle) { return ((Reader*)handle)->n; }

// Returns blob length; copies up to cap bytes into out.
int64_t rs_reader_get(void* handle, int64_t idx, uint8_t* out,
                      int64_t cap) {
  auto* r = (Reader*)handle;
  if (idx < 0 || idx >= r->n) return -1;
  int64_t off = r->index[1 + 2 * idx];
  int64_t len = r->index[2 + 2 * idx];
  // bounds-check against the mapped data (stale/corrupt index would
  // otherwise SIGBUS deep in memcpy instead of erroring in Python)
  if (off < 0 || len < 0 || (uint64_t)off + (uint64_t)len >
      (uint64_t)r->data_size) return -1;
  if (out && cap >= len && r->data)
    memcpy(out, r->data + off, (size_t)len);
  return len;
}

void rs_reader_close(void* handle) {
  auto* r = (Reader*)handle;
  if (r->data) munmap((void*)r->data, r->data_size);
  if (r->index) munmap((void*)r->index, r->index_size);
  delete r;
}

}  // extern "C"
