// Native host-side IO for the TPU retrieval framework.
//
// The reference delegated its native needs to the external FAISS wheel; the
// TPU build's native surface is the *host data path*: parsing .fvecs/.ivecs
// corpora (SIFT1M-style) and streaming large embedding files into reusable
// buffers that feed host->device transfers. Python/NumPy fallbacks exist for
// every entry point (data/native_io.py); this library removes the
// Python-loop and double-copy overheads for the multi-GB cases.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 dependency).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct MappedFile {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) return false;
    size = static_cast<size_t>(st.st_size);
    if (size == 0) {
      data = nullptr;
      return true;
    }
    void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) return false;
    madvise(p, size, MADV_SEQUENTIAL);
    data = static_cast<const uint8_t*>(p);
    return true;
  }

  ~MappedFile() {
    if (data) munmap(const_cast<uint8_t*>(data), size);
    if (fd >= 0) close(fd);
  }
};

// Copy the payload of rows [row_begin, row_end) of a *vecs file (stride =
// 4 + dim*4 bytes per row: int32 dim header then dim 4-byte elements).
void copy_rows(const uint8_t* base, size_t stride, size_t dim_bytes,
               long row_begin, long row_end, uint8_t* out) {
  for (long r = row_begin; r < row_end; ++r) {
    std::memcpy(out + static_cast<size_t>(r) * dim_bytes,
                base + static_cast<size_t>(r) * stride + 4, dim_bytes);
  }
}

int read_vecs(const char* path, void* out, long max_rows, long* rows_out,
              long* dim_out) {
  MappedFile mf;
  if (!mf.open(path)) return -1;
  if (mf.size < 4) {
    *rows_out = 0;
    *dim_out = 0;
    return 0;
  }
  int32_t dim;
  std::memcpy(&dim, mf.data, 4);
  if (dim <= 0 || dim > (1 << 20)) return -2;
  const size_t stride = 4 + static_cast<size_t>(dim) * 4;
  long rows = static_cast<long>(mf.size / stride);
  if (max_rows >= 0 && rows > max_rows) rows = max_rows;

  // validate headers (cheap scan; catches truncated/corrupt files)
  for (long r = 0; r < rows; ++r) {
    int32_t d;
    std::memcpy(&d, mf.data + static_cast<size_t>(r) * stride, 4);
    if (d != dim) return -3;
  }

  const size_t dim_bytes = static_cast<size_t>(dim) * 4;
  unsigned n_threads = std::thread::hardware_concurrency();
  if (n_threads == 0) n_threads = 4;
  if (rows < 4096) n_threads = 1;
  std::vector<std::thread> threads;
  long per = (rows + static_cast<long>(n_threads) - 1) /
             static_cast<long>(n_threads);
  for (unsigned t = 0; t < n_threads; ++t) {
    long b = static_cast<long>(t) * per;
    long e = b + per < rows ? b + per : rows;
    if (b >= e) break;
    threads.emplace_back(copy_rows, mf.data, stride, dim_bytes, b, e,
                         static_cast<uint8_t*>(out));
  }
  for (auto& th : threads) th.join();
  *rows_out = rows;
  *dim_out = dim;
  return 0;
}

// ---- double-buffered prefetching stream reader ---------------------------

struct Stream {
  FILE* f = nullptr;
  size_t chunk = 0;
  std::vector<uint8_t> buf[2];
  long len[2] = {0, 0};
  int ready_slot = -1;   // slot holding a prefetched chunk
  bool eof = false;
  bool pending = false;  // a prefetch is in flight
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  bool want_next = false;
  bool stop = false;

  void prefetch_loop() {
    int slot = 0;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return want_next || stop; });
        if (stop) return;
        want_next = false;
      }
      size_t n = fread(buf[slot].data(), 1, chunk, f);
      {
        std::lock_guard<std::mutex> lk(mu);
        len[slot] = static_cast<long>(n);
        ready_slot = slot;
        if (n < chunk) eof = true;
        pending = false;
      }
      cv.notify_all();
      slot ^= 1;
    }
  }
};

}  // namespace

extern "C" {

// Parse an .fvecs file into out (float32, row-major, headers stripped).
// Returns 0 on success; rows_out/dim_out receive the geometry.
int vrt_read_fvecs(const char* path, float* out, long max_rows,
                   long* rows_out, long* dim_out) {
  return read_vecs(path, out, max_rows, rows_out, dim_out);
}

// Parse an .ivecs file into out (int32).
int vrt_read_ivecs(const char* path, int32_t* out, long max_rows,
                   long* rows_out, long* dim_out) {
  return read_vecs(path, out, max_rows, rows_out, dim_out);
}

// Geometry probe without copying: rows/dim of a *vecs file.
int vrt_vecs_shape(const char* path, long* rows_out, long* dim_out) {
  MappedFile mf;
  if (!mf.open(path)) return -1;
  if (mf.size < 4) {
    *rows_out = 0;
    *dim_out = 0;
    return 0;
  }
  int32_t dim;
  std::memcpy(&dim, mf.data, 4);
  if (dim <= 0 || dim > (1 << 20)) return -2;
  const size_t stride = 4 + static_cast<size_t>(dim) * 4;
  *rows_out = static_cast<long>(mf.size / stride);
  *dim_out = dim;
  return 0;
}

// Open a raw binary stream with background prefetch (double buffered).
void* vrt_stream_open(const char* path, long offset, long chunk_bytes) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  if (offset > 0 && fseek(f, offset, SEEK_SET) != 0) {
    fclose(f);
    return nullptr;
  }
  auto* s = new Stream();
  s->f = f;
  s->chunk = static_cast<size_t>(chunk_bytes);
  s->buf[0].resize(s->chunk);
  s->buf[1].resize(s->chunk);
  s->worker = std::thread(&Stream::prefetch_loop, s);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->want_next = true;
    s->pending = true;
  }
  s->cv.notify_all();
  return s;
}

// Copy the next chunk into out; returns bytes copied (0 at EOF). The
// following chunk is prefetched while the caller processes this one.
long vrt_stream_next(void* handle, uint8_t* out) {
  auto* s = static_cast<Stream*>(handle);
  int slot;
  long n;
  bool kick = false;
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv.wait(lk, [&] { return s->ready_slot >= 0 || (s->eof && !s->pending); });
    if (s->ready_slot < 0) return 0;  // fully drained
    slot = s->ready_slot;
    n = s->len[slot];
    s->ready_slot = -1;
    if (!s->eof) {
      s->want_next = true;
      s->pending = true;
      kick = true;
    }
  }
  if (kick) s->cv.notify_all();
  if (n > 0) std::memcpy(out, s->buf[slot].data(), static_cast<size_t>(n));
  return n;
}

void vrt_stream_close(void* handle) {
  auto* s = static_cast<Stream*>(handle);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->stop = true;
  }
  s->cv.notify_all();
  s->worker.join();
  fclose(s->f);
  delete s;
}

}  // extern "C"
