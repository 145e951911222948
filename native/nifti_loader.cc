// Native NIfTI-1 decoder + threaded prefetch pool.
//
// The reference loads volumes through a single-threaded Python DataLoader
// (reference: datasets/__init__.py:56-58, num_workers=0) and re-decodes
// every epoch. This library is the framework's native data tier: a
// C++ NIfTI-1 parser with zlib inflate, Fortran->C transposition, optional
// min-max normalization, and a worker pool that decodes whole batches
// behind the training step. Exposed via a C ABI for ctypes (no pybind11
// in the image).
//
// Layout contract: returns float32 C-contiguous (X, Y, Z) with the same
// indexing as transmf_ad_tpu.data.nifti.load.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr int kHeaderSize = 348;

struct Header {
  int ndim;
  int dims[7];
  int datatype;
  int vox_offset;
  float scl_slope, scl_inter;
  bool swap;  // byte-swapped (big-endian file)
};

uint16_t bswap16(uint16_t v) { return (v >> 8) | (v << 8); }
uint32_t bswap32(uint32_t v) {
  return ((v & 0xff) << 24) | ((v & 0xff00) << 8) | ((v >> 8) & 0xff00) |
         (v >> 24);
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t got = fread(out->data(), 1, n, f);
  fclose(f);
  return got == static_cast<size_t>(n);
}

// Inflate gzip data (with header) into `out`.
bool gunzip(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;  // gzip+zlib
  zs.next_in = const_cast<uint8_t*>(in.data());
  zs.avail_in = in.size();
  out->resize(in.size() * 4 + (1 << 20));
  int ret;
  size_t total = 0;
  do {
    if (total == out->size()) out->resize(out->size() * 2);
    zs.next_out = out->data() + total;
    zs.avail_out = out->size() - total;
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    total = zs.total_out;
  } while (ret != Z_STREAM_END);
  out->resize(total);
  inflateEnd(&zs);
  return true;
}

bool parse_header(const uint8_t* raw, size_t n, Header* h) {
  if (n < kHeaderSize) return false;
  int32_t sizeof_hdr;
  memcpy(&sizeof_hdr, raw, 4);
  h->swap = false;
  if (sizeof_hdr != kHeaderSize) {
    sizeof_hdr = bswap32(sizeof_hdr);
    if (sizeof_hdr != kHeaderSize) return false;
    h->swap = true;
  }
  if (memcmp(raw + 344, "n+1", 3) != 0 && memcmp(raw + 344, "ni1", 3) != 0)
    return false;
  int16_t dim[8];
  memcpy(dim, raw + 40, 16);
  if (h->swap)
    for (auto& d : dim) d = bswap16(d);
  h->ndim = dim[0];
  if (h->ndim < 1 || h->ndim > 7) return false;
  for (int i = 0; i < 7; i++) h->dims[i] = i < h->ndim ? dim[i + 1] : 1;
  int16_t dt;
  memcpy(&dt, raw + 70, 2);
  if (h->swap) dt = bswap16(dt);
  h->datatype = dt;
  float vox;
  memcpy(&vox, raw + 108, 4);
  if (h->swap) {
    uint32_t u;
    memcpy(&u, &vox, 4);
    u = bswap32(u);
    memcpy(&vox, &u, 4);
  }
  h->vox_offset = vox > 0 ? static_cast<int>(vox) : kHeaderSize + 4;
  float ss[2];
  memcpy(ss, raw + 112, 8);
  if (h->swap) {
    for (int i = 0; i < 2; i++) {
      uint32_t u;
      memcpy(&u, &ss[i], 4);
      u = bswap32(u);
      memcpy(&ss[i], &u, 4);
    }
  }
  h->scl_slope = ss[0];
  h->scl_inter = ss[1];
  return true;
}

template <typename T>
float to_float(const uint8_t* p, bool swap) {
  T v;
  memcpy(&v, p, sizeof(T));
  if (swap) {
    if (sizeof(T) == 2) {
      uint16_t u;
      memcpy(&u, &v, 2);
      u = bswap16(u);
      memcpy(&v, &u, 2);
    } else if (sizeof(T) == 4) {
      uint32_t u;
      memcpy(&u, &v, 4);
      u = bswap32(u);
      memcpy(&v, &u, 4);
    }
  }
  return static_cast<float>(v);
}

// Decode one file into out (C-order float32, nx*ny*nz). Returns 0 on
// success, negative error code otherwise. Checks shape against expected.
int decode_one(const char* path, float* out, int nx, int ny, int nz,
               int normalize) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return -1;
  std::vector<uint8_t> buf;
  const uint8_t* data = raw.data();
  size_t n = raw.size();
  if (n >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    if (!gunzip(raw, &buf)) return -2;
    data = buf.data();
    n = buf.size();
  }
  Header h;
  if (!parse_header(data, n, &h)) return -3;
  // squeeze trailing singleton dims
  int nd = h.ndim;
  while (nd > 3 && h.dims[nd - 1] == 1) nd--;
  if (nd != 3 || h.dims[0] != nx || h.dims[1] != ny || h.dims[2] != nz)
    return -4;
  size_t count = static_cast<size_t>(nx) * ny * nz;
  int esize;
  switch (h.datatype) {
    case 2: case 256: esize = 1; break;
    case 4: case 512: esize = 2; break;
    case 8: case 768: case 16: esize = 4; break;
    case 64: esize = 8; break;
    default: return -5;
  }
  if (n < h.vox_offset + count * esize) return -6;
  const uint8_t* vox = data + h.vox_offset;

  // Fortran (x fastest) -> C order (z fastest), with dtype conversion.
  auto convert = [&](auto tag) {
    using T = decltype(tag);
    for (int z = 0; z < nz; z++)
      for (int y = 0; y < ny; y++) {
        const uint8_t* src =
            vox + (static_cast<size_t>(z) * ny + y) * nx * sizeof(T);
        for (int x = 0; x < nx; x++)
          out[(static_cast<size_t>(x) * ny + y) * nz + z] =
              to_float<T>(src + x * sizeof(T), h.swap);
      }
  };
  switch (h.datatype) {
    case 2: convert(uint8_t{}); break;
    case 256: convert(int8_t{}); break;
    case 4: convert(int16_t{}); break;
    case 512: convert(uint16_t{}); break;
    case 8: convert(int32_t{}); break;
    case 768: convert(uint32_t{}); break;
    case 16: convert(float{}); break;
    case 64: convert(double{}); break;
    default: return -5;
  }
  if (h.scl_slope != 0.f && !(h.scl_slope == 1.f && h.scl_inter == 0.f)) {
    for (size_t i = 0; i < count; i++)
      out[i] = out[i] * h.scl_slope + h.scl_inter;
  }
  if (normalize) {
    float lo = out[0], hi = out[0];
    for (size_t i = 1; i < count; i++) {
      lo = out[i] < lo ? out[i] : lo;
      hi = out[i] > hi ? out[i] : hi;
    }
    float range = hi - lo;
    if (range > 0) {
      float inv = 1.0f / range;
      for (size_t i = 0; i < count; i++) out[i] = (out[i] - lo) * inv;
    } else {
      memset(out, 0, count * sizeof(float));
    }
  }
  return 0;
}

// ---- worker pool ----

class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; i++)
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

Pool* pool = nullptr;
std::mutex pool_mu;

}  // namespace

extern "C" {

// Initialize the worker pool (idempotent). threads<=0 -> hw concurrency.
void nifti_pool_init(int threads) {
  std::lock_guard<std::mutex> lk(pool_mu);
  if (pool) return;
  if (threads <= 0) {
    threads = static_cast<int>(std::thread::hardware_concurrency());
    if (threads < 1) threads = 1;
  }
  pool = new Pool(threads);
}

// Decode a single volume. Returns 0 on success.
int nifti_decode(const char* path, float* out, int nx, int ny, int nz,
                 int normalize) {
  return decode_one(path, out, nx, ny, nz, normalize);
}

// Decode `n` volumes in parallel into out (n, nx*ny*nz). `paths` is a
// NUL-separated buffer of n paths. Returns 0 if all succeeded, else the
// first nonzero error code.
int nifti_decode_batch(const char* paths, int n, float* out, int nx, int ny,
                       int nz, int normalize) {
  nifti_pool_init(0);
  std::vector<const char*> ps(n);
  const char* p = paths;
  for (int i = 0; i < n; i++) {
    ps[i] = p;
    p += strlen(p) + 1;
  }
  std::vector<int> rc(n, 0);
  std::mutex done_mu;
  std::condition_variable done_cv;
  int remaining = n;
  size_t stride = static_cast<size_t>(nx) * ny * nz;
  for (int i = 0; i < n; i++) {
    pool->submit([&, i] {
      rc[i] = decode_one(ps[i], out + i * stride, nx, ny, nz, normalize);
      std::lock_guard<std::mutex> lk(done_mu);
      if (--remaining == 0) done_cv.notify_one();
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining == 0; });
  for (int i = 0; i < n; i++)
    if (rc[i] != 0) return rc[i];
  return 0;
}

// Parse just the header dims; returns 0 and writes dims[3] on success.
int nifti_peek_dims(const char* path, int* dims) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return -1;
  std::vector<uint8_t> buf;
  const uint8_t* data = raw.data();
  size_t n = raw.size();
  if (n >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    if (!gunzip(raw, &buf)) return -2;
    data = buf.data();
    n = buf.size();
  }
  Header h;
  if (!parse_header(data, n, &h)) return -3;
  int nd = h.ndim;
  while (nd > 3 && h.dims[nd - 1] == 1) nd--;
  if (nd != 3) return -4;
  for (int i = 0; i < 3; i++) dims[i] = h.dims[i];
  return 0;
}

}  // extern "C"
