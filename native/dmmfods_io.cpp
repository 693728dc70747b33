// dmmfods_io — native host-side IO runtime for the input pipeline.
//
// The reference's input pipeline is torch DataLoader worker *processes*
// unpickling torch tensor files (reference dmmfods/datasets/WaymoData.py:97,
// helper.py:136-143). This library is the TPU-framework equivalent: a small
// C++ runtime that reads serialized batch files (.npy), converts layout
// (NCHW -> NHWC) and splits channels (RGB / LiDAR / heat map) in one pass,
// plus a threaded read-ahead prefetcher — all off the Python GIL so the host
// loop can keep a TPU fed. Exposed via a C ABI for ctypes binding
// (dmmfods_tpu/data/native_io.py).
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal .npy (format v1/v2) reader for C-contiguous little-endian arrays.
// ---------------------------------------------------------------------------

struct NpyInfo {
  std::vector<int64_t> shape;
  size_t word_size = 0;   // bytes per element
  char kind = 'f';        // 'f' float, 'i' int, 'u' uint
  size_t data_offset = 0; // byte offset of the raw data
};

bool parse_npy_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char hl[2];
    if (fread(hl, 1, 2, f) != 2) return false;
    header_len = hl[0] | (hl[1] << 8);
    info->data_offset = 10 + header_len;
  } else {
    unsigned char hl[4];
    if (fread(hl, 1, 4, f) != 4) return false;
    header_len = hl[0] | (hl[1] << 8) | (hl[2] << 16) | ((uint32_t)hl[3] << 24);
    info->data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;

  // descr
  size_t dpos = header.find("'descr'");
  if (dpos == std::string::npos) return false;
  size_t q1 = header.find('\'', dpos + 7);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr.size() < 3 || (descr[0] != '<' && descr[0] != '|' && descr[0] != '=')) return false;
  info->kind = descr[1];
  info->word_size = std::stoul(descr.substr(2));

  // fortran_order must be False
  if (header.find("'fortran_order': True") != std::string::npos) return false;

  // shape
  size_t spos = header.find("'shape'");
  size_t p1 = header.find('(', spos);
  size_t p2 = header.find(')', p1);
  std::string dims = header.substr(p1 + 1, p2 - p1 - 1);
  info->shape.clear();
  size_t start = 0;
  while (start < dims.size()) {
    size_t comma = dims.find(',', start);
    std::string tok = dims.substr(start, comma == std::string::npos ? std::string::npos
                                                                     : comma - start);
    // trim
    size_t b = tok.find_first_not_of(" \t");
    if (b != std::string::npos) {
      size_t e = tok.find_last_not_of(" \t");
      tok = tok.substr(b, e - b + 1);
      if (!tok.empty()) info->shape.push_back(std::stoll(tok));
    }
    if (comma == std::string::npos) break;
    start = comma + 1;
  }
  return !info->shape.empty();
}

int64_t numel(const std::vector<int64_t>& shape) {
  int64_t n = 1;
  for (auto d : shape) n *= d;
  return n;
}

// ---------------------------------------------------------------------------
// Minimal STORED-zip (.npz) member locator. np.savez writes uncompressed
// members (raw-record files, data/converter.py::save_raw_data_in_batch are
// np.savez on a seekable file: method 0, no data descriptors). Member sizes
// are derived from the EMBEDDED npy header, which sidesteps zip64 local-
// header size fields entirely.
// ---------------------------------------------------------------------------

bool find_npz_member(FILE* f, const char* want, NpyInfo* info) {
  if (fseek(f, 0, SEEK_SET) != 0) return false;
  for (;;) {
    unsigned char hdr[30];
    if (fread(hdr, 1, 30, f) != 30) return false;
    const uint32_t sig = hdr[0] | (hdr[1] << 8) | (hdr[2] << 16) |
                         ((uint32_t)hdr[3] << 24);
    if (sig != 0x04034b50) return false;  // central directory: not found
    const uint16_t flags = hdr[6] | (hdr[7] << 8);
    const uint16_t method = hdr[8] | (hdr[9] << 8);
    const uint16_t name_len = hdr[26] | (hdr[27] << 8);
    const uint16_t extra_len = hdr[28] | (hdr[29] << 8);
    std::string name(name_len, '\0');
    if (fread(&name[0], 1, name_len, f) != name_len) return false;
    if (fseek(f, extra_len, SEEK_CUR) != 0) return false;
    if (method != 0 || (flags & 0x08)) return false;  // compressed/streamed
    const long data_pos = ftell(f);
    NpyInfo mi;
    if (!parse_npy_header(f, &mi)) return false;
    const size_t member_size =
        mi.data_offset + (size_t)numel(mi.shape) * mi.word_size;
    if (name == want) {
      *info = mi;
      info->data_offset += (size_t)data_pos;  // absolute file offset
      return true;
    }
    if (fseek(f, data_pos + (long)member_size, SEEK_SET) != 0) return false;
  }
}

bool read_member_data(FILE* f, const NpyInfo& info, void* dst) {
  const size_t bytes = (size_t)numel(info.shape) * info.word_size;
  return fseek(f, (long)info.data_offset, SEEK_SET) == 0 &&
         fread(dst, 1, bytes, f) == bytes;
}

}  // namespace

extern "C" {

// Read an .npy file's shape: fills shape[0..7], returns ndim (<=8), -1 on err.
int dmm_npy_shape(const char* path, int64_t* shape_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  bool ok = parse_npy_header(f, &info);
  fclose(f);
  if (!ok || info.shape.size() > 8) return -1;
  for (size_t i = 0; i < info.shape.size(); ++i) shape_out[i] = info.shape[i];
  return (int)info.shape.size();
}

// NCHW -> NHWC float32 transpose (cache-blocked over channels).
void dmm_nchw_to_nhwc_f32(const float* src, float* dst, int64_t n, int64_t c,
                          int64_t h, int64_t w) {
  const int64_t hw = h * w;
  for (int64_t i = 0; i < n; ++i) {
    const float* sample = src + i * c * hw;
    float* out = dst + i * hw * c;
    for (int64_t ch = 0; ch < c; ++ch) {
      const float* plane = sample + ch * hw;
      float* o = out + ch;
      for (int64_t p = 0; p < hw; ++p) o[p * c] = plane[p];
    }
  }
}

// Load a serialized batch file (.npy float32, either (N,7,H,W) legacy or
// (N,H,W,7) native) and split into NHWC image(3)/lidar(1)/heatmap(3) buffers.
// Caller allocates: img N*H*W*3, lidar N*H*W*1, ht N*H*W*3 floats.
// Returns 0 on success.
int dmm_load_batch_f32(const char* path, float* img, float* lidar, float* ht,
                       int64_t* n_out, int64_t* h_out, int64_t* w_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  NpyInfo info;
  if (!parse_npy_header(f, &info) || info.shape.size() != 4 ||
      info.kind != 'f' || info.word_size != 4) {
    fclose(f);
    return 2;
  }
  int64_t n, h, w;
  bool channel_last;
  if (info.shape[3] == 7) {            // (N, H, W, 7)
    n = info.shape[0]; h = info.shape[1]; w = info.shape[2];
    channel_last = true;
  } else if (info.shape[1] == 7) {     // (N, 7, H, W) legacy
    n = info.shape[0]; h = info.shape[2]; w = info.shape[3];
    channel_last = false;
  } else {
    fclose(f);
    return 3;
  }
  *n_out = n; *h_out = h; *w_out = w;

  const int64_t total = numel(info.shape);
  std::vector<float> buf(total);
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0 ||
      fread(buf.data(), 4, total, f) != (size_t)total) {
    fclose(f);
    return 4;
  }
  fclose(f);

  const int64_t hw = h * w;
  if (channel_last) {
    for (int64_t i = 0; i < n; ++i) {
      const float* s = buf.data() + i * hw * 7;
      float* pi = img + i * hw * 3;
      float* pl = lidar + i * hw;
      float* ph = ht + i * hw * 3;
      for (int64_t p = 0; p < hw; ++p) {
        const float* px = s + p * 7;
        pi[p * 3 + 0] = px[0]; pi[p * 3 + 1] = px[1]; pi[p * 3 + 2] = px[2];
        pl[p] = px[3];
        ph[p * 3 + 0] = px[4]; ph[p * 3 + 1] = px[5]; ph[p * 3 + 2] = px[6];
      }
    }
  } else {
    for (int64_t i = 0; i < n; ++i) {
      const float* s = buf.data() + i * 7 * hw;
      float* pi = img + i * hw * 3;
      float* pl = lidar + i * hw;
      float* ph = ht + i * hw * 3;
      for (int64_t ch = 0; ch < 3; ++ch) {
        const float* plane = s + ch * hw;
        for (int64_t p = 0; p < hw; ++p) pi[p * 3 + ch] = plane[p];
      }
      memcpy(pl, s + 3 * hw, hw * 4);
      for (int64_t ch = 0; ch < 3; ++ch) {
        const float* plane = s + (4 + ch) * hw;
        for (int64_t p = 0; p < hw; ++p) ph[p * 3 + ch] = plane[p];
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// LiDAR point splat -> pooled model input (host-runtime preprocessing).
//
// Exact C++ twin of ops/preprocess.py::lidar_points_to_model_input_pooled
// (itself the direct-to-pooled equivalent of the reference splat+bin+pool,
// reference dmmfods/utils/Dense_U_Net_lidar_helper.py:446-515). Rationale:
// random scatter-min is the one preprocessing op TPUs are bad at — measured
// ~45 ms per 32x32k-point batch in-graph (XLA scatter serializes; a 2-key
// sort formulation measured 175 ms) — while a host core does the same
// entries in ~2 ms. So the splat runs here, inside the GIL-free prefetch
// threads, overlapped with device compute; heat-map rasterization (box-
// structured, no scatter) stays in-graph on device.
// ---------------------------------------------------------------------------

namespace {

inline float bin_lidar_range(float x) {
  // reference helper.py:446-478 semantics (see ops/preprocess.py):
  // clip >75 to 75, then 155 close bins / 100 far bins.
  if (x > 75.0f) x = 75.0f;
  if (x == -1.0f) x = 76.0f;  // empty marker (not produced on this path)
  return x <= 25.0f ? x * -6.2f + 255.0f : x * -2.0f + 150.0f;
}

// One sample: points (n x 3 rows [x, y, distance]) -> out (height/10 rows x
// width/10 cols), matching lidar_points_to_model_input_pooled exactly:
// nearest-point (min distance) 5x5-footprint splat onto the (20,10)/s10
// pooled grid, binned, bottom row replicate-padded, negatives clamped to 0.
void splat_pooled_one(const float* pts, int64_t n, int64_t height,
                      int64_t width, float* out, float* cell_scratch) {
  const int64_t ch = height / 10;   // 10x10 cell rows (non-overlapping)
  const int64_t cw = width / 10;
  const float inf = __builtin_huge_valf();
  float* cells = cell_scratch;      // (ch * cw) min-distance grid
  for (int64_t i = 0; i < ch * cw; ++i) cells[i] = inf;

  for (int64_t i = 0; i < n; ++i) {
    const float x = pts[i * 3 + 0];
    const float y = pts[i * 3 + 1];
    const float d = pts[i * 3 + 2];
    if (!(x > -1e9f && x < 1e9f && y > -1e9f && y < 1e9f)) continue;
    const int64_t px = (int64_t)x;  // trunc toward zero, as the jnp path
    const int64_t py = (int64_t)y;
    // clipped 5x5 footprint (the splat never writes the last row/col:
    // reference helper.py:507-511 slice clamps)
    const int64_t ylo = py - 2 > 0 ? py - 2 : 0;
    const int64_t yhi = py + 2 < height - 2 ? py + 2 : height - 2;
    const int64_t xlo = px - 2 > 0 ? px - 2 : 0;
    const int64_t xhi = px + 2 < width - 2 ? px + 2 : width - 2;
    if (ylo > yhi || xlo > xhi) continue;
    for (int64_t r = ylo / 10; r <= yhi / 10; ++r)
      for (int64_t c = xlo / 10; c <= xhi / 10; ++c) {
        float& cell = cells[r * cw + c];
        if (d < cell) cell = d;
      }
  }

  // (20,10)-window min = min of two adjacent 10x10 cell rows; bin; clamp.
  for (int64_t r = 0; r < ch - 1; ++r) {
    const float* a = cells + r * cw;
    const float* b = cells + (r + 1) * cw;
    float* o = out + r * cw;
    for (int64_t c = 0; c < cw; ++c) {
      const float m = a[c] < b[c] ? a[c] : b[c];
      const float v = m == inf ? -2.0f : bin_lidar_range(m);
      o[c] = v < 0.0f ? 0.0f : v;
    }
  }
  // bottom replicate pad (reference helper.py:480-485)
  memcpy(out + (ch - 1) * cw, out + (ch - 2) * cw, cw * sizeof(float));
}

}  // namespace

// Single sample. out must hold (height/10) * (width/10) floats.
int dmm_splat_pooled_f32(const float* points, int64_t n, int64_t height,
                         int64_t width, float* out) {
  if (height < 30 || width < 20 || height % 10 || width % 10) return 1;
  std::vector<float> scratch((height / 10) * (width / 10));
  splat_pooled_one(points, n, height, width, out, scratch.data());
  return 0;
}

// Batched ragged points: sample i owns rows [offsets[i], offsets[i+1]) of
// points_concat. out holds batch * (height/10) * (width/10) floats. Splits
// samples across num_threads worker threads; one C call covers the whole
// batch so Python's GIL is released for all of it.
int dmm_splat_pooled_batch_f32(const float* points_concat,
                               const int64_t* offsets, int64_t batch,
                               int64_t height, int64_t width, float* out,
                               int64_t num_threads) {
  if (height < 30 || width < 20 || height % 10 || width % 10) return 1;
  const int64_t plane = (height / 10) * (width / 10);
  if (num_threads < 1) num_threads = 1;
  if (num_threads > batch) num_threads = batch;
  std::atomic<int64_t> next{0};
  auto work = [&] {
    std::vector<float> scratch(plane);
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= batch) return;
      splat_pooled_one(points_concat + offsets[i] * 3,
                       offsets[i + 1] - offsets[i], height, width,
                       out + i * plane, scratch.data());
    }
  };
  if (num_threads == 1) {
    work();
  } else {
    std::vector<std::thread> threads;
    for (int64_t t = 0; t < num_threads; ++t) threads.emplace_back(work);
    for (auto& t : threads) t.join();
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Threaded read-ahead prefetcher: N reader threads decode batch files into a
// bounded queue; the consumer pops ready NHWC buffers. GIL-free. Two modes:
// dense (.npy 7-channel batches -> img/lidar/ht) and RAW (.npz records ->
// img/boxes + the LiDAR splat executed right here in the reader thread, so
// the default raw-record training path gets the same read-ahead as dense).
// ---------------------------------------------------------------------------

struct DmmBatch {
  std::vector<float> img, lidar, ht;
  std::vector<int32_t> boxes;
  int64_t n = 0, h = 0, w = 0, mb = 0;
  int status = 0;
};

// Raw-record (.npz) decode + in-thread splat. Keys per
// data/converter.py::save_raw_data_in_batch: images (B,h,w,3) f4,
// points (M,3) f4, offsets (B+1) i8, boxes (B,mb,5) i4.
static int decode_raw_record(const std::string& path, int64_t full_h,
                             int64_t full_w, DmmBatch* b) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return 1;
  NpyInfo im, pt, of, bx;
  if (!find_npz_member(f, "images.npy", &im) || im.shape.size() != 4 ||
      im.shape[3] != 3 || im.kind != 'f' || im.word_size != 4) {
    fclose(f);
    return 2;
  }
  if (!find_npz_member(f, "points.npy", &pt) || pt.kind != 'f' ||
      pt.word_size != 4 || pt.shape.size() != 2 || pt.shape[1] != 3) {
    fclose(f);
    return 3;
  }
  if (!find_npz_member(f, "offsets.npy", &of) || of.kind != 'i' ||
      of.word_size != 8) {
    fclose(f);
    return 4;
  }
  if (!find_npz_member(f, "boxes.npy", &bx) || bx.kind != 'i' ||
      bx.word_size != 4 || bx.shape.size() != 3) {
    fclose(f);
    return 5;
  }
  const int64_t n = im.shape[0], h = im.shape[1], w = im.shape[2];
  if (full_h / 10 != h || full_w / 10 != w || of.shape[0] != n + 1 ||
      bx.shape[0] != n) {
    fclose(f);
    return 6;
  }
  b->img.resize((size_t)n * h * w * 3);
  b->boxes.resize((size_t)numel(bx.shape));
  std::vector<float> pts((size_t)numel(pt.shape));
  std::vector<int64_t> offs((size_t)of.shape[0]);
  const bool ok = read_member_data(f, im, b->img.data()) &&
                  read_member_data(f, pt, pts.data()) &&
                  read_member_data(f, of, offs.data()) &&
                  read_member_data(f, bx, b->boxes.data());
  fclose(f);
  if (!ok) return 7;

  const int64_t plane = h * w;
  b->lidar.resize((size_t)n * plane);
  std::vector<float> scratch((size_t)plane);
  for (int64_t i = 0; i < n; ++i)
    splat_pooled_one(pts.data() + offs[i] * 3, offs[i + 1] - offs[i], full_h,
                     full_w, b->lidar.data() + i * plane, scratch.data());
  b->n = n;
  b->h = h;
  b->w = w;
  b->mb = bx.shape[1];
  return 0;
}

struct DmmPrefetcher {
  std::vector<std::string> paths;
  size_t depth;
  bool raw = false;          // raw-record (.npz) mode
  int64_t full_h = 1280, full_w = 1920;
  std::atomic<size_t> next_idx{0};
  // Decoded batches keyed by file index: threads finish out of order, but
  // the consumer must see batches in paths[] order (training determinism).
  std::map<size_t, DmmBatch*> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  size_t popped = 0;  // guarded by mu: next index the consumer needs

  // Wait until the batch the consumer needs next (index `popped`) has been
  // decoded. Returns nullptr when the stream is exhausted.
  DmmBatch* wait_front(std::unique_lock<std::mutex>& lk) {
    cv_ready.wait(lk, [&] {
      return ready.count(popped) != 0 || popped >= paths.size();
    });
    auto it = ready.find(popped);
    return it == ready.end() ? nullptr : it->second;
  }

  void worker_loop() {
    for (;;) {
      size_t idx = next_idx.fetch_add(1);
      if (idx >= paths.size() || stop.load()) return;
      auto* b = new DmmBatch();
      if (raw) {
        b->status = decode_raw_record(paths[idx], full_h, full_w, b);
      } else {
        // probe shape first to size buffers
        int64_t shape[8];
        int ndim = dmm_npy_shape(paths[idx].c_str(), shape);
        if (ndim != 4) {
          b->status = 1;
        } else {
          int64_t n = shape[0];
          int64_t h = shape[3] == 7 ? shape[1] : shape[2];
          int64_t w = shape[3] == 7 ? shape[2] : shape[3];
          b->img.resize(n * h * w * 3);
          b->lidar.resize(n * h * w);
          b->ht.resize(n * h * w * 3);
          b->status = dmm_load_batch_f32(paths[idx].c_str(), b->img.data(),
                                         b->lidar.data(), b->ht.data(), &b->n,
                                         &b->h, &b->w);
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      // Sliding admission window: idx == popped is always admissible, so the
      // batch the consumer is waiting for can never deadlock behind
      // later-indexed batches filling the buffer.
      cv_space.wait(lk, [&] { return idx < popped + depth || stop.load(); });
      if (stop.load()) { delete b; return; }
      ready.emplace(idx, b);
      cv_ready.notify_one();
    }
  }
};

void* dmm_prefetcher_create(const char** paths, int64_t num_paths,
                            int64_t depth, int64_t num_threads) {
  auto* p = new DmmPrefetcher();
  p->paths.assign(paths, paths + num_paths);
  p->depth = (size_t)depth;
  for (int64_t t = 0; t < num_threads; ++t)
    p->workers.emplace_back([p] { p->worker_loop(); });
  return p;
}

// Block until the next decoded batch is ready and report its dims WITHOUT
// popping it, so the caller can allocate exact-size buffers before calling
// dmm_prefetcher_next. Returns the batch status (0 ok), or -1 when exhausted.
int dmm_prefetcher_peek(void* handle, int64_t* n, int64_t* h, int64_t* w) {
  auto* p = (DmmPrefetcher*)handle;
  std::unique_lock<std::mutex> lk(p->mu);
  DmmBatch* b = p->wait_front(lk);
  if (!b) return -1;  // exhausted
  if (b->status == 0) { *n = b->n; *h = b->h; *w = b->w; }
  return b->status;
}

// Pop the next decoded batch; copies into caller buffers. Returns the batch
// status (0 ok), or -1 when the stream is exhausted.
int dmm_prefetcher_next(void* handle, float* img, float* lidar, float* ht,
                        int64_t* n, int64_t* h, int64_t* w) {
  auto* p = (DmmPrefetcher*)handle;
  DmmBatch* b = nullptr;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    b = p->wait_front(lk);
    if (!b) return -1;  // exhausted
    p->ready.erase(p->popped);
    p->popped++;
    p->cv_space.notify_all();
  }
  int status = b->status;
  if (status == 0) {
    *n = b->n; *h = b->h; *w = b->w;
    memcpy(img, b->img.data(), b->img.size() * 4);
    memcpy(lidar, b->lidar.data(), b->lidar.size() * 4);
    memcpy(ht, b->ht.data(), b->ht.size() * 4);
  }
  delete b;
  return status;
}

// Raw-record mode: same pool, .npz decode + in-thread LiDAR splat.
void* dmm_prefetcher_create_raw(const char** paths, int64_t num_paths,
                                int64_t depth, int64_t num_threads,
                                int64_t full_h, int64_t full_w) {
  auto* p = new DmmPrefetcher();
  p->paths.assign(paths, paths + num_paths);
  p->depth = (size_t)depth;
  p->raw = true;
  p->full_h = full_h;
  p->full_w = full_w;
  for (int64_t t = 0; t < num_threads; ++t)
    p->workers.emplace_back([p] { p->worker_loop(); });
  return p;
}

// Peek dims of the next raw batch (n, h, w, max_boxes) without popping.
int dmm_prefetcher_peek_raw(void* handle, int64_t* n, int64_t* h, int64_t* w,
                            int64_t* mb) {
  auto* p = (DmmPrefetcher*)handle;
  std::unique_lock<std::mutex> lk(p->mu);
  DmmBatch* b = p->wait_front(lk);
  if (!b) return -1;  // exhausted
  if (b->status == 0) { *n = b->n; *h = b->h; *w = b->w; *mb = b->mb; }
  return b->status;
}

// Pop the next raw batch into caller buffers: img (n*h*w*3 f32),
// lidar (n*h*w f32), boxes (n*mb*5 i32).
int dmm_prefetcher_next_raw(void* handle, float* img, float* lidar,
                            int32_t* boxes, int64_t* n, int64_t* h,
                            int64_t* w, int64_t* mb) {
  auto* p = (DmmPrefetcher*)handle;
  DmmBatch* b = nullptr;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    b = p->wait_front(lk);
    if (!b) return -1;  // exhausted
    p->ready.erase(p->popped);
    p->popped++;
    p->cv_space.notify_all();
  }
  int status = b->status;
  if (status == 0) {
    *n = b->n; *h = b->h; *w = b->w; *mb = b->mb;
    memcpy(img, b->img.data(), b->img.size() * 4);
    memcpy(lidar, b->lidar.data(), b->lidar.size() * 4);
    memcpy(boxes, b->boxes.data(), b->boxes.size() * 4);
  }
  delete b;
  return status;
}

void dmm_prefetcher_destroy(void* handle) {
  auto* p = (DmmPrefetcher*)handle;
  p->stop.store(true);
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  for (auto& t : p->workers) t.join();
  for (auto& kv : p->ready) delete kv.second;
  delete p;
}

}  // extern "C"
