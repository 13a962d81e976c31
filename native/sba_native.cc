// Native data-loading runtime for sba_tpu.
//
// Capability parity with the reference's native runtime pieces:
//  - util/threading.{h,cc}: Thread / ThreadPool / bounded JobQueue
//    (ref: threading.h:99,195,261) -> WorkQueue + worker pool below.
//  - util/matrix_vis.h:130 readTiffFloat (FreeImage float-TIFF load used
//    by the SBA/GSBA map ingestion, semantic_bundle_adjustment.cc:1021)
//    -> minimal TIFF parser for uncompressed float32/uint8/uint16 strips.
//  - feature/extraction.cc:112 ImageResizerThread producer/consumer
//    pipeline -> prefetching multi-threaded image loader with grayscale
//    conversion + area resize, feeding fixed-size host buffers ready for
//    device upload.
//
// Exposed through a small extern "C" API consumed via ctypes
// (sba_tpu/io/native_loader.py). No external dependencies: formats
// decoded natively are PGM/PPM (binary), BMP (24/32bpp uncompressed) and
// TIFF (uncompressed strips); everything else falls back to Python.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Bounded MPMC job queue (ref: util/threading.h:261 JobQueue<T>).
// ---------------------------------------------------------------------------

template <typename T>
class JobQueue {
 public:
  explicit JobQueue(size_t max_size) : max_size_(max_size), stopped_(false) {}

  bool Push(T item) {
    std::unique_lock<std::mutex> lock(mu_);
    push_cv_.wait(lock,
                  [this] { return queue_.size() < max_size_ || stopped_; });
    if (stopped_) return false;
    queue_.push(std::move(item));
    pop_cv_.notify_one();
    return true;
  }

  bool Pop(T* out) {
    std::unique_lock<std::mutex> lock(mu_);
    pop_cv_.wait(lock, [this] { return !queue_.empty() || stopped_; });
    if (queue_.empty()) return false;
    *out = std::move(queue_.front());
    queue_.pop();
    push_cv_.notify_one();
    return true;
  }

  void Stop() {
    std::lock_guard<std::mutex> lock(mu_);
    stopped_ = true;
    push_cv_.notify_all();
    pop_cv_.notify_all();
  }

 private:
  const size_t max_size_;
  bool stopped_;
  std::queue<T> queue_;
  std::mutex mu_;
  std::condition_variable push_cv_, pop_cv_;
};

// ---------------------------------------------------------------------------
// Image decoding (grayscale float32 in [0, 1])
// ---------------------------------------------------------------------------

struct ImageF {
  int width = 0;
  int height = 0;
  std::vector<float> data;  // row-major [height, width]
  bool ok = false;
};

bool ReadFile(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    std::fclose(f);
    return false;
  }
  out->resize(static_cast<size_t>(size));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  return got == out->size();
}

// --- PGM / PPM (binary P5/P6) ---

ImageF DecodePNM(const std::vector<uint8_t>& buf) {
  ImageF img;
  size_t pos = 0;
  auto skip_ws = [&] {
    while (pos < buf.size()) {
      if (buf[pos] == '#') {
        while (pos < buf.size() && buf[pos] != '\n') ++pos;
      } else if (isspace(buf[pos])) {
        ++pos;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() -> long {
    skip_ws();
    long v = 0;
    bool any = false;
    while (pos < buf.size() && isdigit(buf[pos])) {
      v = v * 10 + (buf[pos] - '0');
      ++pos;
      any = true;
    }
    return any ? v : -1;
  };
  if (buf.size() < 2 || buf[0] != 'P') return img;
  char kind = static_cast<char>(buf[1]);
  pos = 2;
  long w = read_int(), h = read_int(), maxv = read_int();
  if (w <= 0 || h <= 0 || maxv <= 0 || pos >= buf.size()) return img;
  ++pos;  // single whitespace after maxval
  const float scale = 1.0f / static_cast<float>(maxv);
  img.width = static_cast<int>(w);
  img.height = static_cast<int>(h);
  img.data.resize(static_cast<size_t>(w) * h);
  if (kind == '5') {  // grayscale
    if (buf.size() - pos < static_cast<size_t>(w) * h) return img;
    for (long i = 0; i < w * h; ++i)
      img.data[i] = buf[pos + i] * scale;
  } else if (kind == '6') {  // rgb -> luma
    if (buf.size() - pos < static_cast<size_t>(w) * h * 3) return img;
    for (long i = 0; i < w * h; ++i) {
      const uint8_t* p = &buf[pos + 3 * i];
      img.data[i] = (0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2]) * scale;
    }
  } else {
    return img;
  }
  img.ok = true;
  return img;
}

// --- BMP (24/32 bpp uncompressed) ---

uint32_t RdU32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t RdU16(const uint8_t* p) { return p[0] | (p[1] << 8); }

ImageF DecodeBMP(const std::vector<uint8_t>& buf) {
  ImageF img;
  if (buf.size() < 54 || buf[0] != 'B' || buf[1] != 'M') return img;
  uint32_t data_off = RdU32(&buf[10]);
  int32_t w = static_cast<int32_t>(RdU32(&buf[18]));
  int32_t h = static_cast<int32_t>(RdU32(&buf[22]));
  uint16_t bpp = RdU16(&buf[28]);
  uint32_t comp = RdU32(&buf[30]);
  if (comp != 0 || (bpp != 24 && bpp != 32) || w <= 0) return img;
  bool flip = h > 0;
  int ah = h > 0 ? h : -h;
  size_t stride = ((static_cast<size_t>(w) * bpp / 8) + 3) & ~size_t(3);
  if (buf.size() < data_off + stride * ah) return img;
  img.width = w;
  img.height = ah;
  img.data.resize(static_cast<size_t>(w) * ah);
  for (int y = 0; y < ah; ++y) {
    int sy = flip ? (ah - 1 - y) : y;
    const uint8_t* row = &buf[data_off + stride * sy];
    for (int x = 0; x < w; ++x) {
      const uint8_t* p = row + x * (bpp / 8);
      // BMP is BGR.
      img.data[static_cast<size_t>(y) * w + x] =
          (0.299f * p[2] + 0.587f * p[1] + 0.114f * p[0]) / 255.0f;
    }
  }
  img.ok = true;
  return img;
}

// --- TIFF (classic, little/big endian, uncompressed strips) ---

struct TiffState {
  const uint8_t* p;
  size_t n;
  bool be;
  uint16_t U16(size_t off) const {
    if (off + 2 > n) return 0;
    return be ? (p[off] << 8 | p[off + 1]) : (p[off] | p[off + 1] << 8);
  }
  uint32_t U32(size_t off) const {
    if (off + 4 > n) return 0;
    return be ? (uint32_t(p[off]) << 24 | uint32_t(p[off + 1]) << 16 |
                 uint32_t(p[off + 2]) << 8 | p[off + 3])
              : (p[off] | uint32_t(p[off + 1]) << 8 |
                 uint32_t(p[off + 2]) << 16 | uint32_t(p[off + 3]) << 24);
  }
};

// Reads the FIRST IFD of an uncompressed TIFF into float32 (value scale
// preserved for float/uint16/uint8 sample formats). Mirrors the subset the
// fork relies on for its side-channel depth/semantic maps.
ImageF DecodeTIFF(const std::vector<uint8_t>& buf) {
  ImageF img;
  if (buf.size() < 8) return img;
  TiffState t{buf.data(), buf.size(), false};
  if (buf[0] == 'M' && buf[1] == 'M')
    t.be = true;
  else if (!(buf[0] == 'I' && buf[1] == 'I'))
    return img;
  if (t.U16(2) != 42) return img;
  uint32_t ifd = t.U32(4);
  if (ifd + 2 > buf.size()) return img;
  uint16_t num_entries = t.U16(ifd);

  uint32_t width = 0, height = 0, bps = 1, comp = 1, fmt = 1, spp = 1;
  std::vector<uint32_t> strip_offsets, strip_counts;

  auto read_values = [&](size_t entry, std::vector<uint32_t>* out) {
    uint16_t type = t.U16(entry + 2);
    uint32_t count = t.U32(entry + 4);
    size_t size = type == 3 ? 2 : (type == 4 ? 4 : (type == 1 ? 1 : 0));
    if (size == 0) return;
    size_t total = size * count;
    size_t off = total <= 4 ? entry + 8 : t.U32(entry + 8);
    for (uint32_t i = 0; i < count; ++i) {
      out->push_back(size == 2 ? t.U16(off + 2 * i) : size == 4
                     ? t.U32(off + 4 * i) : t.p[off + i]);
    }
  };

  for (uint16_t e = 0; e < num_entries; ++e) {
    size_t entry = ifd + 2 + 12 * size_t(e);
    if (entry + 12 > buf.size()) return img;
    uint16_t tag = t.U16(entry);
    std::vector<uint32_t> vals;
    switch (tag) {
      case 256: read_values(entry, &vals); if (!vals.empty()) width = vals[0]; break;
      case 257: read_values(entry, &vals); if (!vals.empty()) height = vals[0]; break;
      case 258: read_values(entry, &vals); if (!vals.empty()) bps = vals[0]; break;
      case 259: read_values(entry, &vals); if (!vals.empty()) comp = vals[0]; break;
      case 273: read_values(entry, &strip_offsets); break;
      case 277: read_values(entry, &vals); if (!vals.empty()) spp = vals[0]; break;
      case 279: read_values(entry, &strip_counts); break;
      case 339: read_values(entry, &vals); if (!vals.empty()) fmt = vals[0]; break;
      default: break;
    }
  }
  if (comp != 1 || width == 0 || height == 0 || spp != 1 ||
      strip_offsets.empty())
    return img;

  img.width = static_cast<int>(width);
  img.height = static_cast<int>(height);
  img.data.resize(static_cast<size_t>(width) * height);
  size_t bytes_per = bps / 8;
  size_t idx = 0;
  for (size_t s = 0; s < strip_offsets.size(); ++s) {
    size_t off = strip_offsets[s];
    size_t count = s < strip_counts.size()
                       ? strip_counts[s]
                       : static_cast<size_t>(width) * height * bytes_per;
    if (off + count > buf.size()) return img;
    for (size_t b = 0; b + bytes_per <= count && idx < img.data.size();
         b += bytes_per, ++idx) {
      const uint8_t* p = &buf[off + b];
      if (fmt == 3 && bps == 32) {  // float32
        uint32_t u = t.be ? (uint32_t(p[0]) << 24 | uint32_t(p[1]) << 16 |
                             uint32_t(p[2]) << 8 | p[3])
                          : (p[0] | uint32_t(p[1]) << 8 |
                             uint32_t(p[2]) << 16 | uint32_t(p[3]) << 24);
        float f;
        std::memcpy(&f, &u, 4);
        img.data[idx] = f;
      } else if (bps == 16) {
        img.data[idx] = static_cast<float>(
            t.be ? (p[0] << 8 | p[1]) : (p[0] | p[1] << 8));
      } else if (bps == 8) {
        img.data[idx] = static_cast<float>(p[0]);
      } else {
        return img;
      }
    }
  }
  img.ok = idx == img.data.size();
  return img;
}

ImageF DecodeAny(const std::string& path) {
  std::vector<uint8_t> buf;
  if (!ReadFile(path, &buf) || buf.size() < 4) return ImageF{};
  if (buf[0] == 'P' && (buf[1] == '5' || buf[1] == '6')) return DecodePNM(buf);
  if (buf[0] == 'B' && buf[1] == 'M') return DecodeBMP(buf);
  if ((buf[0] == 'I' && buf[1] == 'I') || (buf[0] == 'M' && buf[1] == 'M'))
    return DecodeTIFF(buf);
  return ImageF{};
}

// Area-average downscale to fit max_size (ref: ImageResizerThread,
// feature/extraction.cc). Upscaling never happens in the pipeline.
void ResizeToFit(ImageF* img, int max_size) {
  if (max_size <= 0 || (img->width <= max_size && img->height <= max_size))
    return;
  double scale = static_cast<double>(max_size) /
                 (img->width > img->height ? img->width : img->height);
  int nw = static_cast<int>(img->width * scale);
  int nh = static_cast<int>(img->height * scale);
  if (nw < 1) nw = 1;
  if (nh < 1) nh = 1;
  std::vector<float> out(static_cast<size_t>(nw) * nh, 0.0f);
  for (int y = 0; y < nh; ++y) {
    int y0 = static_cast<int>(static_cast<double>(y) * img->height / nh);
    int y1 = static_cast<int>(static_cast<double>(y + 1) * img->height / nh);
    if (y1 <= y0) y1 = y0 + 1;
    for (int x = 0; x < nw; ++x) {
      int x0 = static_cast<int>(static_cast<double>(x) * img->width / nw);
      int x1 = static_cast<int>(static_cast<double>(x + 1) * img->width / nw);
      if (x1 <= x0) x1 = x0 + 1;
      float acc = 0.0f;
      for (int yy = y0; yy < y1; ++yy)
        for (int xx = x0; xx < x1; ++xx)
          acc += img->data[static_cast<size_t>(yy) * img->width + xx];
      out[static_cast<size_t>(y) * nw + x] =
          acc / static_cast<float>((y1 - y0) * (x1 - x0));
    }
  }
  img->width = nw;
  img->height = nh;
  img->data = std::move(out);
}

// ---------------------------------------------------------------------------
// Prefetching loader (producer/consumer pipeline)
// ---------------------------------------------------------------------------

struct LoadedItem {
  int index = -1;
  ImageF image;
};

struct Loader {
  std::vector<std::string> paths;
  int max_size = 0;
  JobQueue<int> work{1 << 16};
  JobQueue<LoadedItem> done;
  std::vector<std::thread> workers;
  std::atomic<int> remaining{0};

  Loader(size_t queue_size) : done(queue_size) {}

  ~Loader() {
    work.Stop();
    done.Stop();
    for (auto& w : workers)
      if (w.joinable()) w.join();
  }
};

}  // namespace

extern "C" {

// Decode a single image file into caller-provided buffer (returns 0 on
// success). Query dims first with out_w/out_h and data == nullptr.
int sba_decode_image(const char* path, int max_size, float* data,
                     int* out_w, int* out_h, int capacity) {
  ImageF img = DecodeAny(path);
  if (!img.ok) return 1;
  ResizeToFit(&img, max_size);
  *out_w = img.width;
  *out_h = img.height;
  if (data == nullptr) return 0;
  if (capacity < img.width * img.height) return 2;
  std::memcpy(data, img.data.data(), sizeof(float) * img.data.size());
  return 0;
}

// Prefetching pipeline: create -> repeatedly call next -> destroy.
void* sba_loader_create(const char** paths, int num_paths, int num_threads,
                        int max_size, int queue_size) {
  auto* loader = new Loader(static_cast<size_t>(
      queue_size > 0 ? queue_size : 8));
  loader->max_size = max_size;
  loader->paths.reserve(num_paths);
  for (int i = 0; i < num_paths; ++i) loader->paths.emplace_back(paths[i]);
  loader->remaining = num_paths;
  for (int i = 0; i < num_paths; ++i) loader->work.Push(i);
  if (num_threads < 1) num_threads = 1;
  for (int wk = 0; wk < num_threads; ++wk) {
    loader->workers.emplace_back([loader] {
      int idx;
      while (loader->work.Pop(&idx)) {
        LoadedItem item;
        item.index = idx;
        item.image = DecodeAny(loader->paths[idx]);
        if (item.image.ok) ResizeToFit(&item.image, loader->max_size);
        loader->done.Push(std::move(item));
      }
    });
  }
  return loader;
}

// Pops the next decoded image. Returns the image index (>= 0), -1 when all
// items have been consumed, -2 if this item failed to decode (index via
// out_w == -1 sentinel is avoided; failed items still consume a slot).
int sba_loader_next(void* handle, float* data, int capacity, int* out_w,
                    int* out_h) {
  auto* loader = static_cast<Loader*>(handle);
  if (loader->remaining.fetch_sub(1) <= 0) {
    loader->remaining.fetch_add(1);
    return -1;
  }
  LoadedItem item;
  if (!loader->done.Pop(&item)) return -1;
  if (!item.image.ok) {
    *out_w = 0;
    *out_h = 0;
    return -2 - item.index;  // encodes which file failed
  }
  *out_w = item.image.width;
  *out_h = item.image.height;
  if (capacity < item.image.width * item.image.height) return -2 - item.index;
  std::memcpy(data, item.image.data.data(),
              sizeof(float) * item.image.data.size());
  return item.index;
}

void sba_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"
