// fast_png — minimal multi-threaded RGB8 PNG encoder on zlib.
//
// Native runtime component for the dataset-synthesis hot loop: the reference
// wrote every generated [image|mask] pair through PIL
// (create_dataset_for_segmentation.py:84-99), which is the host-side
// bottleneck once synthesis runs on TPU. This encoder writes PNGs directly
// (signature + IHDR + one zlib IDAT of filter-0 scanlines + IEND) and fans a
// batch of images out over a thread pool.
//
// C ABI (used via ctypes from synthesis_in_style_tpu.native):
//   int fastpng_encode(const uint8_t* rgb, int height, int width,
//                      int compression, uint8_t* out, size_t out_cap,
//                      size_t* out_len);
//   int fastpng_write_batch(const uint8_t* images, int n, int height,
//                           int width, const char** paths, int compression,
//                           int num_threads);
// Both return 0 on success.
//
// Build: g++ -O3 -shared -fPIC fast_png.cpp -o libfastpng.so -lz -lpthread

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline void put_u32_be(uint8_t* p, uint32_t v) {
  p[0] = static_cast<uint8_t>(v >> 24);
  p[1] = static_cast<uint8_t>(v >> 16);
  p[2] = static_cast<uint8_t>(v >> 8);
  p[3] = static_cast<uint8_t>(v);
}

// Append one PNG chunk (length + type + data + CRC) to `out` at `pos`.
size_t write_chunk(uint8_t* out, size_t pos, const char type[4],
                   const uint8_t* data, size_t len) {
  put_u32_be(out + pos, static_cast<uint32_t>(len));
  std::memcpy(out + pos + 4, type, 4);
  if (len) std::memcpy(out + pos + 8, data, len);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, out + pos + 4, static_cast<uInt>(len + 4));
  put_u32_be(out + pos + 8 + len, crc);
  return pos + 12 + len;
}

}  // namespace

extern "C" {

// Upper bound for the encoded size of one image (used to size buffers).
size_t fastpng_bound(int height, int width) {
  const size_t raw = static_cast<size_t>(height) * (1 + 3 * static_cast<size_t>(width));
  return compressBound(raw) + 1024;
}

int fastpng_encode(const uint8_t* rgb, int height, int width, int compression,
                   uint8_t* out, size_t out_cap, size_t* out_len) {
  if (!rgb || !out || !out_len || height <= 0 || width <= 0) return 1;
  const size_t row = 3 * static_cast<size_t>(width);
  const size_t raw_len = static_cast<size_t>(height) * (row + 1);

  // filter-0 scanlines: one 0x00 byte before each row
  std::vector<uint8_t> raw(raw_len);
  for (int y = 0; y < height; ++y) {
    uint8_t* dst = raw.data() + static_cast<size_t>(y) * (row + 1);
    dst[0] = 0;
    std::memcpy(dst + 1, rgb + static_cast<size_t>(y) * row, row);
  }

  std::vector<uint8_t> compressed(compressBound(raw_len));
  uLongf comp_len = compressed.size();
  if (compress2(compressed.data(), &comp_len, raw.data(), raw_len,
                compression) != Z_OK) {
    return 2;
  }

  const size_t total = 8 + 25 + (12 + comp_len) + 12;
  if (out_cap < total) return 3;

  static const uint8_t kSignature[8] = {0x89, 'P', 'N', 'G', '\r', '\n',
                                        0x1a, '\n'};
  std::memcpy(out, kSignature, 8);
  size_t pos = 8;

  uint8_t ihdr[13];
  put_u32_be(ihdr, static_cast<uint32_t>(width));
  put_u32_be(ihdr + 4, static_cast<uint32_t>(height));
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter
  ihdr[12] = 0;  // interlace
  pos = write_chunk(out, pos, "IHDR", ihdr, 13);
  pos = write_chunk(out, pos, "IDAT", compressed.data(), comp_len);
  pos = write_chunk(out, pos, "IEND", nullptr, 0);
  *out_len = pos;
  return 0;
}

int fastpng_write_batch(const uint8_t* images, int n, int height, int width,
                        const char** paths, int compression, int num_threads) {
  if (!images || !paths || n <= 0) return 1;
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  if (num_threads > n) num_threads = n;

  const size_t image_bytes =
      3 * static_cast<size_t>(height) * static_cast<size_t>(width);
  std::atomic<int> next{0};
  std::atomic<int> failed{0};

  auto worker = [&]() {
    std::vector<uint8_t> buffer(fastpng_bound(height, width));
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      size_t out_len = 0;
      if (fastpng_encode(images + static_cast<size_t>(i) * image_bytes, height,
                         width, compression, buffer.data(), buffer.size(),
                         &out_len) != 0) {
        failed.fetch_add(1);
        continue;
      }
      FILE* f = std::fopen(paths[i], "wb");
      if (!f) {
        failed.fetch_add(1);
        continue;
      }
      const bool ok = std::fwrite(buffer.data(), 1, out_len, f) == out_len;
      std::fclose(f);
      if (!ok) failed.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load() == 0 ? 0 : 4;
}

}  // extern "C"
