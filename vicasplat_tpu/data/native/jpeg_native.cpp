// Native batch JPEG decoder for the input pipeline.
//
// Role parity: the reference feeds its models through torch's C++
// DataLoader workers (reference src/dataset/data_module.py); our
// equivalent host runtime decodes RE10K chunk JPEGs here — plain libjpeg
// with a std::thread fan-out, called from Python via ctypes (the foreign
// call releases the GIL, so decoding overlaps the training step even from
// a single Python thread, and scales across cores on production hosts).
//
// Build (done lazily by data/native/__init__.py):
//   g++ -O2 -fPIC -shared -std=c++17 jpeg_native.cpp -o _jpeg_native.so \
//       -ljpeg -pthread
//
// API (extern "C", ctypes-friendly):
//   vs_jpeg_dims(data, len, &w, &h)            -> 0 ok
//   vs_decode_jpeg(data, len, out, w, h)       -> 0 ok (out: h*w*3 RGB u8)
//   vs_decode_jpeg_batch(datas, lens, n, out, w, h, n_threads) -> 0 ok
//
// All images in a batch must share (w, h) — RE10K chunks are uniform
// (360x640); the Python wrapper pre-checks via vs_jpeg_dims and falls
// back to the PIL path otherwise.

#include <cstddef>
#include <cstdio>  // jpeglib.h needs size_t/FILE declared first

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// libjpeg's default error handler exit()s the process; trampoline back.
struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void emit_message(j_common_ptr, int) {}  // silence warnings

int decode_one(const uint8_t* data, size_t len, uint8_t* out, int w, int h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = emit_message;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;  // corrupt stream
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // converts YCbCr and grayscale
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) != w ||
      static_cast<int>(cinfo.output_height) != h ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;  // dim mismatch
  }
  const size_t stride = static_cast<size_t>(w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

int vs_jpeg_dims(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = emit_message;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int vs_decode_jpeg(const uint8_t* data, size_t len, uint8_t* out, int w,
                   int h) {
  return decode_one(data, len, out, w, h);
}

int vs_decode_jpeg_batch(const uint8_t** datas, const size_t* lens, int n,
                         uint8_t* out, int w, int h, int n_threads) {
  const size_t frame = static_cast<size_t>(w) * h * 3;
  std::atomic<int> next(0), failed(0);
  auto work = [&] {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (decode_one(datas[i], lens[i], out + frame * i, w, h) != 0) {
        failed.store(1);
      }
    }
  };
  int k = n_threads;
  if (k <= 0) k = static_cast<int>(std::thread::hardware_concurrency());
  if (k > n) k = n;
  if (k <= 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(k);
    for (int t = 0; t < k; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
  }
  return failed.load();
}

}  // extern "C"
