// Native runtime components for vslam_tpu (ctypes-loaded shared library).
//
// The reference leans on native code for its IO hot paths (Pangolin image
// loading, the DBoW2 .so's ~1M-line vocabulary text parser); this library
// provides the TPU-framework equivalents:
//   - JPEG -> grayscale decode via libjpeg (used by the threaded dataset
//     prefetcher; PIL fallback exists but is ~3x slower per frame),
//   - a fast parser for the DBoW2 vocabulary text format
//     (TemplatedVocabulary.h:1338-1419 layout: "parent is_leaf b0..b31 w").
//
// Build: make -C native   (produces libvslam_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>

#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG file to 8-bit grayscale. Returns 0 on success and fills
// *out_w / *out_h; `out` must hold at least max_bytes. Returns nonzero on
// error (unreadable file, not a JPEG, buffer too small).
int vslam_decode_gray(const char* path, unsigned char* out, int max_bytes,
                      int* out_w, int* out_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  if (static_cast<long>(w) * h > max_bytes) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + static_cast<long>(cinfo.output_scanline) * w;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  *out_w = w;
  *out_h = h;
  return 0;
}

// ---------------------------------------------------------------------------
// DBoW2 vocabulary text parser
// ---------------------------------------------------------------------------

// Pass 1: header + node count. Returns node count (excluding root) or -1.
// Fills k, depth.
long vslam_vocab_count(const char* path, int* k, int* depth) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int scoring, weighting;
  if (fscanf(f, "%d %d %d %d", k, depth, &scoring, &weighting) != 4) {
    fclose(f);
    return -1;
  }
  long count = 0;
  int parent, leaf;
  unsigned int b;
  double wt;
  while (fscanf(f, "%d %d", &parent, &leaf) == 2) {
    for (int i = 0; i < 32; i++) {
      if (fscanf(f, "%u", &b) != 1) { fclose(f); return -1; }
    }
    if (fscanf(f, "%lf", &wt) != 1) { fclose(f); return -1; }
    count++;
  }
  fclose(f);
  return count;
}

// Pass 2: fill arrays sized to the count from pass 1.
// parents[n], is_leaf[n], descs[n*32], weights[n]. Returns 0 on success.
int vslam_vocab_parse(const char* path, long n, int32_t* parents,
                      uint8_t* is_leaf, uint8_t* descs, double* weights) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  int k, depth, scoring, weighting;
  if (fscanf(f, "%d %d %d %d", &k, &depth, &scoring, &weighting) != 4) {
    fclose(f);
    return 2;
  }
  for (long i = 0; i < n; i++) {
    int parent, leaf;
    if (fscanf(f, "%d %d", &parent, &leaf) != 2) { fclose(f); return 3; }
    parents[i] = parent;
    is_leaf[i] = static_cast<uint8_t>(leaf != 0);
    for (int j = 0; j < 32; j++) {
      unsigned int b;
      if (fscanf(f, "%u", &b) != 1) { fclose(f); return 4; }
      descs[i * 32 + j] = static_cast<uint8_t>(b);
    }
    double wt;
    if (fscanf(f, "%lf", &wt) != 1) { fclose(f); return 5; }
    weights[i] = wt;
  }
  fclose(f);
  return 0;
}

}  // extern "C"
