// Native host-side IO for the plankton input pipeline.
//
// parse_profile_csv: fast parser for per-particle pulse-shape profile CSVs
// (one header line, D comma-separated float columns, L rows). Replaces
// np.loadtxt in the DataLoader hot path (reference: src/data.py:43), which
// dominates the reference's input cost. Uses std::from_chars (no locale, no
// allocation) over the raw file buffer.
//
// decode_jpeg_info / decode_jpeg: libjpeg(-turbo) decode of the microscope
// crops, replacing the PIL decode (reference: src/data.py:42) in the
// DataLoader and dataset-pack paths (decode is ~24% of per-sample host
// cost and the whole one-off pack cost, docs/PERF.md). JDCT_ISLOW keeps
// the pixels bit-identical to PIL's default decode of the same libjpeg.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC -ljpeg).

#include <charconv>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

struct ErrMgr {
    jpeg_error_mgr pub;
    std::jmp_buf jb;
};

void err_exit(j_common_ptr cinfo) {
    ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
    std::longjmp(err->jb, 1);
}

void emit_silent(j_common_ptr, int) {}

}  // namespace

extern "C" {

// Parse the JPEG header in `buf`: writes width/height/channels (1 gray,
// 3 RGB after libjpeg's default colorspace conversion). Returns 0, or -1
// on malformed input.
int decode_jpeg_info(const unsigned char* buf, int64_t len,
                     int32_t* width, int32_t* height, int32_t* channels) {
    jpeg_decompress_struct cinfo;
    ErrMgr err;
    cinfo.err = jpeg_std_error(&err.pub);
    err.pub.error_exit = err_exit;
    err.pub.emit_message = emit_silent;
    if (setjmp(err.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_calc_output_dimensions(&cinfo);
    *width = static_cast<int32_t>(cinfo.output_width);
    *height = static_cast<int32_t>(cinfo.output_height);
    *channels = static_cast<int32_t>(cinfo.output_components);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Decode `buf` into `out` (capacity `cap` bytes, row-major H x W x C).
// Returns bytes written, or -1 on malformed input / insufficient capacity.
int64_t decode_jpeg(const unsigned char* buf, int64_t len,
                    unsigned char* out, int64_t cap) {
    jpeg_decompress_struct cinfo;
    ErrMgr err;
    cinfo.err = jpeg_std_error(&err.pub);
    err.pub.error_exit = err_exit;
    err.pub.emit_message = emit_silent;
    if (setjmp(err.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    cinfo.dct_method = JDCT_ISLOW;  // PIL's default: bit-identical pixels
    jpeg_start_decompress(&cinfo);
    const int64_t stride =
        static_cast<int64_t>(cinfo.output_width) * cinfo.output_components;
    const int64_t need = stride * cinfo.output_height;
    if (need > cap) {
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + stride * cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return need;
}

// Parse `len` bytes of CSV in `buf` into `out` (capacity `cap` floats),
// skipping the first (header) line. Writes the column count to *n_cols.
// Returns the number of floats written, or -1 on malformed input/overflow.
int64_t parse_profile_csv(const char* buf, int64_t len, float* out,
                          int64_t cap, int64_t* n_cols) {
    const char* p = buf;
    const char* end = buf + len;

    // skip header line
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;

    int64_t n = 0;
    int64_t cols = 0;
    int64_t cur_cols = 0;
    while (p < end) {
        // skip blank separators / line endings
        while (p < end && (*p == '\r' || *p == ' ')) ++p;
        if (p >= end) break;
        if (*p == '\n') {
            if (cur_cols > 0) {
                if (cols == 0) cols = cur_cols;
                else if (cur_cols != cols) return -1;  // ragged row
                cur_cols = 0;
            }
            ++p;
            continue;
        }
        float value;
        auto [next, ec] = std::from_chars(p, end, value);
        if (ec != std::errc()) return -1;
        if (n >= cap) return -1;
        out[n++] = value;
        ++cur_cols;
        p = next;
        if (p < end && *p == ',') ++p;
    }
    if (cur_cols > 0) {  // last row without trailing newline
        if (cols == 0) cols = cur_cols;
        else if (cur_cols != cols) return -1;
    }
    *n_cols = cols;
    return n;
}

}  // extern "C"
