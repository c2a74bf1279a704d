// Native host-side IO for the plankton input pipeline.
//
// parse_profile_csv: fast parser for per-particle pulse-shape profile CSVs
// (one header line, D comma-separated float columns, L rows). Replaces
// np.loadtxt in the DataLoader hot path (reference: src/data.py:43), which
// dominates the reference's input cost. Uses std::from_chars (no locale, no
// allocation) over the raw file buffer.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <charconv>
#include <cstdint>
#include <cstring>

extern "C" {

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
