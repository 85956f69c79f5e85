// Native host-side IO helpers for the TPU CCVM framework.
//
// Two hot host paths are implemented here (both are Python double loops in
// the reference, see problem_instance.py:180-188 and dl_solver.py:252-281):
//   * parse_float_table: tokenize a delimited block of floats into a dense
//     row-major buffer (instance-file Q/V parsing).
//   * write_sample_block: append evolution-sample rows as tab-separated
//     values rounded to 4 decimals.
//
// Exposed with C linkage for ctypes.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Parse `rows` lines of `cols` delimited floats from `text`.
// Lines are separated by '\n'; extra columns in a line are ignored.
// Returns 0 on success, nonzero on malformed input.
int parse_float_table(const char* text, char delimiter, long rows, long cols,
                      double* out) {
  const char* p = text;
  for (long r = 0; r < rows; ++r) {
    for (long c = 0; c < cols; ++c) {
      char* end = nullptr;
      double val = strtod(p, &end);
      if (end == p) return 1;  // no number parsed
      out[r * cols + c] = val;
      p = end;
      // Skip a single delimiter (or whitespace run) between tokens.
      while (*p == delimiter || *p == ' ' || *p == '\r') ++p;
    }
    // Skip to the start of the next line.
    while (*p != '\0' && *p != '\n') ++p;
    if (*p == '\n') ++p;
  }
  return 0;
}

// Format `v` rounded to 4 decimals the way Python's str(round(v, 4)) does
// for ordinary magnitudes: minimal digits, at least one fractional digit.
static void format_rounded(double v, char* buf, size_t buflen) {
  double r = std::round(v * 10000.0) / 10000.0;
  if (r == 0.0) r = 0.0;  // normalize -0.0 -> 0.0
  snprintf(buf, buflen, "%.4f", r);
  // Trim trailing zeros but keep one digit after the decimal point.
  size_t len = strlen(buf);
  char* dot = strchr(buf, '.');
  if (dot != nullptr) {
    char* last = buf + len - 1;
    while (last > dot + 1 && *last == '0') {
      *last = '\0';
      --last;
    }
  }
}

// Append `rows` x `cols` values to `path` as tab-separated rounded floats,
// one row per line. trailing_tab=1 emits a tab before each newline (the
// DL/Langevin writer format); 0 omits it (the MF writer format).
int write_sample_block(const char* path, const double* data, long rows,
                       long cols, int trailing_tab, int append) {
  FILE* f = fopen(path, append ? "a" : "w");
  if (f == nullptr) return 1;
  char buf[64];
  for (long r = 0; r < rows; ++r) {
    for (long c = 0; c < cols; ++c) {
      format_rounded(data[r * cols + c], buf, sizeof(buf));
      fputs(buf, f);
      if (c != cols - 1 || trailing_tab) fputc('\t', f);
    }
    fputc('\n', f);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
