// pyharp-tpu native runtime: host-side ingestion + interpolation oracle.
//
// TPU-native counterpart of the reference's native utility layer
// (/root/reference/src/utils/fileio.cpp, src/math/locate.h, src/math/interpn.h,
// src/math/math_dispatch.cpp).  The device compute path is JAX/XLA; this
// library serves the host side of the framework:
//
//   * fast ASCII table ingestion (comment stripping + float parsing) used at
//     module-construction time for aerosol/profile tables — the reference did
//     this in C++ (fileio.cpp) and so do we;
//   * a scalar bisection locate() and an N-D multilinear interpn() with the
//     reference's exact out-of-range clamp semantics, used both for host-side
//     regridding and as an independent native oracle the JAX kernels are
//     tested against.
//
// Exposed as a plain C ABI consumed via ctypes (pybind11 is not available in
// this toolchain).  All sizes are int64_t.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

int64_t harp_native_abi_version() { return 1; }

// ---------------------------------------------------------------------------
// locate: bisection bracketing on a monotonic axis.
//
// Same conventions as the reference (locate.h:15-41, itself adapted from
// Numerical Recipes): returns j such that xx[j] <= x < xx[j+1] for an
// ascending axis; -1 below range; n-1 when x equals or exceeds the last
// sample (the reference deliberately returns n at x == xx[n-1], which its
// interpn then clamps to the last sample — collapsing both to n-1 here gives
// identical interpolated values).
// ---------------------------------------------------------------------------
int64_t harp_locate(const double* xx, double x, int64_t n) {
  if (n < 2) return 0;
  const bool ascnd = xx[n - 1] >= xx[0];
  int64_t jl = -1, ju = n;
  while (ju - jl > 1) {
    const int64_t jm = (ju + jl) >> 1;
    if ((x >= xx[jm]) == ascnd)
      jl = jm;
    else
      ju = jm;
  }
  return jl;
}

// ---------------------------------------------------------------------------
// interpn: batched N-D multilinear interpolation with clamp-to-nearest
// out-of-range handling and 0.5/0.5 weights on a degenerate bracket
// (matching interpn.h:41-49,74-75 behaviorally).
//
//   out    : (nquery, nval)
//   coords : (nquery, ndim)
//   data   : (len[0], ..., len[ndim-1], nval), C-contiguous
//   axes   : concatenation of the ndim ascending axis arrays
//   len    : (ndim,)
//
// Implemented iteratively (corner sum over the 2^ndim hypercube) rather than
// by recursion; ndim <= 8.
// ---------------------------------------------------------------------------
int64_t harp_interpn(double* out, const double* coords, const double* data,
                     const double* axes, const int64_t* len, int64_t ndim,
                     int64_t nval, int64_t nquery) {
  if (ndim < 1 || ndim > 8) return -1;

  // per-dimension axis offsets and strides (in units of nval)
  int64_t axoff[8];
  int64_t stride[8];
  int64_t off = 0;
  for (int64_t d = 0; d < ndim; ++d) {
    axoff[d] = off;
    off += len[d];
  }
  stride[ndim - 1] = nval;
  for (int64_t d = ndim - 2; d >= 0; --d) stride[d] = stride[d + 1] * len[d + 1];

  const int64_t ncorner = int64_t(1) << ndim;

  for (int64_t q = 0; q < nquery; ++q) {
    int64_t ilo[8], ihi[8];
    double t[8];
    for (int64_t d = 0; d < ndim; ++d) {
      const double* ax = axes + axoff[d];
      const int64_t n = len[d];
      int64_t i1 = harp_locate(ax, coords[q * ndim + d], n);
      int64_t lo = i1 < 0 ? 0 : (i1 > n - 1 ? n - 1 : i1);
      int64_t hi = i1 + 1 < 0 ? 0 : (i1 + 1 > n - 1 ? n - 1 : i1 + 1);
      const double x1 = ax[lo], x2 = ax[hi];
      ilo[d] = lo;
      ihi[d] = hi;
      t[d] = (x2 != x1) ? (coords[q * ndim + d] - x1) / (x2 - x1) : 0.5;
    }
    double* o = out + q * nval;
    for (int64_t j = 0; j < nval; ++j) o[j] = 0.0;
    for (int64_t c = 0; c < ncorner; ++c) {
      double w = 1.0;
      int64_t base = 0;
      for (int64_t d = 0; d < ndim; ++d) {
        if ((c >> d) & 1) {
          w *= t[d];
          base += ihi[d] * stride[d];
        } else {
          w *= 1.0 - t[d];
          base += ilo[d] * stride[d];
        }
      }
      const double* v = data + base;
      for (int64_t j = 0; j < nval; ++j) o[j] += w * v[j];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// ASCII table reader: strip '#' comments, parse whitespace-separated doubles.
//
// Column count is inferred from the first non-empty data row; rows with a
// different width are an error (matching the strictness of the reference's
// read_data_table, fileio.cpp:60-101).  Returns a malloc'd row-major buffer
// the caller releases with harp_free().
//
// Return codes: 0 ok, -1 cannot open, -2 empty, -3 ragged rows, -4 parse error.
// ---------------------------------------------------------------------------
int64_t harp_read_table(const char* path, double** out, int64_t* nrow,
                        int64_t* ncol) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size_t(fsize) + 1);
  const size_t got = std::fread(buf.data(), 1, size_t(fsize), f);
  std::fclose(f);
  buf[got] = '\0';

  // strip comments in place ('#' to end of line)
  for (size_t i = 0; i < got; ++i) {
    if (buf[i] == '#') {
      while (i < got && buf[i] != '\n') buf[i++] = ' ';
    }
  }

  std::vector<double> vals;
  vals.reserve(1024);
  int64_t cols = 0, rows = 0;

  char* p = buf.data();
  char* const end = buf.data() + got;
  while (p < end) {
    // one line
    char* eol = p;
    while (eol < end && *eol != '\n') ++eol;
    *eol = '\0';

    int64_t rowcols = 0;
    char* s = p;
    while (*s) {
      while (*s && std::isspace(static_cast<unsigned char>(*s))) ++s;
      if (!*s) break;
      char* next = nullptr;
      const double v = std::strtod(s, &next);
      if (next == s) return -4;  // non-numeric token
      vals.push_back(v);
      ++rowcols;
      s = next;
    }
    if (rowcols > 0) {
      if (cols == 0)
        cols = rowcols;
      else if (rowcols != cols)
        return -3;
      ++rows;
    }
    p = eol + 1;
  }
  if (rows == 0) return -2;

  double* o = static_cast<double*>(std::malloc(sizeof(double) * vals.size()));
  if (!o) return -2;
  std::memcpy(o, vals.data(), sizeof(double) * vals.size());
  *out = o;
  *nrow = rows;
  *ncol = cols;
  return 0;
}

void harp_free(void* p) { std::free(p); }

}  // extern "C"
