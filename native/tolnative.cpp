// tol_tpu native runtime components.
//
// The reference's runtime is C++ end-to-end (parameter loader
// src/parameters.cpp, Mongo wind cache src/problem.cpp:371-469, per-iteration
// debug dumps src/DefineFG.cpp:16-46).  Here the TPU compute path is
// JAX/XLA, and this library provides the native host-side pieces around it:
//
//   * .param parsing with the reference's exact line semantics
//     (split at '/', strtod prefix, skip non-numeric lines),
//   * a binary wind-grid cache: mmap-able single-file replacement for the
//     reference's per-solve MongoDB round trips — built once host-side,
//     loaded in microseconds into the arrays the trilinear Pallas/XLA
//     interpolation consumes,
//   * a buffered binary telemetry logger replacing the reference's
//     fopen/fprintf-per-solver-iteration Xoutput/Foutput/Goutput files.
//
// Exposed via a minimal C ABI consumed with ctypes (tol_tpu/io/native.py).

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// .param reader (semantics of parameters::readparams, src/parameters.cpp:14-34)
// ---------------------------------------------------------------------------

// Parses up to max_out numeric lines from path into out; returns the count,
// or -1 on I/O error.
int tol_read_params(const char* path, double* out, int max_out) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  char line[512];
  int n = 0;
  while (n < max_out && std::fgets(line, sizeof line, f)) {
    // Truncate at the first '/' (the reference's multi-char literal '//'
    // char truncates to '/', src/parameters.cpp:18).
    if (char* slash = std::strchr(line, '/')) *slash = '\0';
    char* end = nullptr;
    errno = 0;
    double v = std::strtod(line, &end);
    if (end == line || errno == ERANGE) continue;  // non-numeric line: skip
    out[n++] = v;
  }
  std::fclose(f);
  return n;
}

// ---------------------------------------------------------------------------
// Binary wind-grid cache
//
// Layout (little-endian):
//   magic   "TOLWGRID"            8 bytes
//   version u32 = 1
//   nx, ny, nz                    u32 x 3
//   origin[3], spacing[3]         f64 x 6
//   u, v, w                       f32 x (nx*ny*nz) each, C order
// ---------------------------------------------------------------------------

static const char kMagic[8] = {'T', 'O', 'L', 'W', 'G', 'R', 'I', 'D'};

int tol_write_wind_grid(const char* path, uint32_t nx, uint32_t ny,
                        uint32_t nz, const double* origin,
                        const double* spacing, const float* u, const float* v,
                        const float* w) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t version = 1;
  size_t cells = (size_t)nx * ny * nz;
  bool ok = std::fwrite(kMagic, 1, 8, f) == 8 &&
            std::fwrite(&version, 4, 1, f) == 1 &&
            std::fwrite(&nx, 4, 1, f) == 1 && std::fwrite(&ny, 4, 1, f) == 1 &&
            std::fwrite(&nz, 4, 1, f) == 1 &&
            std::fwrite(origin, 8, 3, f) == 3 &&
            std::fwrite(spacing, 8, 3, f) == 3 &&
            std::fwrite(u, 4, cells, f) == cells &&
            std::fwrite(v, 4, cells, f) == cells &&
            std::fwrite(w, 4, cells, f) == cells;
  std::fclose(f);
  return ok ? 0 : -1;
}

// Reads header; returns 0 on success and fills nx/ny/nz/origin/spacing.
int tol_read_wind_grid_header(const char* path, uint32_t* nx, uint32_t* ny,
                              uint32_t* nz, double* origin, double* spacing) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[8];
  uint32_t version = 0;
  bool ok = std::fread(magic, 1, 8, f) == 8 &&
            std::memcmp(magic, kMagic, 8) == 0 &&
            std::fread(&version, 4, 1, f) == 1 && version == 1 &&
            std::fread(nx, 4, 1, f) == 1 && std::fread(ny, 4, 1, f) == 1 &&
            std::fread(nz, 4, 1, f) == 1 && std::fread(origin, 8, 3, f) == 3 &&
            std::fread(spacing, 8, 3, f) == 3;
  std::fclose(f);
  return ok ? 0 : -1;
}

// Reads the three component arrays (caller allocates nx*ny*nz floats each).
int tol_read_wind_grid_data(const char* path, float* u, float* v, float* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[8];
  uint32_t version, nx, ny, nz;
  double origin[3], spacing[3];
  bool ok = std::fread(magic, 1, 8, f) == 8 &&
            std::fread(&version, 4, 1, f) == 1 &&
            std::fread(&nx, 4, 1, f) == 1 && std::fread(&ny, 4, 1, f) == 1 &&
            std::fread(&nz, 4, 1, f) == 1 &&
            std::fread(origin, 8, 3, f) == 3 &&
            std::fread(spacing, 8, 3, f) == 3;
  if (ok) {
    size_t cells = (size_t)nx * ny * nz;
    ok = std::fread(u, 4, cells, f) == cells &&
         std::fread(v, 4, cells, f) == cells &&
         std::fread(w, 4, cells, f) == cells;
  }
  std::fclose(f);
  return ok ? 0 : -1;
}

// ---------------------------------------------------------------------------
// Buffered binary telemetry logger
//
// Record: u32 tag | u32 count | f64 x count.  Append-only; flushed on close.
// ---------------------------------------------------------------------------

struct TolLogger {
  FILE* f;
  std::vector<char> buf;
};

void* tol_logger_open(const char* path) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  TolLogger* lg = new TolLogger{f, {}};
  lg->buf.resize(1 << 20);
  std::setvbuf(f, lg->buf.data(), _IOFBF, lg->buf.size());
  return lg;
}

int tol_logger_append(void* handle, uint32_t tag, const double* data,
                      uint32_t count) {
  if (!handle) return -1;
  TolLogger* lg = static_cast<TolLogger*>(handle);
  if (std::fwrite(&tag, 4, 1, lg->f) != 1) return -1;
  if (std::fwrite(&count, 4, 1, lg->f) != 1) return -1;
  if (count && std::fwrite(data, 8, count, lg->f) != count) return -1;
  return 0;
}

void tol_logger_close(void* handle) {
  if (!handle) return;
  TolLogger* lg = static_cast<TolLogger*>(handle);
  std::fclose(lg->f);
  delete lg;
}

}  // extern "C"
