// Native event-stream runtime for cmax_slam_tpu.
//
// Replaces the reference's host-side data plane (ROS subscriber queue +
// per-event pushEvent bookkeeping, src/frontend/ang_vel_estimator.cpp:68-135,
// src/cmax_slam.cpp:147-161) with vectorized C++ operating on raw arrays:
//   - fast text-event parsing (IJRR/ECD "t x y p" files) via mmap,
//   - packet-trigger scanning on the dt_ang_vel grid,
//   - time-window binary search and uniform decimation.
// Exposed through a plain C ABI consumed with ctypes (cmax_slam_tpu/io/native.py).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// Text event parsing: "t x y p" per line.
// Two-pass API: first call with out pointers null to count events, then with
// allocated buffers to fill them. Returns event count, or -1 on error.
// ---------------------------------------------------------------------------
static inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

static inline const char* parse_double(const char* p, const char* end, double* out) {
  char* q = nullptr;
  *out = strtod(p, &q);
  return (q && q <= end) ? q : end;
}

int64_t evs_parse_txt(const char* path, double* ts, int32_t* xs, int32_t* ys,
                      int8_t* ps, int64_t max_events) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  size_t size = static_cast<size_t>(st.st_size);
  if (size == 0) {
    close(fd);
    return 0;
  }
  const char* data =
      static_cast<const char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (data == MAP_FAILED) return -1;

  const char* p = data;
  const char* end = data + size;
  int64_t n = 0;
  const bool count_only = (ts == nullptr);

  while (p < end && (max_events < 0 || n < max_events)) {
    p = skip_ws(p, end);
    if (p >= end) break;
    if (*p == '\n') {
      ++p;
      continue;
    }
    if (*p == '#') {  // comment line
      while (p < end && *p != '\n') ++p;
      continue;
    }
    double t, x, y, pol;
    p = parse_double(p, end, &t);
    p = skip_ws(p, end);
    p = parse_double(p, end, &x);
    p = skip_ws(p, end);
    p = parse_double(p, end, &y);
    p = skip_ws(p, end);
    p = parse_double(p, end, &pol);
    while (p < end && *p != '\n') ++p;
    if (!count_only) {
      ts[n] = t;
      xs[n] = static_cast<int32_t>(x);
      ys[n] = static_cast<int32_t>(y);
      ps[n] = pol > 0 ? 1 : -1;
    }
    ++n;
  }
  munmap(const_cast<char*>(data), size);
  return n;
}

// ---------------------------------------------------------------------------
// Packet-trigger scan: reproduces the front-end cursor walk
// (ang_vel_estimator.cpp:84-97). Given sorted timestamps, an initial cursor
// and stride, emit for each trigger the index of the crossing event.
// Each event may trigger at most once; the cursor advances by exactly one dt
// per trigger. Returns the number of triggers written (<= max_out); the final
// cursor value is stored in *cursor_io, the scan resume index in *next_io.
// ---------------------------------------------------------------------------
int64_t evs_scan_triggers(const double* ts, int64_t n, double* cursor_io,
                          int64_t* next_io, double dt, int64_t* out_idx,
                          int64_t max_out) {
  double cursor = *cursor_io;
  int64_t i = *next_io;
  int64_t k = 0;
  while (i < n && k < max_out) {
    // first event at/after the scan position with ts > cursor
    const double* lo = std::upper_bound(ts + i, ts + n, cursor);
    int64_t idx = lo - ts;
    if (idx >= n) {
      i = n;
      break;
    }
    if (idx < i) idx = i;
    out_idx[k++] = idx;
    cursor += dt;
    i = idx + 1;
  }
  if (i >= n) *next_io = n;
  else *next_io = i;
  *cursor_io = cursor;
  return k;
}

// ---------------------------------------------------------------------------
// Time-window search: [t_beg, t_end) -> [lo, hi) indices (binary search).
// ---------------------------------------------------------------------------
void evs_window(const double* ts, int64_t n, double t_beg, double t_end,
                int64_t* lo, int64_t* hi) {
  *lo = std::lower_bound(ts, ts + n, t_beg) - ts;
  *hi = std::lower_bound(ts, ts + n, t_end) - ts;
}

// ---------------------------------------------------------------------------
// Gather + pad a packet into fixed-size buffers (LUT lookup fused in):
// writes bearing triples, relative float32 timestamps and validity weights.
// ---------------------------------------------------------------------------
void evs_gather_packet(const int32_t* xs, const int32_t* ys, const double* ts,
                       int64_t beg, int64_t end, int64_t cap, const float* lut,
                       int32_t width, double t0, float* bearings_out,
                       float* ts_rel_out, float* weights_out) {
  int64_t n = end - beg;
  if (n > cap) n = cap;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t src = beg + i;
    const int64_t lut_idx =
        static_cast<int64_t>(ys[src]) * width + xs[src];
    bearings_out[3 * i + 0] = lut[3 * lut_idx + 0];
    bearings_out[3 * i + 1] = lut[3 * lut_idx + 1];
    bearings_out[3 * i + 2] = lut[3 * lut_idx + 2];
    ts_rel_out[i] = static_cast<float>(ts[src] - t0);
    weights_out[i] = 1.0f;
  }
  for (int64_t i = n; i < cap; ++i) {
    bearings_out[3 * i + 0] = 0.0f;
    bearings_out[3 * i + 1] = 0.0f;
    bearings_out[3 * i + 2] = 1.0f;
    ts_rel_out[i] = 0.0f;
    weights_out[i] = 0.0f;
  }
}

}  // extern "C"
