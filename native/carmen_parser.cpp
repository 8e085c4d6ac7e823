// Fast CARMEN log parser (native data-loader component).
//
// The reference preprocesses CARMEN logs with a line-by-line Python script
// (SURVEY.md §3 "Data preprocessor"); for multi-GB Radish logs feeding a
// TPU-speed pipeline, the host-side parse becomes the bottleneck, so this
// is the framework's native-runtime piece for L0: a single-pass
// mmap-friendly parser exposed over a C ABI and bound via ctypes
// (slam2d_tpu/data/native.py). Python fallback stays available.
//
// Build: make -C native   (produces libcarmen_parser.so)
//
// ABI:
//   carmen_count(path, *n_scans, *n_beams) -> 0 on success
//   carmen_parse(path, odom[n*3], ranges[n*n_beams], n, n_beams) -> rows
// Only FLASER lines are consumed (they carry their own odometry fields,
// matching the Python loader's contract).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Cursor {
  const char* p;
  const char* end;
};

inline void skip_spaces(Cursor& c) {
  while (c.p < c.end && (*c.p == ' ' || *c.p == '\t')) ++c.p;
}

inline void skip_line(Cursor& c) {
  while (c.p < c.end && *c.p != '\n') ++c.p;
  if (c.p < c.end) ++c.p;
}

// Fast strtod-free float parse (CARMEN floats are plain decimal).
inline bool parse_double(Cursor& c, double* out) {
  skip_spaces(c);
  const char* s = c.p;
  bool neg = false;
  if (c.p < c.end && (*c.p == '-' || *c.p == '+')) {
    neg = (*c.p == '-');
    ++c.p;
  }
  double v = 0.0;
  bool any = false;
  while (c.p < c.end && *c.p >= '0' && *c.p <= '9') {
    v = v * 10.0 + (*c.p - '0');
    ++c.p;
    any = true;
  }
  if (c.p < c.end && *c.p == '.') {
    ++c.p;
    double f = 0.1;
    while (c.p < c.end && *c.p >= '0' && *c.p <= '9') {
      v += (*c.p - '0') * f;
      f *= 0.1;
      ++c.p;
      any = true;
    }
  }
  if (c.p < c.end && (*c.p == 'e' || *c.p == 'E')) {
    ++c.p;
    bool eneg = false;
    if (c.p < c.end && (*c.p == '-' || *c.p == '+')) {
      eneg = (*c.p == '-');
      ++c.p;
    }
    int ex = 0;
    while (c.p < c.end && *c.p >= '0' && *c.p <= '9') {
      ex = ex * 10 + (*c.p - '0');
      ++c.p;
    }
    double scale = 1.0;
    while (ex-- > 0) scale *= 10.0;
    v = eneg ? v / scale : v * scale;
  }
  if (!any) {
    c.p = s;
    return false;
  }
  *out = neg ? -v : v;
  return true;
}

inline bool parse_long(Cursor& c, long* out) {
  double d;
  if (!parse_double(c, &d)) return false;
  *out = static_cast<long>(d);
  return true;
}

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
  m.fd = open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size == 0) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  m.data = static_cast<const char*>(p);
  m.size = st.st_size;
  return m;
}

void unmap(Mapped& m) {
  if (m.data) munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) close(m.fd);
}

inline bool is_flaser(Cursor& c) {
  return (c.end - c.p) >= 7 && std::memcmp(c.p, "FLASER ", 7) == 0;
}

}  // namespace

extern "C" {

namespace {

// Does the row at `t` (positioned after "FLASER ") fully parse as a
// positive beam count, that many ranges, and 6 pose fields?
inline bool row_parses(Cursor t, long* nb_out) {
  long nb;
  if (!parse_long(t, &nb) || nb <= 0) return false;
  for (long i = 0; i < nb + 6; ++i) {
    double v;
    if (!parse_double(t, &v)) return false;
  }
  *nb_out = nb;
  return true;
}

}  // namespace

// First pass: count FLASER rows; latch the beam count from the first row
// that FULLY parses (a truncated or corrupt first row must not poison the
// rest of the file — parity with the Python loader).
int carmen_count(const char* path, int64_t* n_scans, int64_t* n_beams) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  Cursor c{m.data, m.data + m.size};
  int64_t rows = 0, beams = 0;
  while (c.p < c.end) {
    if (is_flaser(c)) {
      if (beams == 0) {
        Cursor t = c;
        t.p += 7;
        long nb;
        if (row_parses(t, &nb)) beams = nb;
      }
      ++rows;
    }
    skip_line(c);
  }
  unmap(m);
  *n_scans = rows;
  *n_beams = beams;
  return 0;
}

// Second pass: fill odom [n*3] and ranges [n*n_beams] (row-major float32).
// Rows whose beam count differs from n_beams are skipped. Returns the
// number of rows written, or -1 on IO error.
int64_t carmen_parse(const char* path, float* odom, float* ranges,
                     int64_t n, int64_t n_beams) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  Cursor c{m.data, m.data + m.size};
  int64_t row = 0;
  while (c.p < c.end && row < n) {
    if (!is_flaser(c)) {
      skip_line(c);
      continue;
    }
    Cursor t = c;
    t.p += 7;
    long nb;
    bool ok = parse_long(t, &nb) && nb == n_beams;
    if (ok) {
      float* rrow = ranges + row * n_beams;
      for (long i = 0; ok && i < nb; ++i) {
        double v;
        ok = parse_double(t, &v);
        rrow[i] = static_cast<float>(v);
      }
      // fields after ranges: x y theta odom_x odom_y odom_theta ...
      double pose[6];
      for (int i = 0; ok && i < 6; ++i) ok = parse_double(t, &pose[i]);
      if (ok) {
        odom[row * 3 + 0] = static_cast<float>(pose[3]);
        odom[row * 3 + 1] = static_cast<float>(pose[4]);
        odom[row * 3 + 2] = static_cast<float>(pose[5]);
        ++row;
      }
    }
    skip_line(c);
  }
  unmap(m);
  return row;
}

}  // extern "C"
