// Generate the lookup tables for the table-driven exp/log approximations
// (herumi/fmath algorithm; see /root/reference/src/fmath.hpp:148-216 for the
// upstream definition). The reference's numeric outputs depend on these
// approximations rather than libm, so exact predictions.txt parity requires
// the same tables. They are built here with the host libm exactly as the
// reference builds them during static initialization, then packed into
// priblast_tpu/data/fmath_tables.npz by tools/gen_fmath_tables.py.
//
//   expd: 11-bit table; tbl[i] = low 52 bits of double(2^(i/2048))
//   logf: 11-bit mantissa table over [1,2): app[i] = float(log(1+i/2048)),
//         rev[i] = slope correction per mantissa ulp.
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

int main(int argc, char **argv) {
  FILE *f = fopen(argv[1], "wb");

  // expd table (EXPD_TABLE_SIZE = 11 -> 2048 entries)
  const int sbit = 11;
  const int s = 1 << sbit;
  for (int i = 0; i < s; i++) {
    double d = ::pow(2.0, i * (1.0 / s));
    uint64_t bits;
    std::memcpy(&bits, &d, 8);
    bits &= (1ULL << 52) - 1;
    fwrite(&bits, 8, 1, f);
  }

  // log table (LOG_TABLE_SIZE = 12 -> LEN = 11 -> 2048 entries of {app, rev})
  const int LEN = 11;
  const double e = 1.0 / double(1 << 24);
  const double h = 1.0 / double(1 << LEN);
  const size_t n = 1U << LEN;
  for (size_t i = 0; i < n; i++) {
    double x = 1 + double(i) / n;
    double a = ::log(x);
    float app = (float)a;
    float rev;
    if (i < n - 1) {
      double b = ::log(x + h - e);
      rev = (float)((b - a) / ((h - e) * (1 << 23)));
    } else {
      rev = (float)(1 / (x * (1 << 23)));
    }
    fwrite(&app, 4, 1, f);
    fwrite(&rev, 4, 1, f);
  }
  float c_log2 = ::logf(2.0f) / (1 << 23);
  fwrite(&c_log2, 4, 1, f);

  fclose(f);
  return 0;
}
