// Verification-only tool: dump the reference's in-memory thermodynamic
// constant tables to a raw binary stream so tools/verify_thermo.py can diff
// them against priblast_tpu/data/thermo.npz. Not part of the framework.
#include <cstdio>
#include <cstdint>

#include "energy_par.hpp"
#include "intloops.hpp"

static void dump(const void *p, size_t n_ints, FILE *f) {
  fwrite(p, sizeof(int), n_ints, f);
}

int main(int argc, char **argv) {
  FILE *f = fopen(argv[1], "wb");
  dump(BP_pair, 25, f);
  dump(rtype, 7, f);
  dump(hairpin37, 31, f);
  dump(mismatchH37, 7 * 25, f);
  dump(mismatchI37, 7 * 25, f);
  dump(stack37, 49, f);
  dump(bulge37, 31, f);
  dump(internal_loop37, 31, f);
  dump(dangle5_37, 40, f);
  dump(dangle3_37, 40, f);
  dump(int11_37, 8 * 8 * 25, f);
  dump(int21_37, 8 * 8 * 125, f);
  dump(int22_37, 8 * 8 * 625, f);
  int scalars[6] = {TerminalAU, ML_closing37, ML_intern37,
                    ML_BASE37,  MAX_NINIO,    F_ninio37};
  dump(scalars, 6, f);
  fclose(f);
  return 0;
}
