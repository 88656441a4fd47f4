/* Golden-file generator: compiles the REFERENCE writer
 * (/root/reference/src/io.c, unmodified) standalone against stub GSL
 * headers, fills the globals with deterministic dyadic-rational
 * synthetic particles, and calls Write_output().  The committed output
 * (golden_mixed.bin, golden_dmonly.bin) is what
 * tests/test_gadget_io.py::test_golden_vs_reference asserts byte
 * equality against.  Rebuild with tests/golden/build.sh. */
#include "globals.h"
#include "io.h"

#define NGAS 7
#define NDM 9

int main(void)
{
    const long long ngas = NGAS, ndm = NDM;

    Cosmo.h_100 = 0.7;

    for (int dmonly = 0; dmonly < 2; dmonly++) {
        long long g = dmonly ? 0 : ngas;

        memset(&Param, 0, sizeof(Param));
        snprintf(Param.Output_File, CHARBUFSIZE, "%s",
                 dmonly ? "golden_dmonly.bin" : "golden_mixed.bin");
        Param.Ntotal = g + ndm;
        Param.Npart[0] = g;
        Param.Npart[1] = ndm;
        Param.Mpart[0] = dmonly ? 0.0 : 0.25;
        Param.Mpart[1] = 0.5;
        Param.Boxsize = 6400.0;

        P = Malloc(Param.Ntotal * sizeof(*P));
        SphP = Malloc((g ? g : 1) * sizeof(*SphP));
        memset(P, 0, Param.Ntotal * sizeof(*P));
        memset(SphP, 0, (g ? g : 1) * sizeof(*SphP));

        for (long long i = 0; i < Param.Ntotal; i++) {
            for (int d = 0; d < 3; d++) {
                P[i].Pos[d] = (float)(i * 8 + d) * 0.5f;
                P[i].Vel[d] = (float)(i * 4 + d) * 0.25f - 3.0f;
            }
            P[i].ID = (int32_t)(i + 1000);
        }
        for (long long i = 0; i < g; i++) {
            SphP[i].U = (float)i * 1.5f;
            SphP[i].Rho = (float)i * 0.75f + 0.5f;
            SphP[i].Hsml = (float)i * 2.0f + 1.0f;
            SphP[i].Rho_Model = (float)i * 0.375f;
            for (int d = 0; d < 3; d++)
                SphP[i].Bfld[d] = (float)(i * 4 + d) * 0.125f - 1.0f;
        }

        Write_output();
        free(P);
        free(SphP);
    }
    return 0;
}
