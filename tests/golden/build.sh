#!/bin/sh
# Rebuild the golden files from the UNMODIFIED reference sources.
# - gen_golden: the snapshot writer (io.c needs no GSL symbols)
# - gen_setup: the full scene construction (setup.c against the
#   gslstub QAG + cspline implementations), with the Makefile's
#   default model flags (reference Makefile:4-25)
set -e
cd "$(dirname "$0")"
REFFLAGS="-DNFWC_DUFFY08 -DBETA=0.54 -DCOMET -DNO_RCUT_IN_T"
gcc -O1 -fopenmp -fcommon -I gslstub -I /root/reference/src \
    gen_golden.c /root/reference/src/io.c /root/reference/src/aux.c \
    -o gen_golden -lm
./gen_golden
gcc -O1 -fopenmp -fcommon $REFFLAGS -I gslstub -I /root/reference/src \
    gen_setup.c /root/reference/src/io.c /root/reference/src/setup.c \
    /root/reference/src/cosmo.c /root/reference/src/unit.c \
    /root/reference/src/aux.c -o gen_setup -lm
./gen_setup /root/reference/cluster.par | grep PARITY \
    > setup_table_cluster.txt
sed 's/^Mass_Ratio  0 %.3125/Mass_Ratio  0.3125/; s/^Cuspy       0/Cuspy       1/' \
    /root/reference/cluster.par > merger.par
./gen_setup merger.par | grep PARITY > setup_table_merger.txt
# WVT trajectory oracle: the reference relaxation loop + full sph.c
# with the in-tree brute-force neighbour fallback (wvt_relax.c:296-340)
REFSRC="/root/reference/src/io.c /root/reference/src/setup.c \
    /root/reference/src/cosmo.c /root/reference/src/unit.c \
    /root/reference/src/aux.c /root/reference/src/wvt_relax.c \
    /root/reference/src/sph.c"
gcc -O2 -fopenmp -fcommon $REFFLAGS -I gslstub -I /root/reference/src \
    gen_wvt.c $REFSRC -o gen_wvt -lm
gcc -O2 -fopenmp -fcommon $REFFLAGS -DSPH_CUBIC_SPLINE \
    -I gslstub -I /root/reference/src \
    gen_wvt.c $REFSRC -o gen_wvt_m4 -lm
ls -l golden_mixed.bin golden_dmonly.bin \
    setup_table_cluster.txt setup_table_merger.txt gen_wvt gen_wvt_m4
