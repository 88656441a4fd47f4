#!/bin/sh
# Rebuild the golden snapshot files from the UNMODIFIED reference writer.
# io.c needs no GSL symbols; the gslstub headers satisfy the includes.
set -e
cd "$(dirname "$0")"
gcc -O1 -fopenmp -fcommon -I gslstub -I /root/reference/src \
    gen_golden.c /root/reference/src/io.c /root/reference/src/aux.c \
    -o gen_golden -lm
./gen_golden
ls -l golden_mixed.bin golden_dmonly.bin
