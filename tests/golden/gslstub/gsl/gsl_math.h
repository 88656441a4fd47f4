/* minimal stub for compiling the reference writer standalone (no GSL
   on this host); io.c uses no GSL symbols — see tests/golden/README */
#ifndef GSL_MATH_STUB_H
#define GSL_MATH_STUB_H
#include <math.h>
#endif
