/* minimal stub for compiling the reference sources standalone (no GSL
   on this host); real gsl_math.h pulls in the C float/math headers the
   reference relies on transitively */
#ifndef GSL_MATH_STUB_H
#define GSL_MATH_STUB_H
#include <math.h>
#include <float.h>
#endif
