#ifndef GSL_RNG_STUB_H
#define GSL_RNG_STUB_H
typedef struct { int _unused; } gsl_rng;
typedef struct { const char *name; } gsl_rng_type;
#endif
