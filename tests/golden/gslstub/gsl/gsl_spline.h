/* Minimal-but-REAL replacement for GSL's cspline interpolation, enough
 * to compile and run the reference's mass-profile splines standalone
 * (/root/reference/src/setup.c:688-712: gsl_interp_cspline on the
 * 1024-point monotonicity-clamped M(<r) table and its inverse).
 * Implements the same NATURAL cubic spline GSL's cspline uses
 * (second derivative zero at both ends, classic tridiagonal solve),
 * with the accel cache reduced to a stateless binary search. */
#ifndef GSL_SPLINE_STUB_H
#define GSL_SPLINE_STUB_H

#include <stddef.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    int unused;
} gsl_interp_accel;

typedef struct {
    int unused;
} gsl_interp_type;

static const gsl_interp_type gslstub_cspline_type = { 0 };
static const gsl_interp_type *const gsl_interp_cspline =
    &gslstub_cspline_type;

typedef struct {
    size_t n;
    double *x, *y, *c;   /* c: second derivatives at the knots */
} gsl_spline;

static gsl_interp_accel * __attribute__((unused))
gsl_interp_accel_alloc(void)
{
    return calloc(1, sizeof(gsl_interp_accel));
}

static void __attribute__((unused))
gsl_interp_accel_free(gsl_interp_accel *a)
{
    free(a);
}

static gsl_spline * __attribute__((unused))
gsl_spline_alloc(const gsl_interp_type *T, size_t n)
{
    (void) T;
    gsl_spline *s = calloc(1, sizeof(*s));
    s->n = n;
    s->x = malloc(n * sizeof(double));
    s->y = malloc(n * sizeof(double));
    s->c = calloc(n, sizeof(double));
    return s;
}

static void __attribute__((unused))
gsl_spline_free(gsl_spline *s)
{
    if (!s)
        return;
    free(s->x); free(s->y); free(s->c); free(s);
}

/* natural cubic spline coefficients: tridiagonal solve for y'' */
static int __attribute__((unused))
gsl_spline_init(gsl_spline *s, const double *x, const double *y,
                size_t n)
{
    s->n = n;
    memcpy(s->x, x, n * sizeof(double));
    memcpy(s->y, y, n * sizeof(double));
    if (n < 3) {
        memset(s->c, 0, n * sizeof(double));
        return 0;
    }
    double *sub = malloc(n * sizeof(double));
    double *diag = malloc(n * sizeof(double));
    double *rhs = malloc(n * sizeof(double));
    for (size_t i = 1; i + 1 < n; i++) {
        const double h0 = x[i] - x[i - 1];
        const double h1 = x[i + 1] - x[i];
        sub[i] = h1;
        diag[i] = 2.0 * (h0 + h1);
        rhs[i] = 6.0 * ((y[i + 1] - y[i]) / h1
                        - (y[i] - y[i - 1]) / h0);
    }
    /* forward elimination (natural BC: c[0] = c[n-1] = 0) */
    for (size_t i = 2; i + 1 < n; i++) {
        const double m = (x[i] - x[i - 1]) / diag[i - 1];
        diag[i] -= m * sub[i - 1];
        rhs[i] -= m * rhs[i - 1];
    }
    s->c[0] = s->c[n - 1] = 0.0;
    for (size_t i = n - 2; i >= 1; i--) {
        s->c[i] = (rhs[i] - sub[i] * s->c[i + 1]) / diag[i];
        if (i == 1)
            break;
    }
    free(sub); free(diag); free(rhs);
    return 0;
}

static double __attribute__((unused))
gsl_spline_eval(const gsl_spline *s, double xv, gsl_interp_accel *a)
{
    (void) a;
    const size_t n = s->n;
    size_t lo = 0, hi = n - 1;
    if (xv <= s->x[0])
        hi = 1;
    else if (xv >= s->x[n - 1])
        lo = n - 2;
    else
        while (hi - lo > 1) {
            const size_t mid = (lo + hi) / 2;
            if (s->x[mid] > xv)
                hi = mid;
            else
                lo = mid;
        }
    const double h = s->x[hi] - s->x[lo];
    const double A = (s->x[hi] - xv) / h;
    const double B = (xv - s->x[lo]) / h;
    return A * s->y[lo] + B * s->y[hi]
        + ((A * A * A - A) * s->c[lo]
           + (B * B * B - B) * s->c[hi]) * (h * h) / 6.0;
}

#endif
