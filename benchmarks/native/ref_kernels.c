/* Compiled-loop reference proxy kernels (single thread, fp64).
 *
 * Purpose (BASELINE.md): the Julia reference's hot loops are compiled
 * fused stencil sweeps; the vectorized-NumPy ports bound them only via a
 * "1-8x compiled-loop grant".  These C kernels ARE the compiled fused
 * loops — same algorithm, same two-pass structure as the reference
 * scripts (an RHS pass writing r, then a stage-combine pass; see
 * 18_NS2D_Lid_Driven_Cavity/lid_driven_cavity.jl:80-110,124-159) — so
 * timing them replaces the grant with a measurement.
 *
 * Layout: row-major (np1, np1) fp64, index [i*np1 + j]; i is x.
 * Build: gcc -O3 -march=native -shared -fPIC (see native_build.py).
 * Single-threaded by construction (the reference is single-threaded and
 * this machine has one core).
 */

#include <stddef.h>

#define IDX(i, j) ((size_t)(i) * (size_t)np1 + (size_t)(j))

/* -J(w,s) + lap(w)/re on the interior (Arakawa 1966 three-form average;
 * mirrors lid_driven_cavity.jl:124-159).  r's boundary is untouched. */
void arakawa_rhs(const double *w, const double *s, double *r, int np1,
                 double dx, double dy, double re) {
    const int n = np1 - 1;
    const double gg = 1.0 / (4.0 * dx * dy);
    const double idx2 = 1.0 / (dx * dx), idy2 = 1.0 / (dy * dy);
    const double ire = 1.0 / re;
    for (int i = 1; i < n; ++i) {
        for (int j = 1; j < n; ++j) {
            const double c = w[IDX(i, j)];
            const double wE = w[IDX(i + 1, j)], wW = w[IDX(i - 1, j)];
            const double wN = w[IDX(i, j + 1)], wS = w[IDX(i, j - 1)];
            const double wNE = w[IDX(i + 1, j + 1)], wSW = w[IDX(i - 1, j - 1)];
            const double wNW = w[IDX(i - 1, j + 1)], wSE = w[IDX(i + 1, j - 1)];
            const double sE = s[IDX(i + 1, j)], sW = s[IDX(i - 1, j)];
            const double sN = s[IDX(i, j + 1)], sS = s[IDX(i, j - 1)];
            const double sNE = s[IDX(i + 1, j + 1)], sSW = s[IDX(i - 1, j - 1)];
            const double sNW = s[IDX(i - 1, j + 1)], sSE = s[IDX(i + 1, j - 1)];
            const double j1 = (wE - wW) * (sN - sS) - (wN - wS) * (sE - sW);
            const double j2 = wE * (sNE - sSE) - wW * (sNW - sSW)
                            - wN * (sNE - sNW) + wS * (sSE - sSW);
            const double j3 = wNE * (sN - sE) - wSW * (sW - sS)
                            - wNW * (sN - sW) + wSE * (sE - sS);
            const double jac = gg * (j1 + j2 + j3) / 3.0;
            const double lap = (wE - 2.0 * c + wW) * idx2
                             + (wN - 2.0 * c + wS) * idy2;
            r[IDX(i, j)] = -jac + lap * ire;
        }
    }
}

/* out_interior = ca*w + cb*wt + cc*r  (SSP-RK3 stage combine,
 * lid_driven_cavity.jl:80,89-93,102-106; cc carries dt). */
void stage_combine(const double *w, const double *wt, const double *r,
                   double *out, int np1, double ca, double cb, double cc) {
    const int n = np1 - 1;
    for (int i = 1; i < n; ++i)
        for (int j = 1; j < n; ++j)
            out[IDX(i, j)] = ca * w[IDX(i, j)] + cb * wt[IDX(i, j)]
                           + cc * r[IDX(i, j)];
}

/* Jensen 2nd-order vorticity wall closures, moving lid -3/dy on j=n;
 * y-walls written last so they own the corners (bc2,
 * lid_driven_cavity.jl:39-51). */
void bc2(double *w, const double *s, int np1, double dx, double dy) {
    const int n = np1 - 1;
    const double idx2 = 1.0 / (dx * dx), idy2 = 1.0 / (dy * dy);
    for (int j = 1; j < n; ++j) {
        w[IDX(0, j)] = (-4.0 * s[IDX(1, j)] + 0.5 * s[IDX(2, j)]) * idx2;
        w[IDX(n, j)] = (-4.0 * s[IDX(n - 1, j)]
                        + 0.5 * s[IDX(n - 2, j)]) * idx2;
    }
    for (int i = 0; i <= n; ++i) {
        w[IDX(i, 0)] = (-4.0 * s[IDX(i, 1)] + 0.5 * s[IDX(i, 2)]) * idy2;
        w[IDX(i, n)] = (-4.0 * s[IDX(i, n - 1)]
                        + 0.5 * s[IDX(i, n - 2)]) * idy2 - 3.0 / dy;
    }
}

/* iters in-place lexicographic Gauss-Seidel sweeps for lap(u) = f
 * (the order-dependent relaxation of Common.jl:78-92 — exactly the
 * loop that cannot map to data-parallel hardware). */
void gs_sweep(double *u, const double *f, int np1, double dx, double dy,
              int iters) {
    const int n = np1 - 1;
    const double idx2 = 1.0 / (dx * dx), idy2 = 1.0 / (dy * dy);
    const double den = 1.0 / (2.0 * idx2 + 2.0 * idy2);
    for (int it = 0; it < iters; ++it)
        for (int i = 1; i < n; ++i)
            for (int j = 1; j < n; ++j)
                u[IDX(i, j)] = ((u[IDX(i + 1, j)] + u[IDX(i - 1, j)]) * idx2
                              + (u[IDX(i, j + 1)] + u[IDX(i, j - 1)]) * idy2
                              - f[IDX(i, j)]) * den;
}

/* r = f - lap(u) on the interior (compute_residual, Common.jl:239-246);
 * r's boundary is untouched (caller zeroes once). */
void residual(const double *u, const double *f, double *r, int np1,
              double dx, double dy) {
    const int n = np1 - 1;
    const double idx2 = 1.0 / (dx * dx), idy2 = 1.0 / (dy * dy);
    for (int i = 1; i < n; ++i)
        for (int j = 1; j < n; ++j)
            r[IDX(i, j)] = f[IDX(i, j)]
                - ((u[IDX(i + 1, j)] - 2.0 * u[IDX(i, j)]
                    + u[IDX(i - 1, j)]) * idx2
                 + (u[IDX(i, j + 1)] - 2.0 * u[IDX(i, j)]
                    + u[IDX(i, j - 1)]) * idy2);
}

/* Full-weighting fine->coarse restriction, interior coarse nodes
 * (restriction, Common.jl:21-48); coarse boundary untouched. */
void restrict_fw(const double *r, double *rc, int np1c) {
    const int nc = np1c - 1, np1f = 2 * nc + 1;
#define IDXF(i, j) ((size_t)(i) * (size_t)np1f + (size_t)(j))
    for (int I = 1; I < nc; ++I) {
        const int i = 2 * I;
        for (int J = 1; J < nc; ++J) {
            const int j = 2 * J;
            rc[(size_t)I * np1c + J] = 0.0625 * (
                4.0 * r[IDXF(i, j)]
                + 2.0 * (r[IDXF(i + 1, j)] + r[IDXF(i - 1, j)]
                         + r[IDXF(i, j + 1)] + r[IDXF(i, j - 1)])
                + r[IDXF(i + 1, j + 1)] + r[IDXF(i - 1, j - 1)]
                + r[IDXF(i + 1, j - 1)] + r[IDXF(i - 1, j + 1)]);
        }
    }
#undef IDXF
}

/* Bilinear coarse->fine prolongation ADDED into the fine field
 * (prolongation + correction fused; Common.jl:50-76 + mg_N.jl:98-101). */
void prolong_correct(const double *ec, double *u, int np1c) {
    const int nc = np1c - 1, n = 2 * nc, np1 = n + 1;
    for (int I = 0; I < nc; ++I) {
        for (int J = 0; J < nc; ++J) {
            const double c00 = ec[(size_t)I * np1c + J];
            const double c10 = ec[(size_t)(I + 1) * np1c + J];
            const double c01 = ec[(size_t)I * np1c + J + 1];
            const double c11 = ec[(size_t)(I + 1) * np1c + J + 1];
            const int i = 2 * I, j = 2 * J;
            u[IDX(i, j)] += c00;
            u[IDX(i + 1, j)] += 0.5 * (c00 + c10);
            u[IDX(i, j + 1)] += 0.5 * (c00 + c01);
            u[IDX(i + 1, j + 1)] += 0.25 * (c00 + c10 + c01 + c11);
        }
    }
    /* high-edge fine nodes on i=n / j=n come from coarse I=nc / J=nc:
       Dirichlet problems carry zero correction there; skip (matches the
       zero-boundary error fields of the V-cycle). */
}

/* ---------------- ps23 pseudospectral elementwise kernels ----------------
 * Compiled stand-ins for the ch. 22 loop's non-transform work
 * (pseudospectral_23_rule.jl:95-144): derivative-spectra assembly,
 * physical-space Jacobian product, and the RK3/CN stage combine.
 * Complex arrays are interleaved double pairs (NumPy complex128 layout).
 */

/* 4 masked derivative spectra from the vorticity spectrum:
 *   sxf = i kx wf / k2,  wyf = i ky wf,  syf = i ky wf / k2,
 *   wxf = i kx wf  — all multiplied by the dealias mask.
 * One pass over wf: 8 doubles written per element. */
void ps23_derivs(const double *wf, const double *kx0, const double *ky0,
                 const double *k2, const unsigned char *mask,
                 int nx, int ny, double *sxf, double *wyf, double *syf,
                 double *wxf) {
    for (int i = 0; i < nx; ++i) {
        const double kx = kx0[i];
        for (int j = 0; j < ny; ++j) {
            const size_t k = (size_t)i * ny + j;
            const double m = mask[k] ? 1.0 : 0.0;
            const double re = wf[2 * k] * m, im = wf[2 * k + 1] * m;
            const double ky = ky0[j], ik2 = 1.0 / k2[k];
            /* multiply by i*k: (re, im) -> (-k*im, k*re) */
            sxf[2 * k] = -kx * im * ik2;
            sxf[2 * k + 1] = kx * re * ik2;
            wxf[2 * k] = -kx * im;
            wxf[2 * k + 1] = kx * re;
            syf[2 * k] = -ky * im * ik2;
            syf[2 * k + 1] = ky * re * ik2;
            wyf[2 * k] = -ky * im;
            wyf[2 * k + 1] = ky * re;
        }
    }
}

/* Physical-space Jacobian product: jacp = Re(sx) Re(wy) - Re(sy) Re(wx),
 * written as a complex array (imag = 0) for the subsequent fft2. */
void ps23_product(const double *sx, const double *wy, const double *sy,
                  const double *wx, long long n, double *jacp) {
    for (long long k = 0; k < n; ++k) {
        jacp[2 * k] = sx[2 * k] * wy[2 * k] - sy[2 * k] * wx[2 * k];
        jacp[2 * k + 1] = 0.0;
    }
}

/* One RK3/CN stage combine over the spectrum:
 *   d = coef * k2;  out = ((1-d)/(1+d)) in + (rho_dt jprev + gamma_dt j)/(1+d)
 * (pseudospectral_23_rule.jl:44-70 stage algebra).  Real factors applied
 * to both complex components; caller zeroes the mean mode. */
void ps23_stage(const double *in, const double *jprev, const double *jc,
                const double *k2, long long n, double coef, double rho_dt,
                double gamma_dt, double *out) {
    for (long long k = 0; k < n; ++k) {
        const double d = coef * k2[k];
        const double a = (1.0 - d) / (1.0 + d), b = 1.0 / (1.0 + d);
        out[2 * k] = a * in[2 * k]
            + (rho_dt * jprev[2 * k] + gamma_dt * jc[2 * k]) * b;
        out[2 * k + 1] = a * in[2 * k + 1]
            + (rho_dt * jprev[2 * k + 1] + gamma_dt * jc[2 * k + 1]) * b;
    }
}
