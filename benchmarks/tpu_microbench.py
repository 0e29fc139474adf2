"""TPU candidate microbench: measures every formulation pair so the
auto-selection heuristics (_pick_smoother, _pick_transfers, cavity
poisson=, spectral full-vs-half) are set by data, not guesswork.

    python benchmarks/tpu_microbench.py [--sizes small] [--only NAME]

Timing methodology (CLAUDE.md / memory tpu-env-quirks): every measured
region is a lax.scan window under one jit, synced by pulling a scalar to
the host; inputs are perturbed between repeats so the remote execution
cache cannot serve a stale result.  One JSON line per measurement.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_julia_tpu.jaxconfig import configure_jax  # noqa: E402

configure_jax(cache_dir="~/.cache/jax_bench_cache", min_compile_secs=1.0)


_DISPATCH_OVERHEAD_S = None


def _dispatch_overhead():
    """Per-call dispatch+sync latency through the (possibly remote)
    backend: min over 10 reps of running a trivial jitted program and
    pulling its scalar to the host.  Measured once per process.

    Round-2 post-mortem: at iters=10-50 this overhead (tens of ms through
    the axon tunnel) inflated every per-iteration number — e.g. the
    microbench read cavity_fst 3.51 ms/step while the 200-step full bench
    read 1.85 ms/step, and restrict round trips read 33-52 ms for a
    ~67 MB pass.  Rankings were unaffected (the overhead is a constant
    shift per window), but absolute ms were not comparable to bench.py.
    Subtracting the measured overhead makes them comparable."""
    global _DISPATCH_OVERHEAD_S
    if _DISPATCH_OVERHEAD_S is None:
        trivial = jax.jit(lambda v: v * 1.000001 + 1e-7)
        v = jnp.float32(1.0)
        v = trivial(v)
        float(v)                      # warm compile + first round trip
        best = float("inf")
        for _ in range(10):
            t0 = time.perf_counter()
            v = trivial(v)            # new input each rep: not cacheable
            float(v)
            best = min(best, time.perf_counter() - t0)
        _DISPATCH_OVERHEAD_S = best
        print(json.dumps({"bench": "dispatch_overhead",
                          "ms": round(best * 1e3, 4)}), flush=True)
    return _DISPATCH_OVERHEAD_S


def timed(name, fn, x, iters=20, repeats=3, consts=None):
    """Time `iters` applications of fn under one scan; min over repeats;
    the per-call dispatch overhead (measured once) is subtracted so the
    per-iteration ms is window-length independent.

    Big non-carried arrays MUST go through `consts` (fn then takes
    (carry, consts)): closed-over arrays are embedded as constants in
    the compiled program, and at 4096^2 the serialized compile request
    blows past the remote tunnel's body limit (HTTP 413 — observed for
    the V-cycle family whose closures held ~270 MB of masks)."""
    def checksum(out):
        # ONE fused scalar: per-leaf host pulls are separate dispatches,
        # each paying the tunnel round trip inside the timed region
        return sum(jnp.abs(a).sum().astype(jnp.float32)
                   for a in jax.tree.leaves(out))

    if consts is None:
        run = jax.jit(lambda x0: (lambda o: (o, checksum(o)))(lax.scan(
            lambda c, _: (fn(c), 0.0), x0, None, length=iters)[0]))
    else:
        base = jax.jit(lambda x0, cs: (lambda o: (o, checksum(o)))(lax.scan(
            lambda c, _: (fn(c, cs), 0.0), x0, None, length=iters)[0]))
        run = lambda x0: base(x0, consts)
    ov = _dispatch_overhead()
    out, chk = run(x)                # compile + warm
    float(chk)

    def one_rep(r):
        # ADDITIVE perturbation: multiplicative is a no-op on all-zero
        # states (e.g. the cavity IC) and identical inputs can be served
        # from the remote execution cache (tpu-env-quirks)
        eps = 1e-6 * (r + 1)
        xr = jax.tree.map(lambda a: a + jnp.asarray(eps, a.dtype), x)
        jax.block_until_ready(xr)  # sync EVERY leaf's perturb add — a
        # first-leaf-only pull left the other leaves' adds pending
        # inside the timed window for multi-leaf carries
        t0 = time.perf_counter()
        _, chk = run(xr)
        s = float(chk)
        assert np.isfinite(s), name
        return time.perf_counter() - t0

    windows = [one_rep(r) for r in range(repeats)]
    # Adaptive repeats (no recompile — remote recompiles take minutes, so
    # the window length is fixed): when dispatch jitter is comparable to
    # the compute window, the min over 3 samples rarely touches the
    # dispatch floor that `ov` measured, which is how round 2 read
    # cavity_fst at 3.51 ms/step against the 1000-step bench's 1.85.
    # More samples make min(window) - ov a consistent estimator.
    r = repeats
    # spread over the LAST 3 windows, not the global max: one early
    # tunnel stall would otherwise lock the loop to all 12 reps no
    # matter how consistent later samples are
    while r < 12 and (max(windows[-3:]) - min(windows[-3:])
                      ) > 0.25 * min(windows[-3:]):
        windows.append(one_rep(r))
        r += 1
    best_win = min(windows)
    # clamp: ov is a min over 10 probes, so a lucky dispatch can beat
    # it and make (window - ov) negative for cheap small-grid kernels;
    # a negative "best" would corrupt winners.json rankings.  A clamped
    # 0.0 corrupts them just as much (it outranks every honest number),
    # so the emission carries below_overhead_floor for consumers to
    # rank such entries last.
    floored = best_win <= ov
    best = max(best_win - ov, 0.0) / iters
    rec = {"bench": name, "ms": round(best * 1e3, 4),
           "overhead_ms": round(ov * 1e3, 3),
           "win_ms": round(best_win * 1e3, 3),
           "reps": len(windows)}
    if floored:
        rec["below_overhead_floor"] = True
    print(json.dumps(rec), flush=True)
    return best


def bench_mg_transfers(n):
    from cfd_julia_tpu.poisson import iterative, multigrid

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    r = r * iterative.interior_mask(n, n, jnp.float32)
    uc = jnp.asarray(
        rng.standard_normal((n // 2 + 1, n // 2 + 1)), jnp.float32)
    # round-trip prolong(restrict(.)) keeps shapes scan-stable
    for name, rf in (("conv", multigrid.restriction),
                     ("matmul", multigrid.restriction_matmul),
                     ("reshape", multigrid.restriction_reshape)):
        timed(f"restrict_{name}_{n}",
              lambda x, rf=rf: multigrid.prolongation(rf(x)), r, iters=10)
    for name, pf in (("conv", multigrid.prolongation),
                     ("matmul", multigrid.prolongation_matmul)):
        timed(f"prolong_{name}_{n}",
              lambda x, pf=pf: multigrid.restriction(pf(x)), uc, iters=10)


def bench_mg_edges(n):
    """Fused Pallas level-edge kernels vs their XLA compositions."""
    from cfd_julia_tpu.ops import pallas_kernels
    from cfd_julia_tpu.poisson import iterative, multigrid

    rng = np.random.default_rng(7)
    dx = 1.0 / n
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    uc = jnp.asarray(rng.standard_normal((n // 2 + 1, n // 2 + 1)),
                     jnp.float32)
    imask = iterative.interior_mask(n, n, jnp.float32)
    masks = iterative.color_masks(n, n, jnp.float32)

    # big non-carried arrays travel via `consts` (closed-over arrays
    # embed as constants -> oversized remote compile requests)
    cs = dict(f=f, uc=uc, masks=masks, imask=imask)
    # descend edge: residual + restrict (prolong back for shape-stability;
    # rescale by ~1/|lap| so 10 chained applications stay finite)
    sc = dx * dx / 8.0
    # BOTH arms use the matmul transfer pair (the TPU production auto
    # choice) so the fused-vs-unfused edge comparison is not
    # contaminated by the conv-vs-matmul transfer gap (~30 ms at 4096^2)
    timed(f"edge_resrestrict_xla_{n}",
          lambda x, c: sc * multigrid.prolongation_matmul(
              multigrid.restriction_matmul(
                  iterative.residual_full(c["f"], x, dx, dx, c["imask"]))),
          u, iters=10, consts=cs)
    timed(f"edge_resrestrict_fused_{n}",
          lambda x, c: sc * multigrid.prolongation_matmul(
              pallas_kernels.residual_restrict_fused(x, c["f"], dx, dx)),
          u, iters=10, consts=cs)
    # full descend edge: v1=2 pre-smooth + residual + restrict
    unfused_smoother = multigrid._pick_smoother(n, n)  # production auto
    timed(f"edge_smoothresrestrict_xla_{n}",
          lambda x, c: sc * multigrid.prolongation_matmul(
              multigrid.restriction_matmul(
                  iterative.residual_full(
                      c["f"], multigrid.smooth(x, c["f"], dx, dx, 2,
                                               c["masks"],
                                               impl=unfused_smoother),
                      dx, dx, c["imask"]))), u, iters=10, consts=cs)
    for tile in (32, 64):
        timed(f"edge_smoothresrestrict_fused_t{tile}_{n}",
              lambda x, c, t=tile: sc * multigrid.prolongation_matmul(
                  pallas_kernels.smooth_residual_restrict_fused(
                      x, c["f"], dx, dx, 2, tile=t)[1]),
              u, iters=10, consts=cs)
    # ascend edge: prolong + correct + v3=2 post-smooth
    timed(f"edge_prolsmooth_xla_{n}",
          lambda x, c: multigrid.smooth(
              x + multigrid.prolongation_matmul(c["uc"]) * c["imask"],
              c["f"], dx, dx, 2, c["masks"], impl=unfused_smoother),
          u, iters=10, consts=cs)
    timed(f"edge_prolsmooth_fused_{n}",
          lambda x, c: pallas_kernels.prolong_correct_smooth_fused(
              x, c["f"], c["uc"], dx, dx, 2), u, iters=10, consts=cs)


def bench_mg_vcycle(n):
    from cfd_julia_tpu.models import poisson2d
    from cfd_julia_tpu.poisson import multigrid

    # measured-winner family first (vcycle_matmul_pallas_off 18.2 ms at
    # 4096^2); XLA-smoother combos only below the remote-compile body
    # limit (4096^2 XLA forms die with HTTP 413)
    combos = [("matmul", "pallas", "off"), ("matmul", "cheb", "off"),
              ("matmul", "pallas", "on"),
              ("conv", "pallas", "off"), ("reshape", "pallas", "off"),
              ("conv", "pallas", "on")]
    if n <= 1024:
        combos += [("conv", "xla", "off"), ("matmul", "xla", "off")]
    for transfers, smoother, fused in combos:
            mgc = multigrid.MGConfig(
                tol=1e-30, max_cycles=1, transfers=transfers, fused=fused,
                smoother="cheb" if smoother == "cheb" else "auto")
            cfg = poisson2d.PoissonConfig(nx=n, ny=n, solver="multigrid",
                                          problem="poly", mg=mgc)
            _, _, _, _, ue, f = poisson2d.build_problem(cfg, jnp.float32)
            u0 = poisson2d._dirichlet_init(ue)
            levels = multigrid._build_levels(n, n, cfg.dx, cfg.dy, 0)
            masks = [multigrid.color_masks(l[0], l[1], jnp.float32)
                     for l in levels]
            imasks = [multigrid.interior_mask(l[0], l[1], jnp.float32)
                      for l in levels]
            # cheb applies at every level (cfg-derived inside v_cycle);
            # the RB forms pin pallas only where the slab pays off
            impls = None if smoother == "cheb" else \
                [smoother if min(l[0], l[1]) >= 512 else "xla"
                 for l in levels]
            tag = f"vcycle_{transfers}_{smoother}_{fused}_{n}"
            try:
                timed(tag,
                      lambda u, c, m=mgc, im=impls: multigrid.v_cycle(
                          u, c["f"], levels, c["masks"], c["imasks"],
                          m, im),
                      u0, iters=5,
                      consts=dict(f=f, masks=masks, imasks=imasks))
            except Exception as e:
                print(json.dumps({"bench": tag, "error": repr(e)[:200]}),
                      flush=True)


def bench_cavity(n):
    from cfd_julia_tpu.models import cavity

    w0 = jnp.zeros((n + 1, n + 1), jnp.float32)
    variants = [("fst", "highest", "xla"), ("fst_half", "highest", "xla"),
                ("matmul", "highest", "xla"),
                ("matmul_bf16x3", "highest", "xla"),
                ("fst_mxu", "highest", "xla"),
                ("fst_half_mxu", "highest", "xla"),
                ("fst_half_mxu", "high", "xla"),
                ("fst", "highest", "pallas"),
                ("fst_half_mxu", "high", "pallas")]
    for poisson, prec, rhs in variants:
        cfg = cavity.CavityConfig(nx=n, ny=n, dt=2e-5, poisson=poisson,
                                  fft_precision=prec, rhs_impl=rhs)
        step = cavity.make_step_fn(cfg)
        tag = poisson if prec == "highest" else f"{poisson}_{prec}"
        if rhs != "xla":
            tag += f"_{rhs}rhs"
        timed(f"cavity_{tag}_{n}", step,
              (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float32)),
              iters=50)


def bench_cavity_parts(n):
    """Component breakdown of the cavity step at the headline size: the
    Poisson solve, the Arakawa RHS, and the BC-assembly/stage-combine
    remainder are timed separately (overhead-corrected), so the 'where
    does the step time go' question has a measured answer."""
    from cfd_julia_tpu.models import cavity
    from cfd_julia_tpu.ops import arakawa
    from cfd_julia_tpu.poisson import direct

    rng = np.random.default_rng(11)
    dx = 1.0 / n
    w = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    sc = 1e-3
    for impl in ("rfft", "half", "matmul", "half_mxu"):
        timed(f"cavpart_solve_{impl}_{n}",
              lambda x, i=impl: sc * direct.solve_fst(x, dx, dx, impl=i),
              w, iters=20)
    timed(f"cavpart_solve_densemm_{n}",
          lambda x: sc * direct.solve_fst_matmul_padded(x, n, n, dx, dx),
          w, iters=20)
    # interior-aligned vs zero-extended: isolates the MXU tile-padding
    # cost (1025 -> 1152 lanes vs 1023 -> 1024 at n=1024)
    for prec in ("highest", "high"):
        timed(f"cavpart_solve_intmm_{prec}_{n}",
              lambda x, p=prec: sc * direct.solve_fst_matmul_interior(
                  x, n, n, dx, dx, mm_precision=p),
              w, iters=20)
    timed(f"cavpart_rhs_{n}",
          lambda ws: (ws[0] + 1e-9 * arakawa.vorticity_rhs(
              ws[0], ws[1], dx, dx, 100.0), ws[1]), (w, s), iters=20)
    timed(f"cavpart_bc_assemble_{n}",
          lambda ws: (sc * cavity.assemble_with_wall_bc(
              ws[0][1:-1, 1:-1], ws[1], dx, dx), ws[1]), (w, s), iters=20)
    cfg = cavity.CavityConfig(nx=n, ny=n, dt=2e-5, poisson="fst")
    step = cavity.make_step_fn(cfg)
    timed(f"cavpart_fullstep_fst_{n}", step,
          (jnp.zeros((n + 1, n + 1), jnp.float32),
           jnp.zeros((n + 1, n + 1), jnp.float32),
           jnp.zeros((), jnp.float32)), iters=50)


def bench_ps23(n):
    # real-packed states at every jit boundary (spectral.pack_c: the
    # remote-TPU backend rejects complex64 params/outputs)
    from cfd_julia_tpu.models import vortex

    cfg = vortex.VortexConfig(nx=n, ny=n, solver="ps23", dt=1e-3)
    w0 = vortex.initial_vorticity(cfg, jnp.float32)
    full = vortex.make_spectral_step_packed(cfg, jnp.float32)
    half = vortex.make_spectral_step_half_packed(cfg, jnp.float32)
    wf = jax.jit(vortex.full_init_packed)(w0)
    h0 = jax.jit(vortex.half_init_packed)(w0)
    timed(f"ps23_full_{n}", full, wf, iters=10)
    timed(f"ps23_half_{n}", half, h0, iters=10)
    cfg32 = vortex.VortexConfig(nx=n, ny=n, solver="ps32", dt=1e-3)
    step32 = vortex.make_spectral_step_half_packed(cfg32, jnp.float32)
    timed(f"ps32_half_{n}", step32, h0, iters=10)
    for fft_impl, prec, pair in (("matmul", "highest", "pack"),
                                 ("matmul", "high", "pack"),
                                 ("matmul", "high", "rowsfirst"),
                                 ("xla", "highest", "rowsfirst")):
        cfg_v = vortex.VortexConfig(nx=n, ny=n, solver="ps23", dt=1e-3,
                                    fft_impl=fft_impl, fft_precision=prec,
                                    pair_impl=pair)
        half_v = vortex.make_spectral_step_half_packed(cfg_v, jnp.float32)
        tag = f"ps23_half_{fft_impl}_{prec}_{pair}_{n}"
        timed(tag, half_v, h0, iters=10)


def bench_fft(n):
    """Raw transform race: XLA VPU FFT vs four-step MXU matmul FFT.

    Complex values never cross a jit boundary (spectral.pack_c): inputs
    are real (2, n, n) Re/Im stacks, the error check is a jitted real
    scalar."""
    from cfd_julia_tpu.ops import mxu_fft, spectral

    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.standard_normal((2, n, n)), jnp.float32)  # packed Re/Im

    for prec in ("highest", "high"):
        @jax.jit
        def rel_err(h, p=prec):
            z = spectral.unpack_c(h)
            ref = jnp.fft.fft2(z)
            return (jnp.abs(mxu_fft.fft2_matmul(z, p) - ref).max()
                    / jnp.abs(ref).max())

        print(json.dumps({"bench": f"mxufft_rel_err_{prec}_{n}",
                          "val": float(rel_err(x))}), flush=True)
    timed(f"fft2_xla_{n}",
          lambda h: spectral.pack_c(jnp.fft.ifft2(jnp.fft.fft2(
              spectral.unpack_c(h)))), x, iters=10)
    for prec in ("highest", "high"):
        timed(f"fft2_mxu_{prec}_{n}",
              lambda h, p=prec: spectral.pack_c(mxu_fft.ifft2_matmul(
                  mxu_fft.fft2_matmul(spectral.unpack_c(h), p), p)),
              x, iters=10)


def bench_pallas_rhs(n):
    from cfd_julia_tpu.models import vortex
    from cfd_julia_tpu.ops import arakawa, pallas_kernels

    cfg = vortex.VortexConfig(nx=n, ny=n)
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    dx = dy = cfg.dx
    try:
        ref = arakawa.vorticity_rhs(w, s, dx, dy, 1000.0)
        out = pallas_kernels.arakawa_rhs_fused(w, s, dx, dy, 1000.0)
        err = float(jnp.abs(out - ref).max())
        print(json.dumps({"bench": f"arakawa_fused_err_{n}", "val": err}),
              flush=True)
        timed(f"arakawa_xla_{n}",
              lambda ws: (ws[0] + 1e-9 * arakawa.vorticity_rhs(
                  ws[0], ws[1], dx, dy, 1000.0), ws[1]), (w, s), iters=20)
        timed(f"arakawa_pallas_{n}",
              lambda ws: (ws[0] + 1e-9 * pallas_kernels.arakawa_rhs_fused(
                  ws[0], ws[1], dx, dy, 1000.0), ws[1]), (w, s), iters=20)
    except Exception as e:
        print(json.dumps({"bench": f"arakawa_pallas_{n}",
                          "error": repr(e)[:300]}), flush=True)


def bench_euler(n):
    from cfd_julia_tpu.models import euler1d
    from cfd_julia_tpu.ops import pallas_kernels

    cfg = euler1d.EulerConfig(nx=n, solver="hllc")
    _, q0 = euler1d.sod_initial_state(cfg, jnp.float32)
    rhs = euler1d.make_rhs(cfg)
    timed(f"euler_xla_{n}", lambda q: q + 1e-9 * rhs(q), q0, iters=50)
    try:
        out = pallas_kernels.euler_rhs_fused(q0, cfg.gamma, cfg.dx, "hllc")
        ref = rhs(q0)
        err = float(jnp.abs(out - ref).max())
        print(json.dumps({"bench": f"euler_fused_err_{n}", "val": err}),
              flush=True)
        timed(f"euler_pallas_{n}",
              lambda q: q + 1e-9 * pallas_kernels.euler_rhs_fused(
                  q, cfg.gamma, cfg.dx, "hllc"), q0, iters=50)
    except Exception as e:
        print(json.dumps({"bench": f"euler_pallas_{n}",
                          "error": repr(e)[:300]}), flush=True)


def bench_dst(n):
    from cfd_julia_tpu.ops import spectral
    from cfd_julia_tpu.poisson import direct

    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    dx = 1.0 / n
    timed(f"fst_rfft_{n}", lambda x: direct.solve_fst(x, dx, dx), f,
          iters=20)
    timed(f"fst_matmul_{n}",
          lambda x: direct.solve_fst_matmul_padded(x, n, n, dx, dx), f,
          iters=20)
    timed(f"fst_mxufft_{n}",
          lambda x: direct.solve_fst(x, dx, dx, impl="matmul"), f,
          iters=20)
    timed(f"fst_half_{n}",
          lambda x: direct.solve_fst(x, dx, dx, impl="half"), f,
          iters=20)
    for prec in ("highest", "high"):
        timed(f"fst_half_mxu_{prec}_{n}",
              lambda x, p=prec: direct.solve_fst(x, dx, dx, impl="half_mxu",
                                                 precision=p), f, iters=20)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="full", choices=["small", "full"])
    ap.add_argument("--only", default=None)
    ap.add_argument("--family-timeout", type=int, default=None,
                    help="per-family subprocess timeout, seconds "
                         "(default 1500, with larger caps for the "
                         "slow-compiling Pallas families; an EXPLICIT "
                         "value overrides those caps too — callers with "
                         "a tight outer budget need the inner caps to "
                         "respect it, or a hang eats the whole "
                         "orchestrator)")
    args = ap.parse_args()
    small = args.sizes == "small"

    # ordered by auto-selection value: a timeout or tunnel flap mid-run
    # should cost the least informative families first
    jobs = [
        ("cavity", bench_cavity, 256 if small else 1024),
        ("cavity_parts", bench_cavity_parts, 256 if small else 1024),
        ("ps23", bench_ps23, 256 if small else 2048),
        ("mg_vcycle", bench_mg_vcycle, 512 if small else 4096),
        ("mg_edges", bench_mg_edges, 512 if small else 4096),
        ("fft", bench_fft, 256 if small else 2048),
        ("dst", bench_dst, 256 if small else 1024),
        ("pallas_rhs", bench_pallas_rhs, 256 if small else 2048),
        ("euler", bench_euler, 1024 if small else 8192),
        ("mg_transfers", bench_mg_transfers, 512 if small else 4096),
    ]

    if args.only:
        # in-process: one family (the subprocess worker mode)
        dev = jax.devices()[0]
        print(f"# device: {dev}", file=sys.stderr)
        for name, fn, size in jobs:
            if args.only == name:
                fn(size)
        return

    # Each family runs in its OWN subprocess with a hard timeout: one
    # unsupported op poisons the whole TPU client (afterwards even iota
    # fails) and some failure modes HANG instead of erroring — in-process
    # sequencing loses every later family (round-2 microbench post-mortem).
    # Pallas-kernel families compile for minutes-per-program remotely and
    # hit the default timeout in round 2 (VERDICT weak #5) — larger caps.
    extra_time = {"pallas_rhs": 3000, "euler": 3000, "mg_vcycle": 2400}

    def family_timeout(name: str) -> int:
        if args.family_timeout is not None:
            return args.family_timeout    # explicit flag wins outright
        return max(1500, extra_time.get(name, 0))

    import subprocess
    for name, _, _ in jobs:
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--sizes", args.sizes, "--only", name],
                timeout=family_timeout(name),
                text=True, capture_output=True)
            sys.stdout.write(p.stdout)
            if p.returncode != 0:
                tail = (p.stderr or "").strip().splitlines()
                print(json.dumps({"bench": name, "error":
                                  (tail[-1] if tail else "?")[:300]}),
                      flush=True)
        except subprocess.TimeoutExpired as e:
            sys.stdout.write((e.stdout or b"").decode()
                             if isinstance(e.stdout, bytes)
                             else (e.stdout or ""))
            print(json.dumps({"bench": name,
                              "error": f"TIMEOUT {e.timeout:.0f}s"}),
                  flush=True)


if __name__ == "__main__":
    main()
