"""TPU cross-lowering pre-flight (runs on the CPU host).

jax.jit(f).trace(x).lower(lowering_platforms=("tpu",)) runs the full
StableHLO + Mosaic lowering pipeline without TPU hardware — it catches
kernel constructs Mosaic rejects (e.g. dot precision HIGH, caught this
way before ever reaching the chip) and measures the serialized program
size (the remote tunnel's compile requests fail at ~270 MB;
embedded-literal solver constants were the cause).

Runs in a SUBPROCESS without x64: cross-lowering under jax_enable_x64
(which the CPU suite forces) hits an infinite-recursion JAX bug in
weak-type conversion.
"""
import subprocess
import sys

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from cfd_julia_tpu.ops import pallas_kernels as pk

def lower(fn, *args):
    low = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
    return low.as_text()

n = 513
d = 1.0 / (n - 1)
u = jnp.zeros((n, n), jnp.float32)
f = jnp.zeros((n, n), jnp.float32)
uc = jnp.zeros((n // 2 + 1, n // 2 + 1), jnp.float32)
q = jnp.ones((3, 1024), jnp.float32)
cases = {
    "redblack": (lambda u, f: pk.redblack_sweeps_fused(
        u, f, d, d, 2, interpret=False), (u, f)),
    "resrestrict": (lambda u, f: pk.residual_restrict_fused(
        u, f, d, d, interpret=False), (u, f)),
    "smoothresrestrict": (lambda u, f: pk.smooth_residual_restrict_fused(
        u, f, d, d, 2, interpret=False), (u, f)),
    "prolsmooth": (lambda u, f, uc: pk.prolong_correct_smooth_fused(
        u, f, uc, d, d, 2, interpret=False), (u, f, uc)),
    "arakawa": (lambda a, b: pk.arakawa_rhs_fused(
        a, b, d, d, 100.0, interpret=False), (u[:-1, :-1], f[:-1, :-1])),
    "euler": (lambda q: pk.euler_rhs_fused(
        q, 1.4, d, "hllc", interpret=False), (q,)),
}
for name, (fn, args) in cases.items():
    txt = lower(fn, *args)
    assert "tpu_custom_call" in txt, name
    print(name, "OK")

# solver program size guard: no step may embed big literal constants
from cfd_julia_tpu.models import vortex
from cfd_julia_tpu.stepping import loop

cfg = vortex.VortexConfig(nx=512, ny=512, solver="ps23", dt=1e-3)
step = vortex.make_spectral_step_half_packed(cfg, jnp.float32)
h = jnp.zeros((2, 512, 257), jnp.float32)
mb = len(lower(lambda s: loop.run_steps(step, s, 10), h)) / 1e6
# embedded constants scale ~n^2: 3 MB here would be ~50 MB at 2048^2;
# the traced-consts form measures ~0.05 MB at 2048^2
assert mb < 3.0, f"ps23 step lowered text {mb:.1f} MB - embedded constants are back"
print(f"ps23_size OK ({mb:.2f} MB)")

# EVERY raced cavity variant triple must cross-lower (Mosaic accepts
# the program, incl. precision-HIGH dots) with a bounded program body —
# derived from bench.CAVITY_VARIANTS itself so a new/typo'd race entry
# fails HERE, not as an 840 s burned tunnel timeout on chip.
# fst_half_mxu legitimately embeds the fixed <=128^2 DFT factor
# literals (~5 MB of TEXT, flat in n — measured 4.94/4.99/5.09 MB at
# 256/512/1024); anything O(n^2) would blow past 8 MB already at 256.
import os, sys
sys.path.insert(0, os.getcwd())
import bench
from cfd_julia_tpu.models import cavity

from cfd_julia_tpu.models import cavity_fused

for poisson, prec, rhs in dict.fromkeys(bench.CAVITY_VARIANTS):
    if poisson.startswith("fused"):
        # interior-padded fused formulation routes through cavity_fused
        # (make_step_fn rejects it by design); same worker mapping as
        # bench.worker_cavity
        mmp = {"fused": "highest", "fused_bf16x3": "high",
               "fused_bf16x1": "default"}[poisson]
        ccfg = cavity.CavityConfig(nx=256, ny=256)
        fstep = cavity_fused.make_fused_step_fn(ccfg, mm_precision=mmp)
        fst0 = cavity_fused.init_state(ccfg, jnp.float32)
        cmb = len(lower(lambda s: loop.run_steps(fstep, s, 10),
                        fst0)) / 1e6
        assert cmb < 8.0, f"cavity {poisson} lowered text {cmb:.1f} MB"
        print(f"cavity_{poisson}:{prec}:{rhs} OK ({cmb:.2f} MB)")
        continue
    ccfg = cavity.CavityConfig(nx=256, ny=256, poisson=poisson,
                               fft_precision=prec, rhs_impl=rhs)
    cstep = cavity.make_step_fn(ccfg)
    w = jnp.zeros((257, 257), jnp.float32)
    cst = (w, jnp.zeros_like(w), jnp.zeros((), jnp.float32))
    cmb = len(lower(lambda s: loop.run_steps(cstep, s, 10), cst)) / 1e6
    assert cmb < 8.0, f"cavity {poisson} lowered text {cmb:.1f} MB"
    print(f"cavity_{poisson}:{prec}:{rhs} OK ({cmb:.2f} MB)")

# the bench's shared-compile window form (traced outer trip count over
# a static inner scan) must lower for TPU too — it wraps EVERY raced
# timing window (loop.run_steps_dynamic)
lower(lambda s, k: loop.run_steps_dynamic(cstep, s, k, 50),
      cst, jnp.asarray(2, jnp.int32))
print("dynamic_window OK")

# raced MG V-cycle forms, with the smoother the chip will pick (pallas
# at levels >= 512; the XLA-smoother forms are the ones that exceeded
# the remote-compile HTTP body limit on chip).  4096^2 forms measured
# 0.35-1.07 MB.
# KNOWN LIMIT of this preflight: Mosaic BlockSpec-rule violations can
# be size-dependent — a (1, W) output block cross-lowered fine here at
# 1024^2 but was rejected at the bench's 4096^2 (2026-08-18, want_rms
# ssq block).  Such failures are raised at HOST lowering inside the
# worker (fast fail, no tunnel time burned), so 1024 stays the right
# cost/coverage point; just don't read a pass here as a Mosaic-rule
# guarantee at every size.
from cfd_julia_tpu.poisson import multigrid

_orig_pick = multigrid._pick_smoother
multigrid._pick_smoother = lambda a, b, backend=None: _orig_pick(a, b, "tpu")
mn = 1024
mf = jnp.zeros((mn + 1, mn + 1), jnp.float32)
for v in dict.fromkeys(bench.MG_VARIANTS):
    transfers, fused, fmg = v[:3]
    smoother = v[3] if len(v) > 3 else "auto"
    cycle_dtype = v[4] if len(v) > 4 else "fp32"
    mcfg = multigrid.MGConfig(transfers=transfers, fused=fused,
                              fmg=(fmg == "fmg"), smoother=smoother,
                              cycle_dtype=cycle_dtype,
                              tol=1e-5, max_cycles=20)
    mmb = len(lower(lambda ff, uu: multigrid.solve(
        ff, uu, 1.0 / mn, 1.0 / mn, cfg=mcfg).u, mf, jnp.zeros_like(mf))
    ) / 1e6
    # budget 12 MB: the fused-fmg form re-instantiates the fused edge
    # kernels per sub-pyramid level and the double-buffered DMA control
    # flow lifted it 2.6 -> 10.1 MB (still orders below the ~270 MB
    # remote-compile body limit; anything O(n^2) would fail regardless)
    assert mmb < 12.0, f"mg {'_'.join(v)} lowered {mmb:.1f} MB"
    print(f"mg_{'_'.join(v)} OK ({mmb:.2f} MB)")
multigrid._pick_smoother = _orig_pick

# EVERY raced ps23 variant at the north-star size (derived from
# bench.PS_VARIANTS; the MXU-FFT forms embed the fixed <=128^2 DFT
# factor literals: 6.37 MB of text, flat in n)
for fft_impl, prec, pair in dict.fromkeys(bench.PS_VARIANTS):
    pcfg = vortex.VortexConfig(nx=2048, ny=2048, solver="ps23", dt=1e-3,
                               fft_impl=fft_impl, fft_precision=prec,
                               pair_impl=pair)
    pstep = vortex.make_spectral_step_half_packed(pcfg, jnp.float32)
    ph = jnp.zeros((2, 2048, 1025), jnp.float32)
    pmb = len(lower(lambda s: loop.run_steps(pstep, s, 10), ph)) / 1e6
    assert pmb < 10.0, f"ps23 {fft_impl},{prec},{pair} {pmb:.1f} MB"
    print(f"ps23_{fft_impl}:{prec}:{pair} OK ({pmb:.2f} MB)")
"""


def test_tpu_cross_lowering_preflight():
    import pathlib

    root = pathlib.Path(__file__).parent.parent
    if str(root) not in sys.path:
        sys.path.insert(0, str(root))
    import bench

    r = subprocess.run([sys.executable, "-c", _SCRIPT], text=True,
                       capture_output=True, timeout=1800, cwd=root)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    names = ["redblack", "resrestrict", "smoothresrestrict",
             "prolsmooth", "arakawa", "euler", "ps23_size",
             "dynamic_window"]
    # coverage is DERIVED from the race lists: adding a bench variant
    # without it cross-lowering fails here, never on the chip's clock
    names += [f"cavity_{p}:{pr}:{rh}"
              for p, pr, rh in dict.fromkeys(bench.CAVITY_VARIANTS)]
    names += [f"mg_{'_'.join(v)}" for v in dict.fromkeys(bench.MG_VARIANTS)]
    names += [f"ps23_{fi}:{pr}:{pa}"
              for fi, pr, pa in dict.fromkeys(bench.PS_VARIANTS)]
    for name in names:
        assert f"{name} OK" in r.stdout, (name, r.stdout)
