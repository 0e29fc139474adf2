"""Preset runner: solve + write the reference-compatible output files.

`run_preset(name, outdir)` is what `python -m cfd_julia_tpu run <preset>`
calls: it dispatches to the solver family, times the device-resident run,
and writes the reference's text outputs plus a structured metrics.json.
"""
from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from cfd_julia_tpu import presets as presets_lib
from cfd_julia_tpu.models import (burgers1d, cavity as cavity_model,
                                  euler1d, heat1d, poisson2d, vortex)
from cfd_julia_tpu.utils import io


def run_preset(name: str, outdir: str = ".", dtype=None,
               checkpoint_every: int = 0, resume: bool = False,
               **overrides):
    """Run a named preset; returns the metrics dict.

    checkpoint_every/resume: periodic on-disk checkpointing + restart
    (outdir/checkpoint.npz) for the long 2D families — crash recovery
    the reference lacks.  Currently: cavity."""
    preset = presets_lib.with_overrides(presets_lib.get(name), **overrides)
    os.makedirs(outdir, exist_ok=True)
    t0 = time.perf_counter()
    runner = _RUNNERS[preset.family]
    if checkpoint_every or resume:
        if preset.family not in ("cavity", "vortex"):
            raise ValueError(
                f"--checkpoint-every/--resume support the long 2D "
                f"families (cavity, vortex); {name} is {preset.family} "
                f"(use loop.run_steps_with_checkpoints for library-level "
                f"runs)")
        metrics = runner(preset, outdir, dtype,
                         checkpoint_every=checkpoint_every, resume=resume)
    else:
        metrics = runner(preset, outdir, dtype)
    metrics["wall_time_s"] = time.perf_counter() - t0
    metrics["preset"] = name
    metrics["reference"] = preset.reference
    io.write_metrics(os.path.join(outdir, "metrics.json"), metrics)
    return metrics


def _run_heat(preset, outdir, dtype):
    res = heat1d.solve(preset.cfg, dtype)
    io.write_error_report(os.path.join(outdir, "output.txt"),
                          res.l2_error, res.linf_error)
    io.write_field_csv(
        os.path.join(outdir, "field_final.csv"), "x ue un uerror",
        res.x, res.u_exact, res.u, res.u - res.u_exact,
    )
    return {"l2_error": float(res.l2_error),
            "linf_error": float(res.linf_error)}


def _run_burgers(preset, outdir, dtype):
    cfg = preset.cfg
    res = burgers1d.solve(cfg, dtype)
    tag = "d" if cfg.bc == "dirichlet" else "p"
    fname = f"solution_{tag}_{cfg.nx}.txt"
    # reference writes snapshots 1..ns (weno_dirichlet.jl:171-180)
    io.write_solution_history(os.path.join(outdir, fname),
                              res.x, res.snapshots[1:])
    u = np.asarray(res.u)
    return {"umax": float(np.abs(u).max()),
            "tv": float(np.abs(np.diff(u)).sum()),
            "output": fname}


def _run_euler(preset, outdir, dtype):
    cfg = preset.cfg
    res = euler1d.solve(cfg, dtype)
    # solution_{d,v,e}.txt: density / velocity / energy snapshot histories
    # (euler_roe.jl:187-205)
    rho = np.asarray(res.snapshots[:, 0])
    vel = np.asarray(res.snapshots[:, 1]) / rho
    en = np.asarray(res.snapshots[:, 2]) / rho
    for tag, arr in (("d", rho), ("v", vel), ("e", en)):
        io.write_solution_history(
            os.path.join(outdir, f"solution_{tag}.txt"), res.x, arr[1:]
        )
    rho_f, u_f, p_f, _ = euler1d.primitives_from_result(res, cfg.gamma)
    return {"rho_min": float(jnp.min(rho_f)), "p_min": float(jnp.min(p_f))}


def _run_poisson(preset, outdir, dtype):
    cfg = preset.cfg
    res = poisson2d.solve(cfg, dtype)
    m = {"l2_error": float(res.l2_error),
         "linf_error": float(res.linf_error)}
    if res.iterations is not None:
        # the reference's 'Maximum Norm' is max |RESIDUAL|
        # (gauss_seidel.jl:51 maximum(abs.(r))), not the solution error
        from cfd_julia_tpu.poisson import iterative as _it

        nxp, nyp = np.shape(res.u)
        mask = _it.interior_mask(nxp - 1, nyp - 1, res.u.dtype)
        r = np.abs(np.asarray(_it.residual_full(
            res.f, res.u, cfg.dx, cfg.dy, mask)))
        io.write_residual_report(
            os.path.join(outdir, "output.txt"), res.rms, r.max(),
            int(res.iterations),
        )
        io.write_residual_history(
            os.path.join(outdir, f"{cfg.solver}_residual.txt"), res.history
        )
        m["iterations"] = int(res.iterations)
        m["rms_final"] = float(res.rms)
    else:
        io.write_error_report(
            os.path.join(outdir, f"output_{cfg.nx}.txt"),
            res.l2_error, res.linf_error,
        )
    io.write_field2d(
        os.path.join(outdir, "field_final.txt"), res.x, res.y,
        np.asarray(res.f), np.asarray(res.u), np.asarray(res.u_exact),
    )
    return m


def _run_cavity(preset, outdir, dtype, checkpoint_every: int = 0,
                resume: bool = False):
    cfg = preset.cfg
    res = cavity_model.solve(
        cfg, dtype, checkpoint_every=checkpoint_every,
        checkpoint_path=(os.path.join(outdir, "checkpoint.npz")
                         if (checkpoint_every or resume) else None),
        resume=resume)
    rms = np.asarray(res.rms_history)
    with open(os.path.join(outdir, "res_plot.txt"), "w") as f:
        for n, v in enumerate(rms, start=1):
            f.write(f"{n} {float(v)!r}\n")
    io.write_field2d(os.path.join(outdir, "field_final.txt"),
                     res.x, res.y, np.asarray(res.w), np.asarray(res.s))
    u, v = cavity_model.centerline_velocities(res, cfg)
    if cfg.nx == cfg.ny:
        io.write_field_csv(os.path.join(outdir, "centerlines.txt"),
                           "y u_centerline x v_centerline",
                           res.y, u, res.x, v)
    else:  # rectangular grid: centerlines have different lengths
        io.write_field_csv(os.path.join(outdir, "centerline_u.txt"),
                           "y u_centerline", res.y, u)
        io.write_field_csv(os.path.join(outdir, "centerline_v.txt"),
                           "x v_centerline", res.x, v)
    return {"steady_rms": float(rms[-1]),
            "psi_min": float(np.asarray(res.s).min())}


def _run_vortex(preset, outdir, dtype, checkpoint_every: int = 0,
                resume: bool = False):
    cfg = preset.cfg
    res = vortex.solve(
        cfg, dtype, checkpoint_every=checkpoint_every,
        checkpoint_path=(os.path.join(outdir, "checkpoint.npz")
                         if (checkpoint_every or resume) else None),
        resume=resume)
    io.write_vortex_snapshots(outdir, res.x, res.y, res.snapshots)
    m = {"wmax_final": float(np.abs(np.asarray(res.w)).max())}
    if cfg.ic == "tgv":
        l2, linf = vortex.tgv_error(cfg, res)
        io.write_error_report(os.path.join(outdir, "output.txt"), l2, linf)
        m["l2_error"] = float(l2)
        m["linf_error"] = float(linf)
    return m


_RUNNERS = {
    "heat": _run_heat,
    "burgers": _run_burgers,
    "euler": _run_euler,
    "poisson": _run_poisson,
    "cavity": _run_cavity,
    "vortex": _run_vortex,
}
