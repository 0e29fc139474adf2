"""New-capability tests: ensemble vmap, periodic checkpointing, opt-in
heat time history."""
import jax.numpy as jnp
import numpy as np

from cfd_julia_tpu.models import ensemble, heat1d, vortex
from cfd_julia_tpu.stepping import loop
from cfd_julia_tpu.utils import checkpoint


def test_ensemble_re_sweep_matches_individual_runs():
    cfg = vortex.VortexConfig(nx=32, ny=32, solver="fdm", dt=0.01,
                              t_final=0.5, ic="tgv", tgv_n=2)
    res = ensemble.vortex_fdm_re_sweep(cfg, [10.0, 100.0])
    assert res.w.shape == (2, 32, 32)
    for k, re in enumerate((10.0, 100.0)):
        import dataclasses

        single = vortex.solve(dataclasses.replace(cfg, re=re))
        np.testing.assert_allclose(np.asarray(res.w[k]),
                                   np.asarray(single.w), rtol=1e-12,
                                   atol=1e-12)


def test_periodic_checkpointing(tmp_path):
    cfg = heat1d.HeatConfig(scheme="rk3")
    _, u0 = heat1d.initial_condition(cfg, jnp.float64)
    step = heat1d.make_step_fn(cfg, jnp.float64)
    path = str(tmp_path / "ck.npz")
    final = loop.run_steps_with_checkpoints(step, u0, 100, every=30,
                                            path=path)
    saved, s = checkpoint.load_state(path, u0)
    assert s == 100
    np.testing.assert_array_equal(np.asarray(saved), np.asarray(final))
    # matches an uninterrupted run exactly
    ref = loop.run_steps(step, u0, 100)
    np.testing.assert_array_equal(np.asarray(final), np.asarray(ref))


def test_heat_history_parity():
    """Opt-in full time history matches the reference's un[:, k] storage
    semantics: history[k] is the solution after k steps."""
    cfg = heat1d.HeatConfig(scheme="ftcs", nx=20, dt=0.005, t_final=0.05)
    res = heat1d.solve(cfg, keep_history=True)
    assert res.history.shape == (cfg.nt + 1, cfg.nx + 1)
    np.testing.assert_array_equal(np.asarray(res.history[-1]),
                                  np.asarray(res.u))
    # step 1 equals one manual application
    step = heat1d.make_step_fn(cfg, res.u.dtype)
    _, u0 = heat1d.initial_condition(cfg, res.u.dtype)
    np.testing.assert_allclose(np.asarray(res.history[1]),
                               np.asarray(step(u0)), rtol=1e-14)
