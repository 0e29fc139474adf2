"""bench.py driver-artifact path: worker-mode subprocess contract, the
quick orchestration, and the cached-fallback emission (the round-2
failure mode was a 0.0 artifact erasing a measured battery)."""
import json
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


def _last_json_line(text: str):
    for line in reversed(text.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in: {text[-500:]}")


def test_worker_cavity_subprocess_contract():
    r = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--worker", "cavity",
         "--variant", "fst,highest,xla", "--nx", "32", "--steps", "3"],
        capture_output=True, text=True, timeout=300, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-800:]
    out = _last_json_line(r.stdout)
    assert out["worker"] == "cavity" and out["value"] > 0
    # no anchor exists for (32, 6): gate reports, does not reject
    assert out["physics"] == "no-anchor"


def test_timed_scan_repeats_keep_anchor_state_at_2x_steps():
    """Best-of-3 timing (round-5 contention defense) must not move the
    physics-gate point: the returned state is the state after exactly
    2*steps (warm window + FIRST timed window), because anchors are
    keyed at (family, nx, 2*steps); later windows only contribute
    timing."""
    import jax.numpy as jnp

    step = lambda s: s + 1.0
    sps, state = bench._timed_scan(step, jnp.zeros(()), steps=50,
                                   sync=lambda s: float(s), repeats=3)
    assert float(state) == 100.0          # 2 * steps applications
    assert sps > 0


def test_check_anchor_gate(monkeypatch, tmp_path):
    """Unit contract of the physics acceptance gate: within-tolerance
    metrics pass, out-of-tolerance raise, unknown keys are no-anchor."""
    p = tmp_path / "anchors.json"
    p.write_text(json.dumps({"cavity:64:40": {
        "psi_min": -1.0e-3, "psi_l2": 5.0e-4, "rel_tol": 0.01}}))
    monkeypatch.setattr(bench, "ANCHORS_JSON", str(p))
    ok = bench._check_anchor("cavity", 64, 40,
                             {"psi_min": -1.0005e-3, "psi_l2": 5.002e-4})
    assert ok == "ok"
    assert bench._check_anchor("cavity", 128, 40, {}) == "no-anchor"
    with pytest.raises(AssertionError, match="PHYSICS REJECT"):
        bench._check_anchor("cavity", 64, 40,
                            {"psi_min": -1.2e-3, "psi_l2": 5.002e-4})
    # NaN must reject, never pass
    with pytest.raises(AssertionError, match="PHYSICS REJECT"):
        bench._check_anchor("cavity", 64, 40,
                            {"psi_min": float("nan"), "psi_l2": 5e-4})


def test_worker_physics_gate_end_to_end(tmp_path, monkeypatch):
    """A corrupted variant CANNOT post a number: with a tampered anchor
    standing in for a wrong-physics variant, the worker subprocess dies
    with PHYSICS REJECT and race() records an error for it (VERDICT r3
    item 8).  With the committed anchor the same run passes."""
    # committed anchor: the true fp32 trajectory passes the gate
    ok = bench.worker_cavity("fst,highest,xla", 64, 20)
    assert ok[1]["physics"] == "ok"

    # tampered anchor (= a variant whose physics drifted 10%): reject
    tampered = dict(json.load(open(ROOT / "benchmarks" /
                                   "physics_anchors.json")))
    tampered["cavity:64:40"] = {
        **tampered["cavity:64:40"],
        "psi_min": tampered["cavity:64:40"]["psi_min"] * 1.10}
    p = tmp_path / "tampered.json"
    p.write_text(json.dumps(tampered))
    monkeypatch.setattr(bench, "ANCHORS_JSON", str(p))
    with pytest.raises(AssertionError, match="PHYSICS REJECT"):
        bench.worker_cavity("fst,highest,xla", 64, 20)

    # end-to-end through the race: the subprocess inherits the tampered
    # anchors via CFD_BENCH_ANCHORS and the variant is skipped
    monkeypatch.setenv("CFD_BENCH_ANCHORS", str(p))
    results = []
    best, name = bench.race("cavity", ["fst,highest,xla"], 64, steps=20,
                            variant_timeout_s=280.0, results=results)
    assert best is None and name is None
    assert len(results) == 1 and "PHYSICS REJECT" in results[0]["error"]


def test_worker_mg_subprocess_contract():
    r = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--worker", "mg",
         "--variant", "matmul,off,plain", "--nx", "64", "--tol", "1e-5"],
        capture_output=True, text=True, timeout=300, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-800:]
    out = _last_json_line(r.stdout)
    assert out["unit"] == "s" and out["value"] > 0 and out["cycles"] >= 1


def test_worker_mg_rejects_self_certifying_solver(monkeypatch):
    """worker_mg's independent residual recheck: a solver that lies
    about its own rms (returns the INITIAL guess with a tiny reported
    residual) must be rejected, because the worker re-derives the
    residual with plain stencil ops outside the solver's code path."""
    import types

    from cfd_julia_tpu.poisson import multigrid

    real_solve = multigrid.solve

    def lying_solve(f, u0, dx, dy, cfg=None):
        r = real_solve(f, u0, dx, dy, cfg=cfg)
        # claim convergence but hand back the unconverged initial guess
        return types.SimpleNamespace(u=u0, rms=r.rms0 * 1e-9, rms0=r.rms0,
                                     iterations=r.iterations)

    monkeypatch.setattr(multigrid, "solve", lying_solve)
    with pytest.raises(AssertionError, match="PHYSICS REJECT mg"):
        bench.worker_mg("matmul,off,plain", 64, 1e-5)


def test_cached_fallback_serves_tpu_battery(monkeypatch, tmp_path, capsys):
    p = tmp_path / "last.json"
    p.write_text(json.dumps({
        "measured_at_utc": "2026-08-16T19:53:00Z",
        "summary": {"cavity_steps_per_sec": 539.3, "cavity_impl": "fst",
                    "nx": 1024, "steps": 1000, "platform": "TPU v5 lite",
                    "ps23_2048_steps_per_sec": 113.0,
                    "mg_4096_solve_s": 0.21}}))
    monkeypatch.setattr(bench, "RESULTS_JSON", str(p))
    bench._emit_cached_or_error("tunnel down")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 539.3
    assert out["cached"] is True
    assert out["measured_at_utc"] == "2026-08-16T19:53:00Z"
    assert out["ps23_2048_steps_per_sec"] == 113.0
    assert out["mg_4096_solve_s"] == 0.21
    assert "capture_error" in out


def test_cached_fallback_rejects_cpu_and_missing(monkeypatch, tmp_path,
                                                 capsys):
    p = tmp_path / "last.json"
    # a CPU debug run at the headline size must never masquerade as chip
    p.write_text(json.dumps({"summary": {
        "cavity_steps_per_sec": 10.0, "nx": 1024, "platform": "cpu"}}))
    monkeypatch.setattr(bench, "RESULTS_JSON", str(p))
    bench._emit_cached_or_error("tunnel down")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0 and "error" in out
    # no file at all -> plain error emission
    monkeypatch.setattr(bench, "RESULTS_JSON", str(tmp_path / "nope.json"))
    bench._emit_cached_or_error("tunnel down")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0 and "error" in out


def test_save_results_preserves_secondaries(monkeypatch, tmp_path):
    """A qualifying partial/quick run must carry the previous battery's
    ps23/mg secondaries forward, and a non-qualifying run must land in
    the _debug side file without touching the battery record."""
    p = tmp_path / "last.json"
    p.write_text(json.dumps({
        "measured_at_utc": "2026-08-16T19:53:00Z",
        "summary": {"cavity_steps_per_sec": 539.3, "cavity_impl": "fst",
                    "nx": 1024, "steps": 1000, "platform": "axon",
                    "ps23_2048_steps_per_sec": 113.0,
                    "mg_4096_solve_s": 0.21}}))
    monkeypatch.setattr(bench, "RESULTS_JSON", str(p))
    # qualifying quick run without secondaries: merged forward
    bench._save_results({"summary": {
        "cavity_steps_per_sec": 600.0, "cavity_impl": "fst_half",
        "nx": 1024, "steps": 50, "platform": "axon", "quick": True}})
    saved = json.loads(p.read_text())
    assert saved["summary"]["cavity_steps_per_sec"] == 600.0
    assert saved["summary"]["ps23_2048_steps_per_sec"] == 113.0
    assert saved["summary"]["mg_4096_solve_s"] == 0.21
    assert saved["summary"]["secondaries_measured_at_utc"] == \
        "2026-08-16T19:53:00Z"
    # non-qualifying CPU run: side file only, record untouched
    bench._save_results({"summary": {
        "cavity_steps_per_sec": 9.0, "nx": 128, "platform": "cpu"}})
    assert json.loads(p.read_text())["summary"][
        "cavity_steps_per_sec"] == 600.0
    debug = json.loads((tmp_path / "last_debug.json").read_text())
    assert debug["summary"]["cavity_steps_per_sec"] == 9.0


def test_save_results_carries_each_secondary_family(monkeypatch, tmp_path):
    """The carry is per FAMILY: a run that measured ps23 but lost mg
    (the documented round-2 failure mode) keeps the previous battery's
    mg secondary instead of erasing it — and vice versa."""
    p = tmp_path / "last.json"
    p.write_text(json.dumps({
        "measured_at_utc": "2026-08-16T19:53:00Z",
        "summary": {"cavity_steps_per_sec": 539.3, "cavity_impl": "fst",
                    "nx": 1024, "steps": 1000, "platform": "axon",
                    "ps23_2048_steps_per_sec": 113.0,
                    "mg_4096_solve_s": 0.21}}))
    monkeypatch.setattr(bench, "RESULTS_JSON", str(p))
    bench._save_results({"summary": {
        "cavity_steps_per_sec": 610.0, "cavity_impl": "fst",
        "nx": 1024, "steps": 1000, "platform": "axon",
        "ps23_2048_steps_per_sec": 140.0, "ps23_impl": "xla"}})
    saved = json.loads(p.read_text())["summary"]
    assert saved["ps23_2048_steps_per_sec"] == 140.0   # fresh measurement
    assert saved["mg_4096_solve_s"] == 0.21            # carried forward
    assert saved["secondaries_measured_at_utc"] == "2026-08-16T19:53:00Z"
    # the reverse direction: mg measured, ps23 carried
    bench._save_results({"summary": {
        "cavity_steps_per_sec": 620.0, "cavity_impl": "fst",
        "nx": 1024, "steps": 1000, "platform": "axon",
        "mg_4096_solve_s": 0.18, "mg_impl": "matmul,off,plain"}})
    saved = json.loads(p.read_text())["summary"]
    assert saved["mg_4096_solve_s"] == 0.18
    assert saved["ps23_2048_steps_per_sec"] == 140.0


def test_race_no_success_guard_bounds_total_failure(monkeypatch):
    """A half-up tunnel (probe ok, every variant hangs to its timeout)
    must not chew through all variants' full timeouts: with zero
    successes the race stops at 2x budget so the orchestrator can fall
    back to the cached battery record."""
    clock = {"t": 0.0}
    calls = []

    def fake_spawn(worker, v, nx, steps, tol, timeout_s):
        calls.append(v)
        clock["t"] += 400.0
        return {"worker": worker, "variant": v, "error": "TIMEOUT 400s"}

    monkeypatch.setattr(bench, "_spawn_variant", fake_spawn)
    monkeypatch.setattr(bench.time, "perf_counter", lambda: clock["t"])
    best, name = bench.race("cavity", [f"v{i},highest,xla" for i in range(9)],
                            1024, steps=10, budget_s=500.0)
    assert best is None and name is None
    assert len(calls) == 3  # elapsed 0, 400, 800 spawn; 1200 > 2x500 stops


def test_race_post_success_budget(monkeypatch):
    """After one measured variant the budget drops to 1x: the best-so-far
    is emitted instead of racing every cold compile."""
    clock = {"t": 0.0}

    def fake_spawn(worker, v, nx, steps, tol, timeout_s):
        clock["t"] += 400.0
        return {"worker": worker, "variant": v, "value": 100.0,
                "unit": "steps/s"}

    monkeypatch.setattr(bench, "_spawn_variant", fake_spawn)
    monkeypatch.setattr(bench.time, "perf_counter", lambda: clock["t"])
    best, name = bench.race("cavity", [f"v{i},highest,xla" for i in range(9)],
                            1024, steps=10, budget_s=500.0)
    assert best == 100.0
    assert clock["t"] == 800.0  # two spawns, then 800 > 500 stops


def test_final_stdout_line_is_complete_battery_json(monkeypatch, tmp_path,
                                                    capsys):
    """Driver-artifact contract (VERDICT r4 item 1): the LAST stdout line
    of a full run must parse as JSON and carry the headline value, the
    ps23 and mg secondaries, and their vs_baselines — BENCH_r04.json had
    "parsed": null because stray output followed the early emit."""
    monkeypatch.setattr(bench, "RESULTS_JSON", str(tmp_path / "last.json"))
    monkeypatch.setattr(bench, "_probe_devices", lambda *a, **k: "axon")

    def fake_race(worker, variants, nx, steps=0, tol=0.0, budget_s=0.0,
                  variant_timeout_s=0.0, minimize=False, results=None):
        if results is not None and worker == "cavity":
            results.append({"worker": "cavity",
                            "variant": "fused_bf16x3,highest,xla",
                            "value": 1098.0, "unit": "steps/s"})
        if minimize:
            return 0.11, variants[0]
        return (1303.0, "matmul_bf16x1+pallasrhs") if worker == "cavity" \
            else (179.3, "matmul:high")

    monkeypatch.setattr(bench, "race", fake_race)

    def fake_coverage(summary, all_results, timeout_s, budget_s=0.0):
        summary["coverage_euler_hllc_pallas_8192"] = 9000.0

    monkeypatch.setattr(bench, "run_coverage", fake_coverage)
    assert bench.main([]) == 0
    last = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(last)       # the LAST line parses, full stop
    assert out["final"] is True
    assert out["metric"] == "cavity_1024_steps_per_sec"
    assert out["value"] == 1303.0 and out["vs_baseline"] == 130.3
    assert out["ps23_2048_steps_per_sec"] == 179.3
    assert out["ps23_vs_baseline"] == round(179.3 / 0.47, 1)
    assert out["mg_4096_solve_s"] == 0.11
    assert out["mg_vs_baseline"] == round(3.68 / 0.11, 1)
    # precision-tier tagging (ADVICE r4): the record's tier is explicit
    # and the shipped default's own number rides along
    assert out["precision_tier"].startswith("bf16-1pass")
    assert out["default_variant_steps_per_sec"] == 1098.0
    assert out["default_variant"] == "fused_bf16x3"
    # coverage rows ride the final line too
    assert out["coverage_euler_hllc_pallas_8192"] == 9000.0


def test_variant_names():
    assert bench._variant_name("cavity", "fst", "highest", "xla") == "fst"
    assert bench._variant_name(
        "cavity", "fst_half_mxu", "high", "pallas") == \
        "fst_half_mxu:high+pallasrhs"
    assert bench._variant_name("ps23", "xla", "highest", "pack") == "xla"
    assert bench._variant_name("ps23", "matmul", "high", "rowsfirst") == \
        "matmul:high+rowsfirst"


def test_max_variants_caps_every_family(monkeypatch, tmp_path, capsys):
    """--max-variants 1 (the battery's secure pass) races exactly one
    proven variant per family, so a short tunnel window records all
    three north-star metrics before the full race runs."""
    monkeypatch.setattr(bench, "RESULTS_JSON", str(tmp_path / "last.json"))
    monkeypatch.setattr(bench, "_probe_devices", lambda *a, **k: "axon")
    raced = {}

    def fake_race(worker, variants, nx, steps=0, tol=0.0, budget_s=0.0,
                  variant_timeout_s=0.0, minimize=False, results=None):
        raced[worker] = variants
        return (0.5, variants[0]) if minimize else (100.0, variants[0])

    monkeypatch.setattr(bench, "race", fake_race)
    assert bench.main(["--max-variants", "1"]) == 0
    # the secure pass runs each family's PROVEN on-chip winner (round-5
    # solo race, fused_race_20260819T041823.log)
    assert raced["cavity"] == ("fused_bf16x1,highest,xla",)
    assert raced["ps23"] == ("matmul,high,pack",)
    assert raced["mg"] == ("matmul,on,plain",)
    out = capsys.readouterr().out
    assert '"value": 100.0' in out
