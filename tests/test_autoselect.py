"""Auto-selection heuristics must agree with the recorded on-chip
measurements (benchmarks/results/winners.json) — the data-driven-selection
contract from PERF.md "Variant racing": `auto` defaults are set by the
latest measured battery, not guesswork.  When a new battery changes a
winner, update winners.json and the heuristic together."""
import json
import pathlib

from cfd_julia_tpu.models import cavity, vortex
from cfd_julia_tpu.poisson import multigrid

WINNERS = json.loads(
    (pathlib.Path(__file__).parent.parent / "benchmarks" / "results"
     / "winners.json").read_text())


def test_mg_transfers_auto_matches_measured_winner():
    want = WINNERS["mg_transfers"]["winner"]
    assert multigrid._transfers_choice("auto", backend="tpu") == want
    # the recorded numbers actually rank the winner first
    ms = WINNERS["mg_transfers"]["measured_ms_at_4096"]
    assert ms[f"restrict_{want}"] == min(
        v for k, v in ms.items() if k.startswith("restrict_"))
    assert ms[f"prolong_{want}"] == min(
        v for k, v in ms.items() if k.startswith("prolong_"))


def test_mg_smoother_auto_matches_measured_winner():
    rec = WINNERS["mg_smoother"]
    n = rec["min_level"]
    assert multigrid._pick_smoother(n, n, backend="tpu") == rec["winner"]
    assert multigrid._pick_smoother(n // 2, n // 2, backend="tpu") == "xla"
    assert multigrid._pick_smoother(4096, 4096, backend="cpu") == "xla"
    # the smoother record ranks the pallas V-cycle ahead of the cheb one
    ms = rec["measured_ms_at_4096"]
    assert ms["vcycle_matmul_pallas_off"] < ms["vcycle_matmul_cheb_off"]


def test_mg_fused_auto_follows_measured_winner(monkeypatch):
    """fused="auto" resolves ON for Pallas-smoother levels on TPU: the
    fused-edge V-cycle is the measured 4096^2 winner (winners.json
    mg_vcycle: 0.1195 s vs 0.1529 s unfused); small levels and other
    backends keep the XLA edges, and explicit on/off pass through."""
    ms = WINNERS["mg_vcycle"]["measured_s_solve_at_4096"]
    assert ms["matmul_on_plain"] == min(ms.values())
    monkeypatch.setattr(multigrid.jax, "default_backend", lambda: "tpu")
    cfg = multigrid.MGConfig(fused="auto")
    assert multigrid._use_fused(cfg, 4096, 4096, halo_rows=2)
    assert not multigrid._use_fused(cfg, 256, 256, halo_rows=2)
    assert not multigrid._use_fused(
        multigrid.MGConfig(fused="auto", smoother="cheb"),
        4096, 4096, halo_rows=2)
    assert not multigrid._use_fused(
        multigrid.MGConfig(fused="off"), 4096, 4096, halo_rows=2)
    assert multigrid._use_fused(
        multigrid.MGConfig(fused="on"), 4096, 4096, halo_rows=2)
    monkeypatch.setattr(multigrid.jax, "default_backend", lambda: "cpu")
    assert not multigrid._use_fused(cfg, 4096, 4096, halo_rows=2)


def test_explicit_transfers_still_selectable():
    for name in ("conv", "matmul", "reshape"):
        assert multigrid._transfers_choice(name, backend="tpu") == name


def test_cavity_auto_poisson_is_measured_winner():
    rec = WINNERS["cavity_poisson"]
    assert cavity.CavityConfig().poisson == "auto"
    assert cavity._poisson_choice("auto", backend="tpu") == rec["winner"]
    sps = rec["full_bench_steps_per_sec_at_1024"]
    assert sps[rec["winner"]] == max(sps.values())
    # solve() owns the packed-state fused path: its auto resolves to the
    # round-5 certified-tier winner (fused_bf16x3, the fastest variant
    # in the same bf16x3 trajectory class — bf16x1 rows are a different,
    # uncertified tier and not eligible for the auto default)
    assert cavity._poisson_choice(
        "auto", backend="tpu", allow_fused=True) == rec["solve_winner"]
    r5 = rec["round5_solo_race_steps_per_sec_at_1024"]
    certified = {k: v for k, v in r5.items() if "bf16x1" not in k}
    assert max(certified, key=certified.get) == rec["solve_winner"]
    # off-TPU and under a mesh the fallback is the rfft DST
    assert cavity._poisson_choice("auto", backend="cpu") == "fst"
    assert cavity._poisson_choice(
        "auto", backend="cpu", allow_fused=True) == "fst"
    assert cavity._poisson_choice(
        "auto", backend="tpu", single_device=False) == "fst"
    # explicit names pass through untouched
    assert cavity._poisson_choice("fst_mxu", backend="tpu") == "fst_mxu"


def test_cavity_auto_rhs_is_measured_winner():
    rec = WINNERS["cavity_poisson"]
    assert cavity.CavityConfig().rhs_impl == "auto"
    assert cavity._rhs_choice("auto", backend="tpu") == rec["rhs_winner"]
    with_rhs = rec["full_bench_steps_per_sec_at_1024_with_pallas_rhs"]
    without = rec["full_bench_steps_per_sec_at_1024"]
    assert with_rhs["matmul_bf16x3"] > without["matmul_bf16x3"]
    # pallas bakes re in and is single-device: traced re / mesh / other
    # backends fall back to the XLA RHS
    assert cavity._rhs_choice("auto", backend="cpu") == "xla"
    assert cavity._rhs_choice("auto", backend="tpu",
                              static_re=False) == "xla"
    assert cavity._rhs_choice("auto", backend="tpu",
                              single_device=False) == "xla"
    assert cavity._rhs_choice("xla", backend="tpu") == "xla"


def test_vortex_auto_resolves_to_measured_winners(monkeypatch):
    rec = WINNERS["ps23_step"]
    monkeypatch.setattr(vortex.jax, "default_backend", lambda: "tpu")
    ps = vortex._resolved(vortex.VortexConfig(solver="ps23"))
    assert (ps.fft_impl, ps.fft_precision, ps.pair_impl) == (
        rec["fft_winner"], rec["precision_winner"], rec["pair_winner"])
    sps = rec["full_bench_steps_per_sec_at_2048"]
    assert sps["matmul:high+pack"] == max(sps.values())
    # fdm keeps the fp32-exact XLA FFT (winner within the highest tier)
    fdm = vortex._resolved(vortex.VortexConfig(solver="fdm"))
    assert fdm.fft_impl == WINNERS["vortex_fft_impl"]["winner"] == "xla"
    assert fdm.fft_precision == "highest"
    assert fdm.rhs_impl == "pallas"  # measured 0.22 vs 0.42 ms at 2048^2
    # traced/batched re (ensemble) and mesh runs fall back to XLA forms
    nore = vortex._resolved(vortex.VortexConfig(solver="fdm"),
                            static_re=False)
    assert nore.rhs_impl == "xla"
    sharded = vortex._resolved(vortex.VortexConfig(solver="ps23"),
                               single_device=False)
    assert (sharded.fft_impl, sharded.rhs_impl) == ("xla", "xla")


def test_vortex_auto_off_tpu_is_xla(monkeypatch):
    monkeypatch.setattr(vortex.jax, "default_backend", lambda: "cpu")
    r = vortex._resolved(vortex.VortexConfig(solver="ps23"))
    assert (r.rhs_impl, r.fft_impl, r.fft_precision) == (
        "xla", "xla", "highest")
    # explicit selections pass through
    e = vortex._resolved(vortex.VortexConfig(
        solver="ps23", fft_impl="matmul", fft_precision="high",
        rhs_impl="xla"))
    assert (e.rhs_impl, e.fft_impl, e.fft_precision) == (
        "xla", "matmul", "high")


def test_vortex_fft_ms_record_ranks_xla_first_at_highest():
    ms = WINNERS["vortex_fft_impl"]["measured_ms_at_2048"]
    assert ms["fft2_xla"] == min(ms.values())


def test_euler_auto_rhs_is_measured_winner():
    from cfd_julia_tpu.models import euler1d

    rec = WINNERS["euler_rhs"]
    assert euler1d.EulerConfig().rhs_impl == "auto"
    assert euler1d._euler_rhs_choice("auto", backend="tpu") == \
        rec["winner"]
    sps = rec["solo_steps_per_sec_at_8192_hllc"]
    assert sps[rec["winner"]] == max(sps.values())
    assert euler1d._euler_rhs_choice("auto", backend="cpu") == "xla"
    assert euler1d._euler_rhs_choice("pallas", backend="cpu") == "pallas"
