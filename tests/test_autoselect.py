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


def test_mg_fused_auto_off_until_measured():
    """fused="auto" must resolve OFF: the only measured 4096^2 V-cycle win
    is the unfused matmul form; no fused combo has an on-chip number."""
    cfg = multigrid.MGConfig(fused="auto")
    assert not multigrid._use_fused(cfg, 4096, 4096, halo_rows=2)
    assert multigrid._use_fused(
        multigrid.MGConfig(fused="on"), 4096, 4096, halo_rows=2)


def test_explicit_transfers_still_selectable():
    for name in ("conv", "matmul", "reshape"):
        assert multigrid._transfers_choice(name, backend="tpu") == name


def test_cavity_default_poisson_is_measured_winner():
    assert cavity.CavityConfig().poisson == WINNERS["cavity_poisson"]["winner"]
    sps = WINNERS["cavity_poisson"]["full_bench_steps_per_sec_at_1024"]
    assert sps[cavity.CavityConfig().poisson] == max(sps.values())


def test_vortex_default_fft_is_measured_winner():
    assert vortex.VortexConfig().fft_impl == \
        WINNERS["vortex_fft_impl"]["winner"]
    ms = WINNERS["vortex_fft_impl"]["measured_ms_at_2048"]
    assert ms["fft2_xla"] == min(ms.values())
