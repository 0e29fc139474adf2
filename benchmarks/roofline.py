"""First-principles rooflines for the north-star problems on one
TPU v5e chip, compared against the recorded battery measurements
(benchmarks/results/bench_last.json).

    python benchmarks/roofline.py

Why (VERDICT round-2 #2): the cavity target moved to >= 1000 steps/s
when the denominator was measured honestly (BASELINE.md round-3 C
section); whether that is reachable is a hardware question, and this
script is the documented answer.  All inputs are static counts read
from the solver definitions (cited below) and public v5e specs — no
timing is performed, so it runs offline.

v5e per chip (public: cloud.google.com/tpu/docs/v5e):
  MXU   197 TFLOP/s bf16  (fp32-operand dots run as bf16 passes:
        precision HIGHEST = 6 passes, HIGH = 3 passes)
  HBM   819 GB/s, 16 GB
  VPU   ~ 4 TFLOP/s fp32 vector (the FFT/elementwise engine)

Work per cavity step at 1024^2 (models/cavity.py, 3 RK3 stages;
reference structure lid_driven_cavity.jl:58-118):
  matmul DST family: 12 dense (1023..1025)^3 matmuls  = 25.8 GFLOP
  elementwise: ~3 stages x (17-pt RHS + combine + bc + divide)
               ~ 45 array passes of 4 MB fp32             ~ 0.19 GB
Work per ps23 step at 2048^2 (models/vortex.py half-spectrum path):
  transforms: 15 half-spectrum-equivalent 2048^2 FFTs
              ~ 15 x 5 N^2 log2(N) / 2 flops              = 1.7 GFLOP
  elementwise: ~30 passes of (2,2048,1025) fp32           ~ 0.50 GB
Multigrid V-cycle at 4096^2 (poisson/multigrid.py, v1=v2=v3=2):
  dominated by the finest level: ~10 five-point passes
  (2 pre-smooth, residual, restrict read, 2 post-smooth, each
  reading/writing ~2-3 arrays) ~ 10 x 3 x 67 MB fp32      ~ 2.0 GB
  x 4/3 for the level pyramid                             ~ 2.7 GB
"""
from __future__ import annotations

import json
import os

HBM_GBPS = 819.0
MXU_BF16_TFLOPS = 197.0
VPU_FP32_TFLOPS = 4.0

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "bench_last.json")


def cavity_rows():
    n = 1023
    matmul_gflop = 12 * 2 * n**3 / 1e9            # 25.7
    elementwise_gb = 45 * 1025**2 * 4 / 1e9       # ~0.19 (4 B fp32)
    rows = []
    for name, passes in (("matmul (HIGHEST, 6-pass)", 6),
                         ("matmul_bf16x3 (HIGH, 3-pass)", 3)):
        t_mxu = matmul_gflop * passes / (MXU_BF16_TFLOPS * 1e3)
        t_hbm = elementwise_gb / HBM_GBPS
        rows.append((f"cavity 1024^2 {name}",
                     1.0 / (t_mxu + t_hbm),
                     f"{matmul_gflop:.1f} GFLOP x{passes} MXU + "
                     f"{elementwise_gb * 1e3:.0f} MB HBM"))
    # rfft path: transform flops are tiny but run on the VPU; the odd
    # extension doubles the lines to 2048-length real FFTs
    import math
    fft_gflop = 6 * 2 * (2.5 * 2048 * math.log2(2048) * 1023) / 1e9
    t_vpu = fft_gflop / (VPU_FP32_TFLOPS * 1e3)
    t_hbm = (elementwise_gb + 6 * 4 * 2 * 2048 * 1023 * 4 / 1e9) / HBM_GBPS
    rows.append(("cavity 1024^2 fst (VPU rfft DST)",
                 1.0 / (t_vpu + t_hbm),
                 f"{fft_gflop:.1f} GFLOP VPU + HBM"))
    return rows


def ps23_row():
    import math
    n = 2048
    fft_gflop = 15 * 5 * n * n * math.log2(n) / 2 / 1e9
    elementwise_gb = 30 * 2 * n * (n // 2 + 1) * 4 / 1e9
    t = fft_gflop / (VPU_FP32_TFLOPS * 1e3) + elementwise_gb / HBM_GBPS
    return ("ps23 2048^2 (VPU FFT path)", 1.0 / t,
            f"{fft_gflop:.1f} GFLOP VPU + {elementwise_gb:.2f} GB HBM")


def mg_row():
    gb_per_vcycle = 2.7
    t = gb_per_vcycle / HBM_GBPS
    return ("mg 4096^2 per V-cycle (HBM-bound)", 1.0 / t,
            f"{gb_per_vcycle} GB HBM => {t * 1e3:.1f} ms/cycle")


def measured():
    try:
        with open(RESULTS) as fh:
            rec = json.load(fh)
        return {f"{r['worker']}:{r['variant']}": r.get("value")
                for r in rec.get("results", []) if r.get("value")}
    except (OSError, json.JSONDecodeError):
        return {}


def main():
    meas = measured()
    print(f"{'problem / path':52s} {'ceiling':>12s}  basis")
    for name, ceil, basis in cavity_rows() + [ps23_row(), mg_row()]:
        unit = "cycles/s" if name.startswith("mg") else "steps/s"
        print(f"{name:52s} {ceil:9.0f} {unit:>8s}  {basis}")
    if meas:
        print("\nmeasured (bench_last.json):")
        for k, v in meas.items():
            print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
