"""TPU smoke tier runner with per-test subprocess isolation.

    python benchmarks/run_tpu_smoke.py [--timeout 600] [--only PATTERN]

Why not plain `pytest tests/test_tpu_smoke.py`: the first UNIMPLEMENTED
op on the remote-TPU backend poisons the process's TPU client — every
subsequent op (even a bare iota) fails with the same error — so one
broken kernel cascades across all later tests sharing the process
(round-2 run tpu_smoke_20260816T211618.log: 5 of 11 "failures" were one
failure plus four poisoned-client echoes).  Each test here gets its own
interpreter, so every failure is its OWN failure; the persistent compile
cache (~/.cache/jax_tpu_smoke_cache) keeps the per-process compile cost
to the first run.

Exit code: number of failed tests (0 = all green).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEST_FILE = os.path.join("tests", "test_tpu_smoke.py")


def collect_tests() -> list[str]:
    """Collect test ids without touching the TPU backend (collection only
    imports modules; the device fixture runs at test time)."""
    env = dict(os.environ, CFD_TPU_SMOKE="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", TEST_FILE, "--collect-only", "-q"],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=300)
    ids = [ln.strip() for ln in r.stdout.splitlines()
           if "::" in ln and not ln.startswith(" ")]
    if not ids:
        print(r.stdout + r.stderr, file=sys.stderr)
        raise SystemExit("test collection failed")
    return ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-test timeout, seconds (remote compiles run "
                         "minutes cold; cached re-runs are fast)")
    ap.add_argument("--only", default=None,
                    help="substring filter on test ids")
    args = ap.parse_args()

    ids = collect_tests()
    if args.only:
        ids = [t for t in ids if args.only in t]
    env = dict(os.environ, CFD_TPU_SMOKE="1")
    failures = 0
    t_all = time.perf_counter()
    for tid in ids:
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", tid, "-q", "-x",
                 "--no-header"],
                capture_output=True, text=True, cwd=ROOT, env=env,
                timeout=args.timeout)
            ok = r.returncode == 0
            detail = ""
            if not ok:
                lines = [ln for ln in (r.stdout or "").splitlines()
                         if ln.strip()]
                detail = (lines[-1] if lines else
                          (r.stderr or "").strip()[-200:])
        except subprocess.TimeoutExpired:
            ok, detail = False, f"TIMEOUT {args.timeout}s"
        dt = time.perf_counter() - t0
        failures += not ok
        print(json.dumps({"test": tid.split("::")[-1],
                          "ok": ok, "s": round(dt, 1),
                          **({"detail": detail[-300:]} if detail else {})}),
              flush=True)
    total = time.perf_counter() - t_all
    print(json.dumps({"summary": f"{len(ids) - failures}/{len(ids)} passed",
                      "s": round(total, 1)}), flush=True)
    return failures


if __name__ == "__main__":
    sys.exit(main())
