#!/usr/bin/env python
"""Headline benchmark: faces/sec/chip on the Green-Gauss sweep.

Prints ONE JSON line:
  {"metric": "faces_per_sec_per_chip", "value": N, "unit": "faces/s",
   "vs_baseline": N, ...diagnostics...}

vs_baseline is measured against this machine's CPU golden path (NumPy
`compute_gradients_gg`, the C-semantics sequential loop) — the stand-in
denominator until real 2-socket node numbers exist (BASELINE.md).

Env knobs: BENCH_NX (grid edge, default 96 on TPU / 16 on CPU),
BENCH_ITERS (default 100), BENCH_SCHEDULE (default bulk),
BENCH_BACKEND (default pallas).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_cpu_golden(nx: int = 32) -> float:
    """Golden NumPy sweep faces/sec on this machine's CPU."""
    from cfd_proxy_tpu.mesh.generator import generate_mesh, make_state
    from cfd_proxy_tpu.ops.golden import compute_gradients_gg

    m = generate_mesh(nx, nx, nx, jitter=0.05, diag_frac=0.2, seed=0)
    var = make_state(m.npoint, 7, seed=1)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        compute_gradients_gg(var, m.faces, m.normals)
        times.append(time.perf_counter() - t0)
    fps = m.nface / min(times)
    log(f"cpu golden: {m.nface} faces, best {min(times) * 1e3:.1f} ms "
        f"-> {fps / 1e6:.2f} Mfaces/s")
    return fps


def main() -> int:
    import jax

    platform = jax.default_backend()
    on_tpu = platform == "tpu"
    nx = int(os.environ.get("BENCH_NX", "96" if on_tpu else "16"))
    iters = int(os.environ.get("BENCH_ITERS", "100"))
    schedule = os.environ.get("BENCH_SCHEDULE", "bulk")
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    log(f"platform={platform} devices={jax.devices()} nx={nx} iters={iters} "
        f"backend={backend}")

    cpu_fps = measure_cpu_golden(16 if not on_tpu else 32)

    from cfd_proxy_tpu.solver import SolverConfig, run

    cfg = SolverConfig(
        nx=nx, ny=nx, nz=nx, parts=1, nvar=7, iters=iters, warmup=3,
        schedule=schedule, backend=backend, dtype="float32", verify=False,
    )
    t0 = time.perf_counter()
    results, _stats = run(cfg)
    log(f"run wall {time.perf_counter() - t0:.1f}s")

    entry = results["schedules"][schedule]
    fps = entry["faces_per_sec"]
    out = {
        "metric": "faces_per_sec_per_chip",
        "value": float(fps),
        "unit": "faces/s",
        "vs_baseline": float(fps / cpu_fps),
        "platform": platform,
        "backend": backend,
        "nface": results["nface"],
        "schedule": schedule,
        "median_ms": entry["median_s"] * 1e3,
        "cpu_golden_faces_per_sec": float(cpu_fps),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
