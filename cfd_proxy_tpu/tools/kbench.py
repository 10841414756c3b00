"""Kernel-formulation microbench: where do the packed sweep's cycles go?

Times variants of the packed block sweep on the benchmark mesh to attribute
the gap to the streaming memory floor (BASELINE.md):

    prod     the production packed kernel (ops/blocksweep.py), bp from --bp
    stream   same streams, minimal math (sum of sources) — the achievable
             memory floor for this data layout
    wsum     production math with the own-side term hoisted out of the slot
             loop (25% fewer VPU ops; splits the own term per class so it is
             NOT schedule-composition-exact — measurement only)

Timing uses the two-point chained-loop method (solver.time_schedule): the
axon tunnel's block_until_ready does not wait and dispatch costs ~30 ms.

Usage:  python -m cfd_proxy_tpu.tools.kbench --nx 96 --variants prod,stream
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cfd_proxy_tpu.tools.kbench")
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--bp", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--variants", default="prod,stream,wsum")
    ap.add_argument("--check", action="store_true",
                    help="validate the prod kernel's output against the f64 "
                         "golden via an on-device abs-sum fingerprint")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cfd_proxy_tpu.mesh.generator import generate_mesh, make_state
    from cfd_proxy_tpu.ops.blocksweep import (
        LANE, NV, build_block_plan, gather_srcs, slot_src_cols, sweep_blocks,
    )

    interpret = jax.default_backend() != "tpu"
    bp = args.bp
    m = generate_mesh(args.nx, args.nx, args.nx, jitter=0.05, diag_frac=0.2,
                      seed=0)
    npoint_dev = ((m.npoint + bp - 1) // bp) * bp + bp  # + trash block
    inv = np.zeros(npoint_dev)
    inv[: m.npoint] = 1.0 / m.volume
    plan = build_block_plan(m.faces.astype(np.int32), m.normals, npoint_dev,
                            inv, bp=bp, all_blocks=True)
    print(f"nface={m.nface} npoint={m.npoint} bp={bp} nblocks={plan.nblocks} "
          f"K={plan.kslots} ep={plan.ep}")

    var = make_state(m.npoint, 7, seed=1, dtype=np.float32)
    var_T = np.zeros((NV, npoint_dev), np.float32)
    var_T[:7, : m.npoint] = var.T
    var_T = jnp.asarray(var_T)
    pa = {
        "block_ids": jnp.asarray(plan.block_ids),
        "slot_w": jnp.asarray(plan.slot_w),
        "scale": jnp.asarray(plan.scale),
    }
    pa["srcs"] = jax.jit(gather_srcs)(var_T, jnp.asarray(slot_src_cols(plan)))
    rows = 3 * NV
    K = plan.kslots
    nb = plan.nblocks

    def bid(i, bids):
        return bids[i]

    in_specs = [
        pl.BlockSpec((NV, bp), lambda i, bids: (0, bid(i, bids)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, NV, bp), lambda i, bids: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, 3, bp), lambda i, bids: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((rows, bp), lambda i, bids: (0, bid(i, bids)),
                            memory_space=pltpu.VMEM)

    def call(kernel):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,), in_specs=in_specs,
            out_specs=out_spec)
        def fn(v, pa):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((rows, npoint_dev), jnp.float32),
                interpret=interpret,
            )(pa["block_ids"], v, pa["srcs"], pa["slot_w"], pa["scale"])
        return fn

    def stream_kernel(bids, own_ref, src_ref, sw_ref, scale_ref, out_ref):
        s1 = own_ref[:]
        s2 = jnp.zeros((3, bp), jnp.float32)
        for k in range(K):
            s1 = s1 + src_ref[0, k]
            s2 = s2 + sw_ref[0, k]
        out_ref[:] = (s2[:, None, :] * s1[None, :, :]).reshape(rows, bp) \
            * scale_ref[0, 0][None, :]

    def wsum_kernel(bids, own_ref, src_ref, sw_ref, scale_ref, out_ref):
        own = own_ref[:]
        acc = jnp.zeros((rows, bp), jnp.float32)
        wsum = jnp.zeros((3, bp), jnp.float32)
        for k in range(K):
            wk = sw_ref[0, k]
            wsum = wsum + wk
            acc = acc + (wk[:, None, :] * src_ref[0, k][None, :, :]
                         ).reshape(rows, bp)
        acc = acc + (wsum[:, None, :] * own[None, :, :]).reshape(rows, bp)
        out_ref[:] = (0.5 * acc) * scale_ref[0, 0][None, :]

    def prod_fn(v, pa):
        return sweep_blocks(v, pa, bp=bp, ep=plan.ep, kslots=K, nblocks=nb,
                            interpret=interpret, packed=True)

    variants = {
        "prod": prod_fn,
        "stream": call(stream_kernel),
        "wsum": call(wsum_kernel),
    }

    def timed(fn):
        @jax.jit
        def run(n, v, pa):
            def body(_i, vv):
                g = fn(vv, pa)
                return vv + 1e-30 * g[:NV]
            return jax.lax.fori_loop(0, n, body, v)

        def sync(n):
            return float(np.asarray(run(n, var_T, pa)[0, 0]))

        n0 = max(1, args.iters // 10)
        sync(n0)
        sync(n0 + args.iters)  # compiles
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); sync(n0 + args.iters)
            tb = time.perf_counter() - t0
            t0 = time.perf_counter(); sync(n0)
            ts = time.perf_counter() - t0
            if tb - ts > 0.05 * tb:
                best = min(best, (tb - ts) / args.iters)
        return best

    rc = 0
    if args.check:
        from cfd_proxy_tpu.ops.golden import (
            compute_gradients_gg, scale_gradients,
        )

        g = jax.jit(lambda v, pa: prod_fn(v, pa))(var_T, pa)
        got = float(np.asarray(jnp.abs(g).sum()))   # one scalar off-device
        ref = scale_gradients(
            compute_gradients_gg(var.astype(np.float64), m.faces, m.normals),
            m.volume, m.npoint)
        want = float(np.abs(ref).sum())
        rel = abs(got - want) / max(1.0, want)
        ok = rel < 1e-3   # f32-accumulated abs-sum over ~20M values
        print(f"check: |g|sum device {got:.6e} vs golden {want:.6e} "
              f"rel {rel:.2e} -> {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            rc = 1

    for name in args.variants.split(","):
        t = timed(variants[name])
        if not np.isfinite(t):
            print(f"{name:8s} below dispatch-noise floor — rerun with a "
                  f"larger --iters/--nx", flush=True)
            continue
        print(f"{name:8s} {t * 1e3:8.3f} ms  {m.nface / t / 1e9:6.2f} Gf/s",
              flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
