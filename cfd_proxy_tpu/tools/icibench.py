"""RDMA transport bandwidth microbench — MEASURES the bytes/s the fused
overlap kernel's `make_async_remote_copy` path actually achieves.

Round 2 left the scaling model's ICI bandwidth an assumption (45 GB/s,
`scaling_model.py`) even though the P=1 self-send phase moves real bytes
through the real DMA hardware (VERDICT r2 item 2).  This tool times a
minimal Pallas kernel that fires N self-send phases of (rows, S)-float32
buffers (the exact transport the overlap schedule uses:
ops/blocksweep.py::sweep_blocks_overlap — same semaphore barrier, same
LOGICAL device addressing) and reports achieved GB/s per payload size.

HONESTY NOTE: on one chip every push is a SELF-send, i.e. an HBM→HBM copy
through the RDMA engine.  The measured rate is therefore an UPPER bound for
real inter-chip ICI (each v5e link adds its ~45 GB/s/direction wire cap) and
a calibration of the per-phase DMA overhead (the small-payload knee).  Use
    min(measured_self_send, link_spec)
as the scaling model's --ici-gbps; the tool prints that suggestion.

    python -m cfd_proxy_tpu.tools.icibench --phases 1 2 4 --mb 0.1 1 8 32
"""

from __future__ import annotations

import argparse

import numpy as np

from cfd_proxy_tpu.utils.timing import two_point_sampler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cfd_proxy_tpu.tools.icibench")
    ap.add_argument("--phases", type=int, nargs="+", default=[1, 2, 4],
                    help="RDMA phases fired per kernel (self-sends at P=1)")
    ap.add_argument("--mb", type=float, nargs="+",
                    default=[0.125, 1.0, 8.0, 32.0],
                    help="payload megabytes PER PHASE")
    ap.add_argument("--rows", type=int, default=24,
                    help="buffer rows (24 = gg gradient payload)")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--link-gbps", type=float, default=45.0,
                    help="per-link wire spec used for the suggestion line")
    ap.add_argument("--mode", default="full",
                    choices=["full", "nobar", "baronly", "empty"],
                    help="fixed-cost DECOMPOSITION of the small-payload "
                         "knee (VERDICT r3 item 7): full = barrier + DMA + "
                         "waits (production); nobar = DMA without the "
                         "readiness barrier (drops collective_id — safe "
                         "only for self-sends, which is all this tool "
                         "fires); baronly = barrier, no DMA; empty = "
                         "neither (the bare chained pallas-dispatch floor)."
                         "  Differences between modes at one payload size "
                         "attribute the ~50-170us fixed cost")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as _np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh, PartitionSpec as P

    from cfd_proxy_tpu.models.gradients_pallas import _shard_map

    interpret = jax.default_backend() != "tpu"
    mesh1 = Mesh(_np.array(jax.devices()[:1]), ("shard",))
    if interpret:
        print("# WARNING: no TPU — interpret mode measures nothing real")

    mode = args.mode
    do_bar = mode in ("full", "baronly")
    do_dma = mode in ("full", "nobar")

    def build(nph: int, s_lanes: int):
        def kernel(dsts_ref, srcs_ref, send_ref, recv_ref, send_sems,
                   recv_sems):
            def rdma(k):
                return pltpu.make_async_remote_copy(
                    src_ref=send_ref.at[k],
                    dst_ref=recv_ref.at[k],
                    send_sem=send_sems.at[k],
                    recv_sem=recv_sems.at[k],
                    device_id=dsts_ref[k],
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )

            # same readiness barrier as the production overlap kernel
            if do_bar and not interpret:
                barrier = pltpu.get_barrier_semaphore()
                for k in range(nph):
                    pltpu.semaphore_signal(
                        barrier, inc=1, device_id=srcs_ref[k],
                        device_id_type=pltpu.DeviceIdType.LOGICAL)
                pltpu.semaphore_wait(barrier, nph)
            if do_dma:
                for k in range(nph):
                    rdma(k).start()
                for k in range(nph):
                    rdma(k).wait_send()
                    rdma(k).wait_recv()
            elif not interpret:
                # keep the output defined without the DMA: one local async
                # copy of phase 0 (the minimal side effect — 'empty' and
                # 'baronly' still move ONE buffer so XLA cannot elide the
                # kernel from the chained loop)
                cp = pltpu.make_async_copy(send_ref.at[0], recv_ref.at[0],
                                           send_sems.at[0])
                cp.start()
                cp.wait()
            else:
                recv_ref[...] = send_ref[...]

        shape = (nph, args.rows, s_lanes)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((nph,)),
                pltpu.SemaphoreType.DMA((nph,)),
            ],
        )
        ids = jnp.zeros(nph, jnp.int32)        # self-sends on device 0
        # collective_id is only valid WITH the custom barrier (Mosaic
        # rejects it otherwise — hardware-verified, blocksweep.py)
        cparams = (pltpu.CompilerParams(has_side_effects=True,
                                        collective_id=7) if do_bar
                   else pltpu.CompilerParams(has_side_effects=True))

        def push_body(v):
            # RDMA primitives require shard_map context (Mosaic rejects
            # communication outside it) — 1-device mesh, like the model's
            # P=1 path
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                compiler_params=cparams,
                interpret=interpret,
            )(ids, ids, v[0])[None]

        push = _shard_map(push_body, mesh1, in_specs=(P("shard"),),
                          out_specs=P("shard"))

        @jax.jit
        def run(n, v):
            def body(_i, vv):
                r = push(vv)
                return vv + 1e-30 * r      # data dependence chains the loop

            return jax.lax.fori_loop(0, n, body, v)

        v0 = jnp.ones((1, *shape), jnp.float32)   # leading shard axis

        def sync(n):
            return float(np.asarray(run(n, v0)[0, 0, 0, 0]))

        n0 = max(1, args.iters // 10)
        sync(n0)
        sync(n0 + args.iters)              # compile both lengths
        inner = two_point_sampler(lambda: sync(n0),
                                  lambda: sync(n0 + args.iters), args.iters)

        def sample():
            v = inner()
            return float("nan") if v is None else v

        return sample

    best_gbps = 0.0
    print(f"# mode={mode} (barrier={'on' if do_bar else 'off'}, "
          f"dma={'on' if do_dma else 'off'})")
    print(f"{'phases':>6} {'MB/phase':>9} {'ms/iter':>9} {'GB/s payload':>13} "
          f"{'GB/s HBM r+w':>13}")
    for nph in args.phases:
        for mb in args.mb:
            lanes = max(128, int(round(mb * 1e6 / (args.rows * 4) / 128)) * 128)
            payload = nph * args.rows * lanes * 4
            s = build(nph, lanes)
            for _ in range(2):
                s()      # settling burns: the first post-compile dispatches
                         # run slow (remote executable caching) and with only
                         # 5 samples the median sits next to a biased one
            vals = [s() for _ in range(5)]
            vals = [v for v in vals if np.isfinite(v)]
            if not vals:
                print(f"{nph:>6} {mb:>9.3f}   below dispatch-noise floor")
                continue
            t = float(np.median(vals))
            gbps = payload / t / 1e9
            best_gbps = max(best_gbps, gbps)
            print(f"{nph:>6} {payload / nph / 1e6:>9.3f} {t * 1e3:>9.3f} "
                  f"{gbps:>13.1f} {2 * gbps:>13.1f}")
    if best_gbps:
        sug = min(best_gbps, args.link_gbps)
        print(f"# peak self-send payload rate {best_gbps:.1f} GB/s; suggested "
              f"scaling_model --ici-gbps {sug:.1f} "
              f"(= min(measured, {args.link_gbps} GB/s link spec))")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
