"""Solver-mode attribution harness: time the fused per-step body with
components knocked out, on the real chip.

The solver-mode row (BASELINE.md) is the FULL per-time-step dataflow —
sweep + toy state update + var halo exchange + source-table rebuild — and
round 2 could not attribute its cost (per-stage splits were unreliable on
the tunneled chip).  This harness keeps the body FUSED in one jit and
disables one component per mode, so the two-point chained-loop timing
(solver.time_schedule's method) stays valid:

    noop        loop + toy update + var exchange only (the floor)
    extsonly    + the per-block ext-column tables (XLA general gather)
    tablesonly  + pack_srcs too — i.e. the full source-table rebuild
    sweeponly   sweep + update on STATIC tables (the proxy's own regime)
    all         the full solver-mode body

Round-3 verdicts (2.8M faces, packed, bp=4096 — BASELINE.md "Solver-mode
attribution"): floor 0.107 ms; exts 2.03; exts+pack 6.39; full 6.53.  The
step is REBUILD-bound; the sweep is noise.

    python -m cfd_proxy_tpu.tools.solver_attrib --mode all --kcompact on
"""

from __future__ import annotations

import argparse

import numpy as np

from cfd_proxy_tpu.utils.timing import two_point_sampler

MODES = ("noop", "extsonly", "tablesonly", "sweeponly", "all")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cfd_proxy_tpu.tools.solver_attrib")
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--mode", default="all", choices=MODES)
    ap.add_argument("--kcompact", default="on", choices=["on", "off"])
    ap.add_argument("--kernel", default="packed",
                    choices=["packed", "gather"])
    ap.add_argument("--bp", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from cfd_proxy_tpu.mesh.generator import generate_mesh, make_state
    from cfd_proxy_tpu.mesh.partition import partition_mesh
    from cfd_proxy_tpu.models import GreenGaussPallas
    from cfd_proxy_tpu.models.gradients_pallas import NV, _shard_map, _sq
    from cfd_proxy_tpu.ops.blocksweep import gather_exts

    kc = args.kcompact == "on"
    nx = args.nx
    m = generate_mesh(nx, nx, nx, jitter=0.05, diag_frac=0.2, seed=0)
    parts = partition_mesh(m, 1, ghost_layers=1)
    model = GreenGaussPallas(parts, 7, kcompact=kc, kernel=args.kernel,
                             bp=args.bp)
    state = model.distribute_state(make_state(m.npoint, 7, seed=1),
                                   schedules=["bulk"])
    step = model.step_fn("bulk")
    exch = model._var_exchange_fn()
    tables = model._build_tables_fn(("bulk",))
    pb = model._plans_dev["bulk"]

    def exts_only_body(v, plans):
        return gather_exts(v[0], _sq(plans)["ext_idx"])[None]

    exts_only = jax.jit(_shard_map(exts_only_body, model.mesh,
                                   in_specs=(P("shard"),) * 2,
                                   out_specs=P("shard")))
    e0 = state["tbl_bulk"]
    mode = args.mode

    def sweep(v, tb):
        g = step(v, tb, state["tbl_boundary"], state["tbl_interior"],
                 model._send_idx, model._send_mask, model._pack_scale,
                 model._dsts, model._srcs, pb,
                 model._plans_dev["boundary"], model._plans_dev["interior"])
        return v + 1e-30 * g[:, :NV, :]

    @jax.jit
    def run(n, v0):
        def body(_i, v):
            if mode == "all":
                v2 = sweep(v, tables(v, pb)[0])
            elif mode == "sweeponly":
                v2 = sweep(v, e0)
            elif mode == "tablesonly":
                tb = tables(v, pb)[0]
                v2 = v + jnp.broadcast_to(
                    jnp.sum(tb.astype(jnp.float32)) * 1e-60, v.shape)
            elif mode == "extsonly":
                e = exts_only(v, pb)
                v2 = v + jnp.broadcast_to(jnp.sum(e) * 1e-60, v.shape)
            else:  # noop
                v2 = v * (1.0 + 1e-30)
            return exch(v2, model._send_idx, model._send_mask)

        return jax.lax.fori_loop(0, n, body, v0)

    v0 = state["var_T"]
    n0 = max(1, args.iters // 10)

    def sync(n):
        return float(np.asarray(run(n, v0)[0, 0, 0]))

    sync(n0)
    sync(n0 + args.iters)
    sample = two_point_sampler(lambda: sync(n0),
                               lambda: sync(n0 + args.iters), args.iters)
    vals = []
    for _ in range(args.repeats):
        v = sample()
        if v is not None:
            vals.append(v)
    if vals:
        print(f"kcompact={kc} kernel={args.kernel} bp={model.bp} "
              f"mode={mode}: {float(np.median(vals)) * 1e3:.3f} ms/step "
              f"(n={len(vals)})")
        return 0
    print(f"mode={mode}: below the dispatch-noise floor")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
