"""Analytic multi-chip scaling model — MODEL, not measurement.

This sandbox exposes ONE TPU chip, so the reference's headline story (the
overlapped one-sided exchange strong-scales past where bulk-sync flattens;
SURVEY.md §6) cannot be measured this round.  This tool produces the honest
substitute: it partitions a REAL mesh, computes each shard's exact face
counts (boundary vs interior) and exact halo byte volumes from the actual
comm lists, and combines them with

- the MEASURED single-chip sweep rate (ns/face, default from BASELINE.md),
- a parameterised ICI link bandwidth (default 45 GB/s/direction, v5e-class),

under the three schedule dataflows:

    bulk    : t_sweep(all faces) + t_comm          (serialized)
    early/
    overlap : t_sweep(boundary) + max(t_sweep(interior), t_comm)

Per-chip time is the max over shards (the benchmark barrier).  Prints a
strong-scaling table with predicted overlap efficiency.  All model inputs are
printed so the numbers can be re-derived.

    python -m cfd_proxy_tpu.tools.scaling_model --nx 96 --parts 2 4 8 16 64
"""

from __future__ import annotations

import argparse

import numpy as np

from cfd_proxy_tpu.mesh.generator import generate_mesh
from cfd_proxy_tpu.mesh.partition import partition_mesh, send_point_set


def model_partitioning(mesh, P, ns_per_face, ici_gbps, rows,
                       overlap_fixed_us=0.0, halo_bytes=4):
    """Per-shard times from the REAL phase schedule: wire volume is the
    PADDED per-phase buffer (nphases × s_max × rows × 4B for every phase a
    device actually sends to a peer), matching parallel/tlayout.py — the
    unpadded sendidx sum would be optimistic on imbalanced partitions."""
    from cfd_proxy_tpu.parallel.tlayout import build_tlayout
    from cfd_proxy_tpu.parallel.topology import build_halo_topology

    parts = partition_mesh(mesh, P)
    nface_total = sum(p.nface for p in parts)   # solver.run's denominator
    topo = build_halo_topology(parts, max(p.npoint for p in parts) + 1)
    lay = build_tlayout(parts, topo)
    t_bulk = t_over = 0.0
    eff_num = eff_den = 0.0
    for d, p in enumerate(parts):
        sp = send_point_set(p)
        is_send = np.zeros(p.npoint, bool)
        is_send[sp] = True
        bsel = is_send[p.faces[:, 0]] | is_send[p.faces[:, 1]]
        nfb = int(bsel.sum())
        nfi = p.nface - nfb
        nsend_phases = int((lay.dsts[d] != d).sum())
        comm_bytes = nsend_phases * lay.s_max * rows * halo_bytes
        ts_all = p.nface * ns_per_face * 1e-9
        ts_b = nfb * ns_per_face * 1e-9
        ts_i = nfi * ns_per_face * 1e-9
        tc = comm_bytes / (ici_gbps * 1e9)
        t_bulk = max(t_bulk, ts_all + tc)
        # overlap_fixed_us: the fused kernel's MEASURED per-step fixed cost
        # (readiness barrier + per-phase DMA machinery + recv scatter) —
        # ~70 us at P=1 on the round-3 kernel (BASELINE.md small-mesh row).
        # Without it the model overstates overlap wins on small shards.
        t_over = max(t_over,
                     ts_b + max(ts_i, tc) + overlap_fixed_us * 1e-6)
        eff_num += min(ts_i, tc)
        eff_den += tc
    eff = eff_num / eff_den if eff_den else None
    return nface_total, t_bulk, t_over, eff


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cfd_proxy_tpu.tools.scaling_model")
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--ny", type=int, default=0)
    ap.add_argument("--nz", type=int, default=0)
    ap.add_argument("--parts", type=int, nargs="+", default=[1, 2, 4, 8, 16, 64])
    ap.add_argument("--ns-per-face", type=float, default=0.12,
                    help="measured single-chip sweep rate (BASELINE.md; "
                         "round-3 compact f32 kernel = 0.12 ns/face at 2.8M "
                         "faces, reduced precision = 0.088 — round 1's 0.54 "
                         "was the stale default until round 3)")
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="modeled per-link ICI bandwidth, GB/s (v5e link "
                         "spec; cross-check with tools/icibench.py, whose "
                         "self-send DMA rate upper-bounds it)")
    ap.add_argument("--rows", type=int, default=24,
                    help="exchanged rows per point (24 = gg grads; 8 = flux)")
    ap.add_argument("--halo-bytes", type=int, default=4, choices=[2, 4],
                    help="wire bytes per exchanged value (4 = f32; 2 = the "
                         "--halo-dtype bfloat16 payload option)")
    ap.add_argument("--overlap-fixed-us", type=float, default=70.0,
                    help="fused overlap kernel's measured per-step fixed "
                         "cost (barrier + DMA machinery; BASELINE.md round-3"
                         " small-mesh row).  The EXPOSED cost shrinks with "
                         "shard size as it hides under the longer sweep — "
                         "paired P=1 datapoints: ~70 us at 390k faces, "
                         "~25 us at 2.8M (mbench row); 70 is the "
                         "conservative default")
    ap.add_argument("--diag-frac", type=float, default=0.2)
    args = ap.parse_args(argv)

    mesh = generate_mesh(args.nx, args.ny or args.nx, args.nz or args.nx,
                         jitter=0.05, diag_frac=args.diag_frac, seed=0)
    print(f"# MODEL (not measurement): {mesh.nface} global faces, "
          f"{args.ns_per_face} ns/face sweep (measured), "
          f"{args.ici_gbps} GB/s ICI (assumed; icibench upper-bounds it), "
          f"rows={args.rows}, overlap fixed {args.overlap_fixed_us} us "
          f"(measured); faces/sec uses sum-of-shard faces (solver.run)")
    print(f"{'P':>4} {'bulk Gf/s':>10} {'overlap Gf/s':>13} "
          f"{'speedup':>8} {'ovl_eff':>8}")
    base = None
    for P in args.parts:
        nface_total, t_bulk, t_over, eff = model_partitioning(
            mesh, P, args.ns_per_face, args.ici_gbps, args.rows,
            overlap_fixed_us=args.overlap_fixed_us,
            halo_bytes=args.halo_bytes)
        if base is None:
            base = t_over
        eff_s = f"{eff:>8.1%}" if eff is not None else f"{'-':>8}"
        print(f"{P:>4} {nface_total / t_bulk / 1e9:>10.2f} "
              f"{nface_total / t_over / 1e9:>13.2f} "
              f"{base / t_over:>8.2f} {eff_s}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
