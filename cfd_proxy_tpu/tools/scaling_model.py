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

# MEASURED single-chip sweep rates vs footprint (ns/face; f32 compact packed
# kernel, bulk model path, auto bp — BASELINE.md size table + small-shard
# anchors, 2026-08-18).  The rate is NON-CONSTANT in shard size: a fixed
# ~1-2 us dispatch/pipeline floor dominates tiny shards, the ~100k-400k-face
# window rides burst HBM rates, and >=13M faces sits on the sustained-HBM
# plateau.  A strong-scaled shard behaves like a small mesh, so a constant
# 2.8M-face rate UNDERSTATES scaled-out sweep speed ~2.5x — this table is
# what makes the model's strong-scaling predictions honest.
RATE_TABLES = {
    "f32": [
        (42_179, 0.0748),      # nx=24 shard-size anchor, 12000-iter median
        (101_177, 0.0527),     # nx=32 anchor, 8000-iter median
        (390_934, 0.0559),     # nx=50 BENCH small row (21.8 us bulk)
        (2_798_223, 0.1386),   # nx=96 headline (0.388 ms)
        (13_000_000, 0.2410),  # size table 13.0M row (3.133 ms)
        (35_800_000, 0.2397),  # 35.8M row (8.581 ms)
        (44_000_000, 0.2422),  # 44.0M capacity row (10.655 ms)
    ],
    # reduced precision = --src-dtype/--meta-dtype bfloat16 (size table rows)
    "reduced": [
        (2_798_223, 0.0940),   # 0.263 ms
        (13_000_000, 0.1850),  # 2.405 ms
        (53_500_000, 0.1856),  # 9.93 ms capacity row
    ],
}


def rate_ns_per_face(nface: int, table) -> float:
    """Log-size linear interpolation over a measured (nface, ns/face) table,
    clamped to the end rates outside the measured range."""
    pts = sorted(table)
    x = np.log([p[0] for p in pts])
    y = [p[1] for p in pts]
    return float(np.interp(np.log(max(nface, 1)), x, y))


# Hardware parameterization for the north-star target (BASELINE.json: a
# v5p-8 slice).  The f32 compact kernel is MEASURED dead even with its own
# memory floor on this v5e (paired prod/stream 1.006, BASELINE.md floor
# triple), so at plateau-sized shards (>= ~2.8M faces) its ns/face transfers
# across HBM generations by the bandwidth ratio to first order — that is the
# ONLY regime scale_rate_table should be trusted in (the small-shard anchors
# are dispatch-floor-dominated and do NOT scale with HBM).  ICI: v5e spec
# 1600 Gbps/chip over 4 links ≈ 50 GB/s/link (modeled 45, bracketed from
# above by icibench's 371-648 GB/s self-send DMA); v5p spec 4800 Gbps/chip
# over 6 links ≈ 100 GB/s/link, modeled 90 with the same ~10% discount.
V5E_HBM_GBPS = 819.0
V5P_HBM_GBPS = 2765.0
V5E_ICI_GBPS = 45.0
V5P_ICI_GBPS = 90.0


def scale_rate_table(table, factor: float):
    """Scale a measured (nface, ns/face) table's rates by `factor` (e.g.
    V5E_HBM_GBPS / V5P_HBM_GBPS to project the memory-bound f32 kernel onto
    v5p HBM).  Valid only where the kernel is at its memory floor — plateau
    shard sizes; see the note above."""
    return [(n, r * factor) for n, r in table]


def shard_geometry(mesh, P, slice_size=None) -> dict:
    """Partition once and extract the per-shard GEOMETRIC model inputs:
    (nface, boundary faces, ICI send phases, DCN send phases) per shard plus
    the padded phase buffer width.  The expensive step (RCB partition + halo
    layout) is thus shared across hardware parameterizations — bench.py
    evaluates the same geometry under v5e and v5p parameters.

    Wire volume downstream is the PADDED per-phase buffer (s_max × rows ×
    halo_bytes for every phase a device actually sends to a peer), matching
    parallel/tlayout.py — the unpadded sendidx sum would be optimistic on
    imbalanced partitions.  tlayout's segmented lanes make that width
    slightly WIDER (tail pads ride the wire, measured inflation ~1.11 at
    P=8, gated at 1.25 by seg_slack) but make the PACK nearly free: the
    per-shard `pack_cols` entry counts only the columns the pack still
    GATHERS (segmented phases' small-group tail + any legacy prefix-packed
    phase's full s_max); slice segments measured ~0 (paired 1.675 over the
    windowed gather at P8-shaped payloads, chain 28 → 5.1 µs, round 4)."""
    from cfd_proxy_tpu.mesh.partition import relabel_owned, rcb_owned_order
    from cfd_proxy_tpu.parallel.tlayout import build_tlayout
    from cfd_proxy_tpu.parallel.topology import (build_halo_topology,
                                                 entry_phases)

    # mirror GreenGaussPallas's preprocessing: pre-topology phase ids feed
    # the canonical phase-signature relabel (round 5: interval slices — no
    # tail at P=8), which is what makes tlayout's segmented lanes possible;
    # a raw-partition layout would silently read pack_cols = every column.
    # entry_phases is the SHARED helper — the model and this geometry must
    # not fork the entry→phase rule (the pack_cols==0 gate rests on it)
    raw = partition_mesh(mesh, P)
    pre = build_halo_topology(raw, max(p.npoint for p in raw) + 1,
                              slice_size=slice_size)
    eph = entry_phases(raw, pre)
    parts = [relabel_owned(p, rcb_owned_order(p, block=4096,
                                              degree_sort=True,
                                              entry_phase=eph[d]))
             for d, p in enumerate(raw)]
    topo = build_halo_topology(parts, max(p.npoint for p in parts) + 1,
                               slice_size=slice_size)
    lay = build_tlayout(parts, topo)
    inter = np.asarray(lay.inter_slice, bool)
    shards = []
    for d, p in enumerate(parts):
        sp = send_point_set(p)
        is_send = np.zeros(p.npoint, bool)
        is_send[sp] = True
        bsel = is_send[p.faces[:, 0]] | is_send[p.faces[:, 1]]
        sends = lay.dsts[d] != d
        pack_cols = 0
        n_tail_phases = 0
        for k in range(lay.nphases):
            if lay.dsts[d, k] == d:
                continue
            if lay.seg_offs and lay.seg_offs[k] is not None:
                t = lay.tail_offs[k] if lay.tail_offs else None
                if t is not None:
                    pack_cols += int(t[1])
                    n_tail_phases += 1
            else:
                pack_cols += int(lay.s_max)
        shards.append((p.nface, int(bsel.sum()),
                       int((sends & ~inter).sum()),
                       int((sends & inter).sum()),
                       pack_cols, n_tail_phases))
    return {"nface_total": sum(p.nface for p in parts),
            "s_max": int(lay.s_max), "shards": shards}


def eval_geometry(geo: dict, ns_per_face, ici_gbps, rows, *,
                  overlap_fixed_us=0.0, halo_bytes=4, rate_table=None,
                  bulk_fixed_us=0.0, dcn_gbps=None,
                  pack_ns_per_col=None, pack_tail_gather_us=0.85,
                  pack_tail_phase_us=0.55) -> dict:
    """Evaluate the schedule time model on a shard_geometry.

    Schedule dataflows (per shard; per-chip time = max over shards — the
    benchmark barrier):
        bulk    : t_sweep(all) + t_comm + bulk_fixed      (serialized)
        overlap : t_sweep(boundary) + max(t_sweep(interior), t_comm)
                  + overlap_fixed
        nocomm  : t_sweep(all)                            (the floor)

    bulk_fixed_us: the bulk schedule's separate pack → exchange → unpack
    dispatch chain is not free — icibench measured 50-170 us of fixed cost
    PER DMA kernel and the fused kernel's equivalent machinery measured
    ~70 us; without this term the model predicts bulk beating overlap at
    high P purely because bulk's dispatch chain was modeled as zero-cost.
    overlap_fixed_us: the fused kernel's MEASURED per-step fixed cost
    (readiness barrier + per-phase DMA machinery + recv scatter; BASELINE.md
    small-mesh row).  Both apply only when the shard actually exchanges.

    pack_ns_per_col: when set, BOTH schedules additionally pay
    pack_ns_per_col × the shard's GATHER-packed column count per step — the
    MEASURED windowed-gather pack cost (round-4 fake-phase rungs; the pack
    depends on the boundary output and cannot run concurrently with compute
    on a TPU core, so it is exposed in every schedule).  Geometries built by
    shard_geometry carry the real layout's per-shard `pack_cols` (segmented
    slice lanes are FREE — measured paired 1.675, chain 28 → 5.1 µs — only
    the small-group tail and legacy prefix-packed phases still gather);
    older 4-tuples fall back to charging every column, phases × s_max.
    With it set, bulk_fixed_us / overlap_fixed_us should carry only the
    per-schedule BASE machinery (ppermute launches + unpack ≈ 5 us;
    fused-RDMA machinery ≈ +3 us over that), not the round-3 flat 70 us
    that conflated chain and transport.

    pack_tail_gather_us / pack_tail_phase_us: the MIXED-layout correction
    (round-5 fake_tail_frac rungs, BASELINE.md): a segs phase whose pack
    includes a gather TAIL pays, beyond the per-column rate, a fixed
    materialization — measured ~0.85 µs for the (shared, once-per-step)
    combined tail gather plus ~0.55 µs per tail phase for the slices+piece
    concat.  The round-4 composition (5 µs + 1.7 ns/col alone) under-
    predicted the measured mixed chain 8.5 vs 16.6 µs; with these terms the
    frac-0.30 point predicts 19.9 vs 19.7 measured.  Charged to both
    schedules when the shard has >= 1 tail phase (6-tuples from
    shard_geometry; older tuples charge none).

    Multi-slice: a geometry built with slice_size carries DCN phase counts;
    those phases are charged at dcn_gbps (sequential ppermutes), mirroring
    the ICI-first/DCN-separated phase coloring the framework runs.

    Returns every aggregate the callers report, including BOTH
    overlap-efficiency definitions:
    - eff_hide: Σ min(t_interior, t_comm) / Σ t_comm — the pure what-can-
      hide ratio (fixed costs excluded); the historic table number.
    - eff_solverdef: 1 − (t_over − t_nocomm)/(t_bulk − t_nocomm) — exactly
      what solver.run computes from measured medians, so a real multi-chip
      measurement is comparable to THIS number.  Charges both schedules'
      fixed costs; this is the honest gate metric for BASELINE.json's ≥85%.
    """
    t_bulk = t_over = t_nc = 0.0
    eff_num = eff_den = 0.0
    for shard in geo["shards"]:
        nface, nfb, n_ici, n_dcn = shard[:4]
        pack_cols = (shard[4] if len(shard) > 4
                     else (n_ici + n_dcn) * geo["s_max"])
        n_tail_ph = shard[5] if len(shard) > 5 else 0
        # per-SHARD sweep rate: a strong-scaled shard runs at its own
        # footprint's measured rate (RATE_TABLES), not the global mesh's
        nspf = (rate_ns_per_face(nface, rate_table) if rate_table
                else ns_per_face)
        nfi = nface - nfb
        phase_bytes = geo["s_max"] * rows * halo_bytes
        ts_all = nface * nspf * 1e-9
        ts_b = nfb * nspf * 1e-9
        ts_i = nfi * nspf * 1e-9
        tc = n_ici * phase_bytes / (ici_gbps * 1e9)
        if n_dcn:
            tc += n_dcn * phase_bytes / ((dcn_gbps or ici_gbps) * 1e9)
        fx = bulk_fixed_us * 1e-6 if (n_ici + n_dcn) else 0.0
        ofx = overlap_fixed_us * 1e-6 if (n_ici + n_dcn) else 0.0
        if pack_ns_per_col is not None and (n_ici + n_dcn):
            tp = pack_cols * pack_ns_per_col * 1e-9
            if n_tail_ph:
                # mixed-layout fixed terms (round-5): one combined tail
                # gather + per-tail-phase concat materialization
                tp += (pack_tail_gather_us
                       + pack_tail_phase_us * n_tail_ph) * 1e-6
            fx += tp
            ofx += tp
        t_bulk = max(t_bulk, ts_all + tc + fx)
        t_over = max(t_over, ts_b + max(ts_i, tc) + ofx)
        t_nc = max(t_nc, ts_all)
        eff_num += min(ts_i, tc)
        eff_den += tc
    comm = t_bulk - t_nc
    return {
        "nface": geo["nface_total"],
        "t_bulk": t_bulk,
        "t_over": t_over,
        "t_nocomm": t_nc,
        "eff_hide": eff_num / eff_den if eff_den else None,
        "eff_solverdef": (max(0.0, min(1.0, 1.0 - (t_over - t_nc) / comm))
                          if comm > 0 else None),
    }


def model_partitioning(mesh, P, ns_per_face, ici_gbps, rows,
                       overlap_fixed_us=0.0, halo_bytes=4, rate_table=None,
                       bulk_fixed_us=0.0, slice_size=None, dcn_gbps=None):
    """Back-compat wrapper: shard_geometry + eval_geometry in one call,
    returning the historic (nface_total, t_bulk, t_over, eff_hide) tuple."""
    geo = shard_geometry(mesh, P, slice_size=slice_size)
    r = eval_geometry(geo, ns_per_face, ici_gbps, rows,
                      overlap_fixed_us=overlap_fixed_us,
                      halo_bytes=halo_bytes, rate_table=rate_table,
                      bulk_fixed_us=bulk_fixed_us, dcn_gbps=dcn_gbps)
    return r["nface"], r["t_bulk"], r["t_over"], r["eff_hide"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cfd_proxy_tpu.tools.scaling_model")
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--ny", type=int, default=0)
    ap.add_argument("--nz", type=int, default=0)
    ap.add_argument("--parts", type=int, nargs="+", default=[1, 2, 4, 8, 16, 64])
    ap.add_argument("--ns-per-face", type=float, default=None,
                    help="CONSTANT sweep-rate override, ns/face.  Default "
                         "(unset) uses the measured size-dependent rate "
                         "table (RATE_TABLES, BASELINE.md): each shard is "
                         "modeled at its own footprint's rate — small "
                         "strong-scaled shards measure ~2.5x faster per "
                         "face than the 2.8M headline")
    ap.add_argument("--rate", choices=sorted(RATE_TABLES), default="f32",
                    help="which measured rate table to use (f32 = headline "
                         "kernel; reduced = bf16 srcs+weights mode)")
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="modeled per-link ICI bandwidth, GB/s (v5e link "
                         "spec; cross-check with tools/icibench.py, whose "
                         "self-send DMA rate upper-bounds it)")
    ap.add_argument("--rows", type=int, default=24,
                    help="exchanged rows per point (24 = gg grads; 8 = flux)")
    ap.add_argument("--halo-bytes", type=int, default=4, choices=[2, 4],
                    help="wire bytes per exchanged value (4 = f32; 2 = the "
                         "--halo-dtype bfloat16 payload option)")
    ap.add_argument("--overlap-fixed-us", type=float, default=8.0,
                    help="overlap schedule's per-step BASE machinery cost "
                         "beyond the shared pack (fused-RDMA barrier + DMA "
                         "issue + recv scatter).  Round-4 fake-phase rungs "
                         "measured the full machinery at +7 us vs sweep-"
                         "only and +3 us vs the ppermute chain at equal "
                         "P8-shaped payloads (BASELINE.md); the payload-"
                         "dependent pack lives in --pack-ns-per-col")
    ap.add_argument("--slice-size", type=int, default=None,
                    help="devices per TPU slice (multi-slice deployments): "
                         "inter-slice phases are charged at --dcn-gbps "
                         "instead of --ici-gbps, mirroring the ICI-first/"
                         "DCN-separated phase coloring the framework "
                         "actually runs (parallel/topology.py)")
    ap.add_argument("--dcn-gbps", type=float, default=10.0,
                    help="modeled per-device DCN bandwidth, GB/s (ASSUMED — "
                         "deployment-dependent; only used with --slice-size)")
    ap.add_argument("--bulk-fixed-us", type=float, default=5.0,
                    help="bulk/early schedules' per-step BASE chain cost "
                         "(ppermute launches + unpack), round-4 measured "
                         "via fake phases at P8-shaped payloads: total "
                         "chain 28 us = ~5 us base + 1.7 ns/col pack "
                         "(BASELINE.md); the payload term lives in "
                         "--pack-ns-per-col")
    ap.add_argument("--pack-ns-per-col", type=float, default=1.7,
                    help="MEASURED pack cost per GATHERED send column, "
                         "charged to BOTH schedules (the pack is exposed "
                         "everywhere — one compute core).  1.7 ns/col = the "
                         "comm-first windowed XLA gather (round 4).  The "
                         "layout's segmented slice lanes are charged ZERO "
                         "(built + measured: paired 1.675 over the gather, "
                         "chain 28 → 5.1 µs at P8 shapes) — only the "
                         "small-group tail and legacy phases pay this rate")
    ap.add_argument("--diag-frac", type=float, default=0.2)
    args = ap.parse_args(argv)

    mesh = generate_mesh(args.nx, args.ny or args.nx, args.nz or args.nx,
                         jitter=0.05, diag_frac=args.diag_frac, seed=0)
    rate_table = None if args.ns_per_face is not None else RATE_TABLES[args.rate]
    if rate_table is not None:
        rate_s = (f"measured {args.rate} rate table (whole mesh "
                  f"{rate_ns_per_face(mesh.nface, rate_table):.3f} ns/face; "
                  f"per-shard at each shard's footprint)")
    else:
        rate_s = f"{args.ns_per_face} ns/face constant (override)"
    slice_s = (f"slice_size={args.slice_size} (DCN phases at "
               f"{args.dcn_gbps} GB/s, assumed), "
               if args.slice_size else "")
    print(f"# MODEL (not measurement): {mesh.nface} global faces, "
          f"sweep = {rate_s}, {slice_s}"
          f"{args.ici_gbps} GB/s ICI (assumed; icibench upper-bounds it), "
          f"rows={args.rows}, overlap base {args.overlap_fixed_us} us + "
          f"bulk base {args.bulk_fixed_us} us + pack "
          f"{args.pack_ns_per_col} ns/col (all measured, round-4 fake-"
          f"phase rungs); faces/sec uses sum-of-shard faces (solver.run)")
    print(f"{'P':>4} {'shard ns/f':>10} {'bulk Gf/s':>10} "
          f"{'overlap Gf/s':>13} {'speedup':>8} {'eff_hide':>9} "
          f"{'eff_slvr':>9}")
    base = None
    for P in args.parts:
        geo = shard_geometry(mesh, P, slice_size=args.slice_size)
        r = eval_geometry(
            geo, args.ns_per_face, args.ici_gbps, args.rows,
            overlap_fixed_us=args.overlap_fixed_us,
            halo_bytes=args.halo_bytes, rate_table=rate_table,
            bulk_fixed_us=args.bulk_fixed_us, dcn_gbps=args.dcn_gbps,
            pack_ns_per_col=args.pack_ns_per_col)
        nface_total, t_bulk, t_over = r["nface"], r["t_bulk"], r["t_over"]
        if base is None:
            base = t_over
        shard_rate = (rate_ns_per_face(mesh.nface // P, rate_table)
                      if rate_table else args.ns_per_face)

        def pct(v):
            return f"{v:>9.1%}" if v is not None else f"{'-':>9}"

        # eff_hide: pure hide ratio (fixed costs excluded) — the historic
        # column; eff_slvr: solver.run's measured definition
        # 1 - (over-nocomm)/(bulk-nocomm), the BASELINE.json gate metric
        print(f"{P:>4} {shard_rate:>10.3f} {nface_total / t_bulk / 1e9:>10.2f} "
              f"{nface_total / t_over / 1e9:>13.2f} "
              f"{base / t_over:>8.2f} {pct(r['eff_hide'])} "
              f"{pct(r['eff_solverdef'])}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
