"""GreenGaussPallas — the production TPU path: block-sweep kernel + transposed
halo pipeline.

Same capabilities as models/gradients.py::GreenGaussModel (all three exchange
schedules, multi-round ghosts, P shards under shard_map) but built on:

- the block-local Pallas sweeps (ops/blocksweep.py): the PACKED streaming
  kernel (production) or the in-kernel GATHER formulation (cross-check) —
  no scatters, volume scaling fused;
- the transposed device layout (parallel/tlayout.py) — pack is a fast column
  gather, unpack a static-offset contiguous store per ppermute phase;
- RCB locality relabeling of owned points (mesh/partition.py) so VMEM blocks
  are geometrically compact.

Schedule composition (per shard):
    bulk   : bulk kernel → pack+ppermute → unpack
    early  : boundary kernel (compact block list) → pack+ppermute fired →
             interior kernel (independent of the collectives) → unpack
    overlap: FUSED interior sweep + in-kernel one-sided RDMA push
             (make_async_remote_copy — the gaspi_write_notify analogue,
             SURVEY.md §5.8 full-overlap; hardware-verified at P=1 via
             force_rdma self-send phases).
The boundary kernel finishes exactly the send-point gradients first — the
reference's finish-counter guarantee (SURVEY.md §4.3) realised structurally.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cfd_proxy_tpu.mesh.model import MeshPartition
from cfd_proxy_tpu.mesh.partition import (
    rcb_owned_order,
    relabel_owned,
    send_point_set,
)
from cfd_proxy_tpu.ops.blocksweep import (
    NV,
    BlockPlan,
    build_block_plan,
    compact_slot_w,
    gather_exts,
    out_rows,
    pack_srcs,
    prefix_widths,
    sweep_blocks,
    sweep_blocks_overlap,
)
from cfd_proxy_tpu.parallel.schedules import SCHEDULES
from cfd_proxy_tpu.parallel.tlayout import (
    LANE,
    build_tlayout,
    device_faces,
    device_inv_scale,
    device_state,
)
from cfd_proxy_tpu.parallel.topology import build_halo_topology, entry_phases
from cfd_proxy_tpu.utils.errors import check

AXIS = "shard"
# AUTO block-size rule (bp=None): shards below BP_AUTO_SMALL points use
# BP_SMALL instead of 4096.  Paired-measured crossover between 216k and
# 373k points (BASELINE.md small-shard scan, 2026-08-18); 262144 = the
# point count where bp=4096 yields 64 grid steps.
BP_AUTO_SMALL = 262144
BP_SMALL = 1024
CLASSES = ("bulk", "boundary", "interior")
# which source-table classes each schedule's step graph reads
SCHEDULE_CLASSES = {
    "bulk": ("bulk",), "nocomm": ("bulk",),
    "early": ("boundary", "interior"), "overlap": ("boundary", "interior"),
}


def _shard_map(fn, mesh, in_specs, out_specs):
    # check_vma=False: pallas_call outputs carry no varying-manual-axes info
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except AttributeError:
        from jax.experimental.shard_map import shard_map

        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def _sq(tree):
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def _pad_plan_dims(plan: BlockPlan, ep: int, kslots: int) -> BlockPlan:
    """Zero-pad a plan's per-block tables to uniform (ep, kslots).

    Pure padding is EQUIVALENT to rebuilding with pads=(ep, kslots): ext
    W-indices (bp+rank) depend only on the block's own sorted ext list, and
    extra slots carry zero weights (inert)."""
    import dataclasses

    if (plan.ep, plan.kslots) == (ep, kslots):
        return plan

    def pad(a, axis, to):
        grow = to - a.shape[axis]
        if grow == 0:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, grow)
        return np.pad(a, widths)

    return dataclasses.replace(
        plan, ep=ep, kslots=kslots,
        slot_idx=pad(plan.slot_idx, 1, kslots),
        slot_w=pad(plan.slot_w, 1, kslots),
        ext_idx=pad(plan.ext_idx, 1, ep),
    )


def _pad_blocks(plan: BlockPlan, nblocks: int, trash_block: int) -> BlockPlan:
    """Pad a compact block list to a uniform grid length with inert entries.

    Pad entries target the dedicated TRASH block (no real points) — revisiting
    a real block would race with pipelined block prefetch."""
    import dataclasses

    extra = nblocks - plan.nblocks
    if extra <= 0:
        return plan

    def pad(a, fill=0):
        shape = (extra, *a.shape[1:])
        return np.concatenate([a, np.full(shape, fill, a.dtype)], axis=0)

    return dataclasses.replace(
        plan,
        nblocks=nblocks,
        block_ids=np.concatenate(
            [plan.block_ids, np.full(extra, trash_block, np.int32)]),
        slot_idx=pad(plan.slot_idx),
        slot_w=pad(plan.slot_w),
        ext_idx=pad(plan.ext_idx),
        scale=pad(plan.scale),
        ext_cnt=(None if plan.ext_cnt is None else pad(plan.ext_cnt)),
    )


class GreenGaussPallas:
    """Distributed Green-Gauss sweep on the Pallas fast path."""

    def __init__(
        self,
        parts: list[MeshPartition],
        nvar: int,
        *,
        bp: int | None = None,
        devices: list | None = None,
        interpret: bool | None = None,
        op: str = "gg",
        kernel: str = "packed",
        force_rdma: bool = False,
        slice_size: int | None = None,
        meta_dtype: str = "float32",
        src_dtype: str = "float32",
        min_phases: int = 1,
        fake_sends: int = 0,
        fake_tail_frac: float = 0.0,
        kcompact: bool | None = None,
        halo_dtype: str = "float32",
        grad_dtype: str = "float32",
        overlap_debug: str | None = None,
        pack_force: str | None = None,
    ):
        if interpret is None:
            # Mosaic compiles only for TPU; interpret elsewhere (CPU tests)
            interpret = jax.default_backend() != "tpu"
        check(op in ("gg", "flux"), "unknown kernel op %r", op)
        check(kernel in ("packed", "gather"),
              "unknown kernel formulation %r", kernel)
        self.op = op
        # packed: pre-gathered slot sources, pure-streaming hot loop
        # (production); gather: in-kernel masked gathers, K×NV×4 B/point less
        # HBM traffic (memory-lean cross-check) — see ops/blocksweep.py
        self.kernel = kernel
        self.packed = kernel == "packed"
        # bf16 slot weights halve the weight stream (BASELINE.md levers);
        # the ±face-normal weights lose ~8 mantissa bits → results carry a
        # ~1e-3 RELATIVE error bound vs golden instead of ~1e-7 (gated in
        # tests/test_pallas_model.py).  State, sources and accumulation stay
        # f32; weights are upcast before the FMA.
        check(meta_dtype in ("float32", "bfloat16"),
              "meta_dtype must be float32|bfloat16, got %r", meta_dtype)
        self.meta_dtype = meta_dtype
        # bf16 DELTA-packed slot sources (--src-dtype bfloat16) halve the
        # dominant srcs stream — measured ~17% faster at 2.8M faces (paired
        # kbench, BASELINE.md).  Deltas src−own keep the gradient's relative
        # error ~1e-3 (the Green-Gauss signal is the neighbor delta; see
        # ops/blocksweep.py::_block_compute_packed).  Packed kernel only —
        # the gather formulation reads f32 state tables in-kernel.
        check(src_dtype in ("float32", "bfloat16"),
              "src_dtype must be float32|bfloat16, got %r", src_dtype)
        check(src_dtype == "float32" or self.packed,
              "--src-dtype bfloat16 requires the packed kernel")
        self.src_dtype = src_dtype
        self.src_format = "bf16d" if src_dtype == "bfloat16" else "f32"
        # COMPACT prefix mode (--kcompact): points are degree-sorted within
        # each block (block membership, ext lists unchanged).  For the
        # packed kernel the slot tables store only each slot's static lane
        # PREFIX — the ~21% inert padding of a valence-skewed mesh drops out
        # of the srcs and slot_w streams (ops/blocksweep.py::prefix_widths).
        # For the gather kernel the tables stay rectangular and the prefix
        # only SKIPS the dead (tile, slot) pairs in the unrolled gather
        # loops (the kernel is VPU-bound on gather issue, not streams).
        if kcompact is None:
            kcompact = True
        self.kcompact = bool(kcompact)
        # bf16 HALO payloads (--halo-dtype bfloat16): the exchanged gradient
        # buffers are the comm bytes the overlap schedules hide — a pack-time
        # cast halves them on the wire (ICI RDMA and DCN ppermute alike) and
        # the unpack upcasts back to f32.  Only ghost-point gradients carry
        # the ~8-bit rounding (~4e-3 rel bound, gated in tests); owned
        # gradients are untouched.  The solver-mode VAR exchange stays f32 —
        # state feeds every downstream sweep and its error would compound.
        check(halo_dtype in ("float32", "bfloat16"),
              "halo_dtype must be float32|bfloat16, got %r", halo_dtype)
        self.halo_dtype = halo_dtype
        self._halo_jnp = (jnp.bfloat16 if halo_dtype == "bfloat16"
                          else jnp.float32)
        # bf16 GRADIENT stores (--grad-dtype bfloat16): the (3·NV, npts)
        # output planes are the largest remaining f32 stream once sources
        # and weights are bf16 — storing them bf16 measured a ~5.6% paired
        # win on the reduced-precision kernel (ratio 1.056, IQR
        # [1.042, 1.102]; the naive 17%-byte prediction is eaten by the
        # 24-sublane bf16 store relayout, the nv7 lesson in its mild form).
        # Accumulation stays f32 in-kernel; every STORED grad buffer
        # (boundary partials, init chains, final planes) carries the dtype
        # so the schedule-composition aliases stay consistent.  Semantics:
        # results round to ~8 mantissa bits (~4e-3 field-norm bound), and
        # cross-schedule agreement loosens to the same bound (bulk rounds
        # once; early/overlap round the boundary partial too).  Off by
        # default; the f32 headline and the 1e-6 schedule-equivalence
        # invariant are unchanged without the flag.
        check(grad_dtype in ("float32", "bfloat16"),
              "grad_dtype must be float32|bfloat16, got %r", grad_dtype)
        self.grad_dtype = grad_dtype
        self._grad_jnp = (jnp.bfloat16 if grad_dtype == "bfloat16"
                          else jnp.float32)
        # overlap_debug ("nobar"/"nodma"): fixed-cost attribution knobs for
        # the fused RDMA kernel (ops/blocksweep.py::sweep_blocks_overlap) —
        # P=1 self-send TIMING ONLY.  nobar is semantically sound at P=1
        # (sender==receiver needs no readiness barrier); nodma leaves the
        # recv buffers zero.  Gated to one shard so a multi-chip run can
        # never silently race.
        check(overlap_debug in (None, "nobar", "nodma", "plain",
                                "splitgraph", "nopack", "noscatter",
                                "packdep", "packslice", "packflat"),
              "unknown overlap_debug %r", overlap_debug)
        check(overlap_debug is None or len(parts) == 1,
              "overlap_debug is a P=1 timing-only knob (got %d shards)",
              len(parts))
        self.overlap_debug = overlap_debug
        # pack_force ("gather"): benchmark-only — disable the slice/segs
        # pack lowerings so a paired A/B can measure what they buy over the
        # windowed column gather on identical layouts.  Value-identical by
        # construction (test_pack_mode_dispatch_matches_gather).
        # "combine": pack every segs phase through ONE concatenated fusion
        # (_segs_combined) instead of per-phase concats.  MEASURED SLOWER
        # (round 5, paired at real-sized tails: nocombine/combine 0.849 —
        # the slices of the big materialized concat each copy out again),
        # so per-phase is the default; the variant is kept as the A/B knob
        # that refuted it.  "nocombine" is accepted as an explicit alias of
        # the default for A/B symmetry.
        check(pack_force in (None, "gather", "nocombine", "combine"),
              "unknown pack_force %r", pack_force)
        self.pack_force = pack_force
        check(nvar <= NV, "nvar %d > padded NV %d", nvar, NV)
        # the flux kernel reads var[:3] as the velocity vector; with fewer
        # vars the padded zero rows would silently stand in for velocity
        # components while the golden compute_psd_flux raises — keep the
        # model and its reference anchor in agreement
        check(op != "flux" or nvar >= 3,
              "flux model needs nvar >= 3 (velocity components), got %d", nvar)
        self.nvar = int(nvar)
        # block size.  bp=None (default) = AUTO: 4096 for shards >= ~256k
        # points, 1024 below — three paired kbench verdicts (BASELINE.md,
        # 2026-08-18) put the crossover between 216k and 373k points
        # (1024 wins 1.27x at 110k and 1.43x at 216k; 4096 wins 1.36x at
        # 373k and is the paired-scan optimum at 884k).  The driver is
        # block count: below ~64 grid steps the pipeline can't amortize,
        # and a 4096-pt RCB chunk of a small shard also captures a 3.5x
        # larger ext halo (ep 22528 vs 6272 at 110k pts).
        self.bp_auto = bp is None
        if self.bp_auto:
            # keyed on OWNED points: the paired crossover anchors (110k/216k
            # vs 373k) were measured at P=1 where npoint == nowned; on
            # multi-shard meshes 1-2 ghost layers inflate npoint ~10-30% and
            # would bias shards just below the crossover into the bp=4096
            # regime the calibration never measured (advisor find, round 3)
            bp = 4096 if max(p.nowned for p in parts) >= BP_AUTO_SMALL else \
                BP_SMALL
        # cap the block size at the (128-rounded) shard size: blocks larger
        # than the shard are pure padding — without this the bp=4096 default
        # makes small meshes (tests, examples) sweep 8x dead lanes
        cap = max(p.npoint for p in parts) + 1
        cap = ((cap + 127) // 128) * 128
        if interpret:
            # interpret mode is the correctness harness: the kernel TRACE
            # grows ~bp^2/128^2 (tile x gather-pass unrolls) and each traced
            # op executes eagerly on host — bp=4096 made a 4.6k-point CLI
            # test take 660 s.  1024 keeps traces at the round-2 size.
            cap = min(cap, 1024)
        self.bp_requested = int(bp)
        self.bp = bp = min(bp, cap)
        if bp != self.bp_requested and not self.bp_auto:
            # an explicitly requested bp silently measuring as a different
            # config misattributes A/B comparisons (advisor finding, round
            # 2) — say so once, at construction, on stderr
            why = ("interpret-mode trace cap" if interpret and cap == 1024
                   else "shard-size cap")
            print(f"cfd_proxy_tpu: requested bp {self.bp_requested} reduced "
                  f"to {bp} ({why})", file=sys.stderr)
        self.interpret = interpret
        P_ = len(parts)
        # PRE-topology on the raw parts: phase coloring depends only on the
        # comm graph structure (partner/round edges), which the relabel
        # does not change — so the phase ids derived here are exactly the
        # final topology's.  They let rcb_owned_order group each shard's
        # send points by PHASE signature in the canonical order, which is
        # what makes tlayout's interval slices possible (round 5: one
        # dynamic_slice spanning several column-adjacent whole groups — no
        # small-group gather tail).  Building the full topology twice is
        # fine: it measures 0.00 s even at the 22.5M-point north-star mesh
        # (the host wall is mesh gen + partition, 45+13 s there).
        pre_topo = build_halo_topology(parts,
                                       max(p.npoint for p in parts) + 1,
                                       slice_size=slice_size)
        eph = entry_phases(parts, pre_topo)
        # locality relabel, then topology & device layout; kcompact adds the
        # in-block degree sort that makes the compact prefixes tight
        self.parts = [
            relabel_owned(p, rcb_owned_order(p, block=bp,
                                             degree_sort=self.kcompact,
                                             entry_phase=eph[d]))
            for d, p in enumerate(parts)
        ]
        npoint_pad = max(p.npoint for p in self.parts) + 1
        # multi-slice: ICI phases scheduled before DCN phases (topology.py)
        topo = build_halo_topology(self.parts, npoint_pad,
                                   slice_size=slice_size)
        check(topo.nphases == pre_topo.nphases,
              "phase coloring changed across the relabel (%d -> %d phases)",
              pre_topo.nphases, topo.nphases)
        self.topology = topo
        # fake_sends: benchmark-only real-payload self-send phases (see
        # tlayout docstring) — makes P>1-shaped exchange fixed costs
        # (gather-mode pack, multi-phase RDMA) measurable on ONE chip.
        # Kept on self: verify_model compares owned columns only for these
        # models (fake ghost regions legitimately differ per schedule)
        self.fake_sends = int(fake_sends)
        lay = build_tlayout(self.parts, topo, bp=bp, min_phases=min_phases,
                            fake_sends=fake_sends,
                            fake_tail_frac=fake_tail_frac)
        self.layout = lay

        if devices is None:
            devices = jax.devices()[:P_]
        check(len(devices) >= P_, "need %d devices, have %d", P_, len(devices))
        self.mesh = Mesh(np.array(devices[:P_]), (AXIS,))
        self._sharding = NamedSharding(self.mesh, P(AXIS))

        # block plans per class, two-pass for uniform shapes across shards.
        # Bit-equality construction (matches the XLA backend's, SURVEY.md §4b):
        # - the BULK plan sees faces REORDERED [boundary | interior], so each
        #   point's slots sum boundary first, exactly like the composed
        #   boundary∘interior chain (kernels seed accumulation from init);
        # - the BOUNDARY kernel emits UNSCALED sums (scale = 1); volume
        #   scaling is applied once, by the interior/bulk kernel, and at PACK
        #   time for the halo payload — so scale distributes identically.
        ones = np.ones(lay.ndev, dtype=np.float64)
        raw: dict[str, list[BlockPlan]] = {c: [] for c in CLASSES}
        pack_scale = np.zeros_like(lay.send_mask)
        for d, p in enumerate(self.parts):
            fd, nd = device_faces(p, lay)
            inv = device_inv_scale(p, lay)
            sp = send_point_set(p)
            is_send = np.zeros(lay.ndev, bool)
            is_send[sp] = True          # send points are owned; ids unchanged
            bsel = is_send[fd[:, 0]] | is_send[fd[:, 1]]
            order = np.concatenate([np.flatnonzero(bsel), np.flatnonzero(~bsel)])
            fd_ord, nd_ord = fd[order], nd[order]
            pack_scale[d] = lay.send_mask[d] * inv[lay.send_idx[d]]
            # dst_lt = nowned drops ghost-DESTINATION slots: their sums are
            # dead by construction (zero-scaled for bulk/interior, and for
            # the unscaled boundary class never read — every ghost column is
            # overwritten by the halo unpack or zero-padded), and the
            # unsortable ghost region would otherwise blunt the compact
            # prefix widths and inflate kslots/ext lists
            raw["bulk"].append(build_block_plan(fd_ord, nd_ord, lay.ndev, inv,
                                                bp=bp, all_blocks=True,
                                                dst_lt=p.nowned))
            raw["boundary"].append(build_block_plan(fd, nd, lay.ndev, ones,
                                                    bp=bp, face_sel=bsel,
                                                    dst_lt=p.nowned))
            raw["interior"].append(build_block_plan(fd, nd, lay.ndev, inv, bp=bp,
                                                    face_sel=~bsel, all_blocks=True,
                                                    dst_lt=p.nowned))

        self._dims: dict[str, tuple[int, int, int]] = {}
        self._wks: dict[str, tuple[int, ...] | None] = {}
        self._plans_dev: dict[str, dict] = {}
        for c in CLASSES:
            ep = max(pl.ep for pl in raw[c])
            ks = max(pl.kslots for pl in raw[c])
            nb = max(pl.nblocks for pl in raw[c])
            # expand each shard's plan to the uniform (ep, ks) by pure
            # zero-padding — growing ep appends zero ext columns (W-indices
            # are unchanged: ext ranks only depend on the block's own sorted
            # ext list) and growing kslots appends zero-weight slots, so a
            # full plan REBUILD (the dominant host-setup cost) is never
            # needed for the second pass
            padded = [_pad_plan_dims(pl0, ep, ks) for pl0 in raw[c]]
            padded = [_pad_blocks(pl1, nb, lay.ndev // bp - 1)
                      for pl1 in padded]
            self._dims[c] = (ep, ks, nb)
            if self.kcompact:
                sw = np.stack([pl2.slot_w for pl2 in padded])
                self._wks[c] = prefix_widths(sw, bp)
            else:
                sw = None
                self._wks[c] = None
            # pass the already-stacked slot_w through — re-stacking inside
            # _stack_plans would transiently double the largest plan array
            # (~1 GB/class at the 44M-face capacity ceiling)
            self._plans_dev[c] = self._stack_plans(padded, self._wks[c],
                                                   slot_w_stacked=sw)
        del raw

        def put(arr):
            # host numpy → sharded device arrays in ONE placement; an eager
            # jnp.asarray hop would first commit the full P-stacked array to
            # device 0 (double transfer + a P× memory spike there)
            return jax.device_put(np.ascontiguousarray(arr), self._sharding)

        self._send_idx = put(lay.send_idx)
        self._send_mask = put(lay.send_mask)
        # pack-time volume scaling for the UNSCALED boundary sums (f32 cast
        # matches the bulk kernel's scale multiply operand bit-for-bit)
        self._pack_scale = put(pack_scale.astype(np.float32))
        self._dsts = put(lay.dsts)
        self._srcs = put(lay.srcs)
        # Per-phase HOST-decided pack lowering.  XLA's axis-1 take on the
        # Pallas-produced gradient array is expensive two ways (measured,
        # 390k pts P=1): the slice_sizes={rows,1} gather forces a full
        # transposed {0,1} copy of the 12 MB operand EVERY iteration
        # (~31 us — visible as copy.9 in the optimized HLO), and the
        # transpose-free {1,1} point-gather serializes per ELEMENT
        # (~10 ns/elt → ~31 us for rows×s_max=3k).  dynamic_slice has
        # neither cost (paired overlap-vs-early collapsed 3.06x → 1.05x
        # with null 1.05).  So each phase picks, at model build:
        #   "zero"   — every shard's mask is empty (tlayout's padded
        #              self-send phases): the payload is exact zeros;
        #              emit the constant, skip the gather entirely
        #   "slice"  — every active shard's send list is a contiguous
        #              ascending run occupying a prefix of the lanes:
        #              dynamic_slice at sidx[k][0] (masked tail lanes
        #              read neighboring columns, zeroed by the scale)
        #   "gather" — general case: keep the take (at real P>1 the
        #              transposed copy CSEs across phases, beating the
        #              per-element point-gather for nph*s_max > ~3k)
        sidx_h, mask_h = lay.send_idx, lay.send_mask
        modes = []
        for k in range(lay.nphases):
            if mask_h[:, k].sum() == 0:
                modes.append("zero")
                continue
            ok = True
            for p in range(len(parts)):
                act = mask_h[p, k] > 0
                n = int(act.sum())
                if n == 0:
                    continue            # idle shard: any slice, scale 0
                run = sidx_h[p, k, :n]
                if (not act[:n].all() or not (np.diff(run) == 1).all()
                        or int(run[0]) + lay.s_max > lay.ndev):
                    ok = False
                    break
            if ok:
                modes.append("slice")
            elif lay.seg_offs and lay.seg_offs[k] is not None:
                # segmented lanes (tlayout): the phase is a concatenation of
                # signature-group runs at static offsets — pack = a handful
                # of static-length dynamic slices (~10x over the gather)
                modes.append("segs")
            else:
                modes.append("gather")
        if self.pack_force == "gather":
            # benchmark A/B: keep "zero" (exact-constant phases have no
            # gather to measure); force the rest to the windowed gather
            modes = [m if m == "zero" else "gather" for m in modes]
        self._pack_modes = tuple(modes)
        # truthful gather hints: since the topology-level pair sort, real
        # phases' send lists are ascending and tlayout pads repeat the last
        # index — if every shard's full lane vector is non-decreasing, the
        # pack gather may carry indices_are_sorted (strictly ascending
        # active prefixes are also unique, but the repeated padding isn't,
        # so unique_indices stays False)
        self._pack_sorted = tuple(
            bool((np.diff(sidx_h[:, k].astype(np.int64), axis=1) >= 0).all())
            for k in range(lay.nphases))
        # static gather window: the comm-first relabel (rcb_owned_order)
        # packs send points at the FRONT of the owned order, so every
        # gather-mode pack can read a small [0, W_c) slice instead of the
        # full (rows, ndev) array — XLA's column gather measured 1.6 ns/col
        # from a VMEM-sized table vs 3-5 ns/col from the full array.
        # Uniform across shards (SPMD-clean); degenerates to the full array
        # when sends are not front-packed (old partitions, fake sends drawn
        # wide)
        act = lay.send_mask > 0
        self._pack_window = (int(-(-(int(lay.send_idx[act].max()) + 1)
                                   // LANE) * LANE)
                             if act.any() else 0)
        # any phase with a real transfer? → the fused RDMA overlap kernel is
        # meaningful; otherwise overlap degrades to the early graph.
        # force_rdma keeps the fused kernel even with no real transfers: the
        # comm-free layout already completes every phase to a SELF-send of
        # masked zeros (tlayout), so at P=1 this Mosaic-compiles and runs the
        # make_async_remote_copy path on a single real chip — the hardware
        # proof of the GASPI-analogue mechanism (VERDICT r1 item 2)
        self._has_comm = any(len(p) for p in lay.perms) or force_rdma
        # transport routing for the fused-RDMA overlap kernel: the in-kernel
        # make_async_remote_copy path is an ICI mechanism — inter-slice (DCN)
        # phases are NOT ICI-reachable and must ride XLA collectives
        # (ppermute) instead, fired before the fused interior sweep so the
        # compiler can hide them the same way.  Padded self-send phases count
        # as ICI (local copies).
        self._ici_phases = [k for k in range(lay.nphases)
                            if not bool(lay.inter_slice[k])]
        self._dcn_phases = [k for k in range(lay.nphases)
                            if bool(lay.inter_slice[k])]
        self._step_cache: dict = {}

    def _stack_plans(self, plans: list[BlockPlan],
                     wks: tuple[int, ...] | None = None,
                     slot_w_stacked: np.ndarray | None = None) -> dict:
        def stack(key, dtype, transform=None):
            # host numpy placed directly with the sharding (see __init__'s
            # put(): no eager jnp.asarray hop through device 0)
            if key == "slot_w" and slot_w_stacked is not None:
                host = slot_w_stacked  # caller already stacked it (kcompact)
            else:
                host = np.stack([getattr(p, key) for p in plans])
            if transform is not None:
                host = transform(host)
            return jax.device_put(host.astype(dtype), self._sharding)

        w_dtype = (jnp.bfloat16 if self.meta_dtype == "bfloat16"
                   else np.float32)
        # kcompact + packed: weights stored in the compact prefix layout
        # (P, nb, 3, L); the gather kernel keeps full rectangles
        sw_tf = (None if wks is None or not self.packed
                 else (lambda h: compact_slot_w(h, wks)))
        return {
            "block_ids": stack("block_ids", np.int32),
            "slot_idx": stack("slot_idx", np.int32),
            "slot_w": stack("slot_w", w_dtype, sw_tf),
            "scale": stack("scale", np.float32),
            "ext_idx": stack("ext_idx", np.int32),
        }

    # ---------------------------------------------------------------- state

    def _classes_for(self, schedules) -> tuple:
        """Table classes needed by a set of schedules (None → all).

        The packed srcs tables are the largest arrays in the system (one
        (nblocks, K, NV, bp) per class); a run that only ever steps one
        schedule can skip 1-2 of the 3 and keep the HBM for mesh capacity."""
        if schedules is None:
            return CLASSES
        need = set()
        for s in schedules:
            check(s in SCHEDULE_CLASSES, "unknown schedule %r", s)
            need.update(SCHEDULE_CLASSES[s])
        return tuple(c for c in CLASSES if c in need)

    def _table_stub(self) -> jax.Array:
        """Inert placeholder for a table class the state does not carry (the
        step graph for the state's own schedules never reads it)."""
        if "_stub" not in self._step_cache:
            P_ = len(self.parts)
            self._step_cache["_stub"] = jax.device_put(
                np.zeros((P_, 1, 1, 1, 1), np.float32), self._sharding)
        return self._step_cache["_stub"]

    def distribute_state(self, gvar: np.ndarray, *,
                         schedules: list | None = None) -> dict:
        """Global (N, nvar) state → stacked var_T + pre-gathered slot tables
        (ext columns for the gather kernel; full slot sources for packed).

        Ghost var values are filled host-side (state is static across the
        benchmark loop; the timed exchange moves gradients — SURVEY.md §4.2).

        schedules: restrict the built table classes to what these schedules
        read (default: all three classes — any schedule steppable).  Stepping
        a schedule whose class was not built raises.
        """
        lay = self.layout
        vts = []
        for p in self.parts:
            vts.append(device_state(
                gvar[p.global_ids].astype(np.float32), p, lay, NV))
        # np.stack, NOT jnp.stack: an eager jnp.stack would commit the full
        # P-stacked state to device 0 before resharding (double transfer +
        # a P× transient there — the same hop put() avoids for the tables)
        var_T = jax.device_put(np.stack(vts), self._sharding)
        classes = self._classes_for(schedules)
        return {"var_T": var_T, "_classes": classes,
                **self._build_tables(var_T, classes)}

    def _var_exchange_fn(self):
        """Cached jitted var halo exchange (ghost columns refreshed from
        owners): (var_T, send_idx, send_mask) → var_T."""
        if "var_exchange" not in self._step_cache:
            def body(v, send_idx, send_mask):
                bufs = self._exchange_start(v[0], send_idx[0], send_mask[0])
                return self._exchange_finish(v[0], bufs)[None]

            fn = _shard_map(body, self.mesh, in_specs=(P(AXIS),) * 3,
                            out_specs=P(AXIS))
            self._step_cache["var_exchange"] = jax.jit(fn)
        return self._step_cache["var_exchange"]

    def refresh_state(self, var_T: jax.Array, *,
                      schedules: list | None = None) -> dict:
        """Solver-mode state update: given a stacked var_T whose OWNED columns
        were updated on device (e.g. pseudo-time stepping), redo the var halo
        exchange (ghost columns) and rebuild the per-block ext tables.

        The benchmark loop itself never needs this (the reference's timed
        iteration exchanges gradients over a static state; SURVEY.md §4.2) —
        it is the API a real solver built on this framework would call once
        per time step.  schedules: as in distribute_state."""
        var_T = self._var_exchange_fn()(
            var_T, self._send_idx, self._send_mask)
        classes = self._classes_for(schedules)
        return {"var_T": var_T, "_classes": classes,
                **self._build_tables(var_T, classes)}

    def _build_tables_fn(self, classes: tuple = CLASSES):
        """Cached jitted per-class table rebuild:
        (var_T, plans per class...) → (table per class...).  `classes`
        selects a subset — the solver-mode loop only rebuilds the tables its
        schedule actually reads (bulk: 1 of 3; early/overlap: 2 of 3), which
        matters because the pack is the dominant per-time-step cost."""
        key = ("build_tables", classes)
        if key not in self._step_cache:

            def body(v, *plans_in):
                outs = []
                for cls, plans in zip(classes, plans_in):
                    pa = _sq(plans)
                    exts = gather_exts(v[0], pa["ext_idx"])
                    if self.packed:
                        ep, ks, nb = self._dims[cls]
                        pa = dict(pa)
                        pa["exts"] = exts
                        outs.append(pack_srcs(
                            v[0], pa, bp=self.bp, ep=ep, kslots=ks,
                            nblocks=nb, interpret=self.interpret,
                            src_format=self.src_format,
                            wks=self._wks[cls])[None])
                    else:
                        outs.append(exts[None])
                return tuple(outs)

            fn = _shard_map(
                body, self.mesh,
                in_specs=(P(AXIS),) * (1 + len(classes)),
                out_specs=(P(AXIS),) * len(classes),
            )
            self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    def _build_tables(self, var_T: jax.Array,
                      classes: tuple = CLASSES) -> dict:
        """Per-class pre-gathered tables: ext columns (gather kernel) or full
        slot sources (packed kernel).  Off the timed hot loop; for packed the
        sources are packed by a Pallas kernel at sweep speed (pack_srcs) from
        the small RCB-local ext tables — XLA's gather lowering alone costs
        ~90 ms per state update at 2.8M faces.  Classes not requested get an
        inert stub (never read by the requested schedules' step graphs)."""
        built = self._build_tables_fn(classes)(
            var_T, *[self._plans_dev[c] for c in classes])
        out = {f"tbl_{c}": t for c, t in zip(classes, built)}
        for c in CLASSES:
            out.setdefault(f"tbl_{c}", self._table_stub())
        return out

    # ---------------------------------------------------------------- steps

    def _sweep(self, cls: str, var_T, tbl, arrays, init=None):
        ep, ks, nb = self._dims[cls]
        pa = dict(arrays)
        pa["srcs" if self.packed else "exts"] = tbl
        return sweep_blocks(
            var_T, pa, bp=self.bp, ep=ep, kslots=ks, nblocks=nb,
            init=init, interpret=self.interpret, op=self.op,
            packed=self.packed, src_format=self.src_format,
            wks=self._wks[cls], out_dtype=self._grad_jnp,
        )

    def _shared_tails(self, g, sidx) -> dict:
        """ONE combined gather for every segs-phase tail (round-5 paired
        finding: each per-phase tail gather inside the segs concat costs a
        ~1.4 µs FIXED materialization on top of the ~1.5-1.7 ns/col payload
        — 6 phases × tiny tails paid ~8 µs of pure fixed cost).  Gathering
        all tails in one take pays the fixed cost once; per-phase pieces
        are static slices of the result (bitwise-identical values — same
        indices, same gather).  Returns {phase: (rows, t_len) piece}."""
        lay = self.layout
        ks = [k for k in range(lay.nphases)
              if (self._pack_modes[k] == "segs" and lay.tail_offs
                  and lay.tail_offs[k] is not None)]
        if len(ks) < 2:
            return {}       # a single tail gains nothing from combining
        idx_all = jnp.concatenate([
            jax.lax.slice(sidx[k], (lay.tail_offs[k][0],),
                          (lay.tail_offs[k][0] + lay.tail_offs[k][1],))
            for k in ks])
        W = self._pack_window
        tbl = (jax.lax.slice(g, (0, 0), (g.shape[0], W))
               if 0 < W <= g.shape[1] // 2 else g)
        all_t = jnp.take(tbl, idx_all, axis=1)
        # (an optimization_barrier pinning all_t as one materialized value
        # was measured a no-op here — 10.8 vs 9.8 µs chain without it; the
        # ~0.55 µs/phase fixed term is not gather re-fusion)
        out, off = {}, 0
        for k in ks:
            L = lay.tail_offs[k][1]
            out[k] = jax.lax.slice(all_t, (0, off), (g.shape[0], off + L))
            off += L
        return out

    def _segs_pieces(self, k, g, idx_k, tail_piece=None) -> list:
        """Phase k's UNSCALED segs-mode buffer pieces, padded to s_max:
        one static-length dynamic slice per big signature-group segment
        (per-shard starts from the send_idx lanes at the STATIC segment
        offsets), the small-group tail (one windowed gather, or the
        phase's slice of the step's combined tail — see _shared_tails),
        and a zero pad."""
        lay = self.layout
        rows_ = g.shape[0]
        pieces = [
            jax.lax.dynamic_slice(
                g, (jnp.int32(0), idx_k[off].astype(jnp.int32)),
                (rows_, L))
            for off, L in lay.seg_offs[k]]
        width = sum(L for _o, L in lay.seg_offs[k])
        tail = lay.tail_offs[k] if lay.tail_offs else None
        if tail is not None:
            t_off, t_len = tail
            if tail_piece is not None:
                pieces.append(tail_piece)
            else:
                W = self._pack_window
                tbl = (jax.lax.slice(g, (0, 0), (rows_, W))
                       if 0 < W <= g.shape[1] // 2 else g)
                pieces.append(jnp.take(
                    tbl, jax.lax.slice(idx_k, (t_off,), (t_off + t_len,)),
                    axis=1))
            width += t_len
        if width < lay.s_max:
            pieces.append(jnp.zeros((rows_, lay.s_max - width), g.dtype))
        return pieces

    def _segs_combined(self, g, send_idx, scales, dtype=None) -> dict:
        """ONE fused pack for every segs-mode phase (round-5): all phases'
        pieces concatenate into a single (rows, n·s_max) array — one XLA
        fusion instead of one per phase.  The per-phase concat measured a
        ~0.55 µs FIXED cost each (fake-phase rungs, BASELINE.md round 5);
        per-phase buffers become static slices of the combined array.
        Values are bitwise those of the per-phase path (same pieces, same
        elementwise multiply/cast).  Returns {phase: (rows, s_max) buf};
        empty unless pack_force == "combine" (MEASURED SLOWER than the
        per-phase default — the big concat materializes and each phase's
        slice copies out again; paired verdict in BASELINE.md round 5)."""
        lay = self.layout
        ks = [k for k in range(lay.nphases)
              if self._pack_modes[k] == "segs" and lay.perms[k]]
        if len(ks) < 2 or self.pack_force != "combine":
            return {}
        tails = self._shared_tails(g, send_idx)
        pieces, scs = [], []
        for k in ks:
            pieces += self._segs_pieces(k, g, send_idx[k], tails.get(k))
            scs.append(scales[k])
        big = jnp.concatenate(pieces, axis=1) * jnp.concatenate(scs)[None, :]
        if dtype is not None and big.dtype != dtype:
            big = big.astype(dtype)
        return {k: jax.lax.slice(big, (0, i * lay.s_max),
                                 (big.shape[0], (i + 1) * lay.s_max))
                for i, k in enumerate(ks)}

    def _pack_buf(self, k, g, idx_k, scale_k, dtype=None, tail_piece=None):
        """Phase k's packed send payload under the host-decided pack mode
        (see the _pack_modes note in __init__).  scale_k carries the mask
        (zeros on pad lanes), so the slice mode's over-read tail lanes and
        the zero mode's constant are exact.  dtype: wire precision (None =
        keep the multiply's dtype).  tail_piece: the phase's slice of the
        step's combined tail gather (_shared_tails) — replaces the
        per-phase take when provided."""
        lay = self.layout
        mode = self._pack_modes[k]
        if mode == "zero":
            out_dt = dtype if dtype is not None else jnp.promote_types(
                g.dtype, scale_k.dtype)
            return jnp.zeros((g.shape[0], lay.s_max), out_dt)
        if mode == "slice":
            buf = jax.lax.dynamic_slice(
                g, (jnp.int32(0), idx_k[0].astype(jnp.int32)),
                (g.shape[0], lay.s_max))
        elif mode == "segs":
            # one static-length dynamic slice per big signature-group
            # segment + the small-group TAIL (tlayout.tail_offs: the ~2%
            # multi-phase corner points, fragmented into tens of tiny
            # groups) packed by ONE windowed gather — a slice per tiny
            # group would blow up the graph (measured 13x dryrun wall at
            # 64-way).  This per-phase path is PRODUCTION; the
            # pack_force="combine" single-fusion variant measured slower
            # (BASELINE.md round 5).
            buf = jnp.concatenate(
                self._segs_pieces(k, g, idx_k, tail_piece), axis=1)
        else:
            W = self._pack_window
            tbl = g
            if 0 < W <= g.shape[1] // 2:
                # comm-first window: gather from the small front slice the
                # send points live in (see _pack_window note in __init__)
                tbl = jax.lax.slice(g, (0, 0), (g.shape[0], W))
            buf = jnp.take(tbl, idx_k, axis=1,
                           indices_are_sorted=self._pack_sorted[k])
        buf = buf * scale_k[None, :]
        if dtype is not None and buf.dtype != dtype:
            buf = buf.astype(dtype)         # pack-time cast: bytes halve on
                                            # the wire, unpack upcasts
        return buf

    def _exchange_start(self, g, send_idx, send_mask, dtype=None):
        """dtype: wire precision of the payload (None = carrier dtype).  The
        GRADIENT exchange passes self._halo_jnp (--halo-dtype); the VAR
        exchange leaves it None — state stays full precision."""
        bufs = []
        combined = self._segs_combined(g, send_idx, send_mask, dtype=dtype)
        tails = {} if combined else self._shared_tails(g, send_idx)
        for k, perm in enumerate(self.layout.perms):
            if not perm:
                bufs.append(None)
                continue
            # mask pad lanes so ghost-region padding is deterministic zeros
            if k in combined:
                buf = combined[k]
            else:
                buf = self._pack_buf(k, g, send_idx[k], send_mask[k],
                                     dtype=dtype, tail_piece=tails.get(k))
            bufs.append(jax.lax.ppermute(buf, AXIS, list(perm)))
        return bufs

    def _exchange_finish(self, g, bufs):
        lay = self.layout
        for k, buf in enumerate(bufs):
            if buf is None:
                continue
            g = jax.lax.dynamic_update_slice(
                g, buf.astype(g.dtype), (0, lay.ghost_start + k * lay.s_max))
        return g

    def step_fn(self, schedule: str = "overlap"):
        check(schedule in (*SCHEDULES, "nocomm"), "unknown schedule %r", schedule)
        if schedule not in self._step_cache:
            lay = self.layout

            def body(var_T, e_bulk, e_b, e_i, send_idx, send_mask, pack_scale,
                     dsts, srcs, pb, pbd, pi):
                v = var_T[0]
                sidx = send_idx[0]
                smask = send_mask[0]
                pscale = pack_scale[0]
                if schedule in ("bulk", "nocomm"):
                    g = self._sweep("bulk", v, e_bulk[0], _sq(pb))
                    if schedule == "bulk":
                        # bulk grads are already volume-scaled: mask only
                        bufs = self._exchange_start(g, sidx, smask,
                                                    dtype=self._halo_jnp)
                        g = self._exchange_finish(g, bufs)
                elif (schedule == "overlap" and self._has_comm
                      and self._ici_phases):
                    # full-overlap: fused interior sweep + in-kernel RDMA push
                    # for ICI phases; DCN (inter-slice) phases ride ppermute,
                    # fired BEFORE the fused kernel so XLA can hide them under
                    # the same interior compute
                    ici, dcn = self._ici_phases, self._dcn_phases
                    zeros = jnp.zeros((out_rows(self.op), lay.ndev),
                                      self._grad_jnp)
                    gb = self._sweep("boundary", v, e_b[0], _sq(pbd), init=zeros)
                    # boundary sums are UNSCALED; apply 1/V at pack time
                    # (then the --halo-dtype wire cast, if any)
                    gb_combined = self._segs_combined(
                        gb, sidx, pscale, dtype=self._halo_jnp)
                    gb_tails = ({} if gb_combined
                                else self._shared_tails(gb, sidx))

                    def pack(k):
                        # host-decided zero/slice/gather lowering per phase
                        # (_pack_modes) — the naive axis-1 take costs ~63 us
                        # per iteration at P=1 (transposed-copy + serial
                        # gather; see __init__ note).  Segs phases come from
                        # the combined single-fusion pack when >= 2 of them
                        if k in gb_combined:
                            return gb_combined[k]
                        return self._pack_buf(k, gb, sidx[k], pscale[k],
                                              dtype=self._halo_jnp,
                                              tail_piece=gb_tails.get(k))

                    dcn_out = {k: jax.lax.ppermute(pack(k), AXIS,
                                                   list(lay.perms[k]))
                               for k in dcn}
                    if self.overlap_debug == "nopack":
                        # attribution rung: constant sendbufs — removes the
                        # take-from-gb pack and the stack from the graph
                        sendbufs = jnp.zeros(
                            (len(ici), out_rows(self.op), lay.s_max),
                            self._halo_jnp)
                    elif self.overlap_debug == "packdep":
                        # attribution rung: constant buffer + ONE scalar read
                        # of gb — keeps the boundary→pack→kernel serial
                        # dependence, removes the gather/mul/stack work
                        sendbufs = (jnp.zeros(
                            (len(ici), out_rows(self.op), lay.s_max),
                            self._halo_jnp)
                            + (gb[0, 0] * 1e-30).astype(self._halo_jnp))
                    elif self.overlap_debug == "packflat":
                        # candidate fix: point-gather formulation — 2D
                        # advanced indexing lowers to slice_sizes={1,1}
                        # gather, which has no preferred operand layout, so
                        # XLA needs no 12MB transposed copy of gb (the cost
                        # the {24,1}-slice gather pays; see copy.9 note)
                        ridx = jnp.arange(gb.shape[0],
                                          dtype=jnp.int32)[:, None]
                        sendbufs = jnp.stack([
                            (gb[ridx, sidx[k][None, :]]
                             * pscale[k][None, :]).astype(self._halo_jnp)
                            for k in ici])
                    elif self.overlap_debug == "packslice":
                        # attribution rung: contiguous dynamic_slice instead
                        # of the 128-index take — same dependence, same
                        # mul/cast/stack, no gather lowering
                        sendbufs = jnp.stack([
                            (jax.lax.dynamic_slice(
                                gb, (0, 0), (gb.shape[0], lay.s_max))
                             * pscale[k][None, :]).astype(self._halo_jnp)
                            for k in ici])
                    else:
                        sendbufs = jnp.stack([pack(k) for k in ici])
                    # (an optimization_barrier pinning the packs before the
                    # fused kernel was measured a no-op here — paired 3.06x
                    # vs early with or without; XLA inserts no donation copy
                    # for gb despite the pack reading it)
                    sel = np.asarray(ici, np.int32)
                    ep, ks, nb = self._dims["interior"]
                    pa = dict(_sq(pi))
                    pa["srcs" if self.packed else "exts"] = e_i[0]
                    if self.overlap_debug == "splitgraph":
                        # attribution rung: the overlap STEP BODY with the
                        # ordinary sweep_blocks call instead of the fused
                        # kernel — at P=1 all-self phases recv == sendbufs,
                        # so this is semantically exact and isolates the
                        # fused pallas_call's operand-structure cost from
                        # the surrounding graph
                        g = self._sweep("interior", v, e_i[0], _sq(pi),
                                        init=gb)
                        recv = sendbufs
                    else:
                        g, recv = sweep_blocks_overlap(
                            v, pa, bp=self.bp, ep=ep, kslots=ks, nblocks=nb,
                            init=gb, sendbufs=sendbufs, dsts=dsts[0][sel],
                            srcs=srcs[0][sel],
                            interpret=self.interpret, op=self.op,
                            packed=self.packed, src_format=self.src_format,
                            wks=self._wks["interior"],
                            out_dtype=self._grad_jnp,
                            # nopack/noscatter are step-BODY rungs; the
                            # kernel itself runs in full production form
                            debug=(self.overlap_debug
                                   if self.overlap_debug in
                                   ("nobar", "nodma", "plain") else None),
                        )
                    if self.overlap_debug != "noscatter":
                        # (noscatter: attribution rung — skip the ghost-
                        # region update slices; ghosts stay stale)
                        for j, k in enumerate(ici):
                            g = jax.lax.dynamic_update_slice(
                                g, recv[j].astype(g.dtype),
                                (0, lay.ghost_start + k * lay.s_max))
                        for k in dcn:
                            g = jax.lax.dynamic_update_slice(
                                g, dcn_out[k].astype(g.dtype),
                                (0, lay.ghost_start + k * lay.s_max))
                else:  # early (or overlap with no comm / no ICI phase —
                       # a pure-DCN topology has nothing for the fused
                       # in-kernel RDMA path to carry)
                    zeros = jnp.zeros((out_rows(self.op), lay.ndev),
                                      self._grad_jnp)
                    gb = self._sweep("boundary", v, e_b[0], _sq(pbd), init=zeros)
                    bufs = self._exchange_start(gb, sidx, pscale,
                                                dtype=self._halo_jnp)
                    g = self._sweep("interior", v, e_i[0], _sq(pi), init=gb)
                    g = self._exchange_finish(g, bufs)
                return g[None]

            fn = _shard_map(
                body, self.mesh,
                in_specs=(P(AXIS),) * 12,
                out_specs=P(AXIS),
            )
            self._step_cache[schedule] = jax.jit(fn)
        return self._step_cache[schedule]

    def iter_args(self, state: dict) -> tuple:
        return (
            state["var_T"], state["tbl_bulk"], state["tbl_boundary"],
            state["tbl_interior"], self._send_idx, self._send_mask,
            self._pack_scale, self._dsts, self._srcs,
            self._plans_dev["bulk"], self._plans_dev["boundary"],
            self._plans_dev["interior"],
        )

    def step(self, state: dict, schedule: str = "overlap", **_kw):
        # the Pallas backend has no f64 'exact' mode (that is the XLA
        # GreenGaussModel's contract) — silently returning FMA-contracted
        # f32 to a caller who asked for the bit-gated semantics would be a
        # wrong-numeric-contract result with no error
        check(not _kw.get("exact"),
              "exact mode is the XLA backend's; use GreenGaussModel "
              "(--backend xla --dtype float64) for the bit-gated path")
        have = state.get("_classes", CLASSES)
        check(all(c in have for c in SCHEDULE_CLASSES.get(schedule, ())),
              "state carries table classes %r but schedule %r needs %r — "
              "distribute_state(schedules=...) must include it", have,
              schedule, SCHEDULE_CLASSES.get(schedule))
        return self.step_fn(schedule)(*self.iter_args(state))

    def iterate_fn(self, schedule: str, n: int, solver_mode: bool = False,
                   sweeps_per_step: int = 1, **_kw):
        """Chained n-iteration runner (see GreenGaussModel.iterate_fn).

        n is passed as a RUNTIME loop bound (fori_loop), so every n shares one
        compiled executable — kernel compiles are minutes-long on this stack.

        solver_mode=True times the FULL per-time-step dataflow of a real
        solver built on this framework: sweep → state update → var halo
        exchange → packed-source-table rebuild, all fused in one jit (the
        refresh_state path folded into the loop).  The proxy benchmark
        itself never does this — its timed iteration exchanges gradients
        over static state (SURVEY.md §4.2) — so this is reported as a
        separate row, never the headline.

        sweeps_per_step (solver mode only): gradient evaluations per table
        rebuild.  A real multi-stage solver (RK stages, multigrid smoothing)
        re-evaluates gradients more often than the state drifts enough to
        warrant a full source-table re-pack — the rebuild is the dominant
        per-step cost (BASELINE.md solver-mode attribution: ~4.3 ms/step is
        exts-gather + pack walls), so amortizing it over N sweeps is the one
        legitimate lever on that row.  Each step: rebuild tables once from
        the carried state, then N× (sweep incl. gradient exchange + toy
        state update), then one var halo exchange.  The intermediate sweeps
        intentionally read the step's tables (stale by the toy update) —
        exactly the staleness a stage-loop solver accepts.
        """
        check(not _kw.get("exact"),
              "exact mode is the XLA backend's; use GreenGaussModel")
        check(sweeps_per_step >= 1, "sweeps_per_step must be >= 1, got %d",
              sweeps_per_step)
        check(sweeps_per_step == 1 or solver_mode,
              "sweeps_per_step only applies to solver_mode (static "
              "iteration never rebuilds tables)")
        if solver_mode:
            return self._solver_iterate_fn(schedule, n,
                                           sweeps=int(sweeps_per_step))
        key = ("iterate", schedule)
        if key not in self._step_cache:
            step = self.step_fn(schedule)

            @jax.jit
            def run_n(n, var_T, e_bulk, e_b, e_i, send_idx, send_mask,
                      pack_scale, dsts, srcs, pb, pbd, pi):
                def body(_i, v):
                    g = step(v, e_bulk, e_b, e_i, send_idx, send_mask,
                             pack_scale, dsts, srcs, pb, pbd, pi)
                    return v + 1e-30 * g[:, :NV, :]

                return jax.lax.fori_loop(0, n, body, var_T)

            self._step_cache[key] = run_n
        runner = self._step_cache[key]
        needs = SCHEDULE_CLASSES.get(schedule, ())

        def checked(*args):
            # mirror step()'s friendly guard: a table class skipped at
            # distribute_state(schedules=...) arrives here as the
            # (P, 1, 1, 1, 1) stub and would otherwise die deep in the
            # Pallas trace with a BlockSpec shape error.  iter_args feeds
            # (var_T, e_bulk, e_b, e_i, ...) — check the three table slots.
            # (solver-mode runners rebuild their tables from var in-loop,
            # so only this static-iteration path needs the guard)
            tbls = {"bulk": args[1], "boundary": args[2], "interior": args[3]}
            for c in needs:
                check(tuple(tbls[c].shape[1:]) != (1, 1, 1, 1),
                      "state does not carry table class %r but schedule %r "
                      "needs it — distribute_state(schedules=...) must "
                      "include it", c, schedule)
            return runner(n, *args)

        return checked

    def _solver_iterate_fn(self, schedule: str, n: int, sweeps: int = 1):
        key = ("solver_iterate", schedule, sweeps)
        if key not in self._step_cache:
            step = self.step_fn(schedule)
            exch = self._var_exchange_fn()
            # rebuild ONLY the tables this schedule reads — the re-pack is
            # the dominant per-step cost (bulk sweep reads tbl_bulk alone;
            # early/overlap read boundary+interior)
            needed = (("bulk",) if schedule in ("bulk", "nocomm")
                      else ("boundary", "interior"))
            tables = self._build_tables_fn(needed)

            @jax.jit
            def run_n(n, var_T, e_bulk, e_b, e_i, send_idx, send_mask,
                      pack_scale, dsts, srcs, pb, pbd, pi):
                plans = {"bulk": pb, "boundary": pbd, "interior": pi}
                stub_tbl = {"bulk": e_bulk, "boundary": e_b, "interior": e_i}

                def body(_i, v):
                    # rebuild the needed tables at the TOP of the body from
                    # the carried var, so the loop carry is var_T alone
                    # (~28 MB) — carrying the packed tables (~200-400 MB)
                    # made XLA double-buffer them every iteration, which
                    # dominated the round-2 solver-mode step and explains
                    # its measured insensitivity to kernel/stream savings.
                    # Same math: tables are always built from the
                    # post-exchange state that feeds the sweep.
                    tb = dict(stub_tbl)
                    tb.update(zip(needed,
                                  tables(v, *[plans[c] for c in needed])))

                    def stage(_j, vs):
                        # one gradient evaluation (incl. its halo exchange)
                        # + toy update, against the STEP's tables — the
                        # multi-stage amortization (sweeps_per_step)
                        g = step(vs, tb["bulk"], tb["boundary"],
                                 tb["interior"], send_idx, send_mask,
                                 pack_scale, dsts, srcs, pb, pbd, pi)
                        return vs + 1e-30 * g[:, :NV, :]

                    v2 = (stage(0, v) if sweeps == 1
                          else jax.lax.fori_loop(0, sweeps, stage, v))
                    return exch(v2, send_idx, send_mask)

                return jax.lax.fori_loop(0, n, body, var_T)

            self._step_cache[key] = run_n
        runner = self._step_cache[key]
        return lambda *args: runner(n, *args)

    # ------------------------------------------------------------- gather

    def gather_global(self, stacked: jax.Array) -> np.ndarray:
        """Stacked result (P, rows, ndev) → global host array.

        gg: (N, nvar*3), column v*3+d (matches the XLA backend convention);
        flux: (N, nvar)."""
        arr = np.asarray(stacked)
        if arr.dtype not in (np.float32, np.float64):
            # bf16 grads (--grad-dtype) arrive as ml_dtypes arrays — widen
            # so downstream numpy comparisons behave
            arr = arr.astype(np.float32)
        N = sum(p.nowned for p in self.parts)
        if self.op == "flux":
            out = np.zeros((N, self.nvar), dtype=arr.dtype)
            for i, p in enumerate(self.parts):
                gids = p.global_ids[: p.nowned]
                out[gids] = arr[i, : self.nvar, : p.nowned].T
            return out
        out = np.zeros((N, self.nvar * 3), dtype=arr.dtype)
        for i, p in enumerate(self.parts):
            gids = p.global_ids[: p.nowned]
            for v in range(self.nvar):
                for d in range(3):
                    out[gids, v * 3 + d] = arr[i, d * NV + v, : p.nowned]
        return out


class PSDFluxModel(GreenGaussPallas):
    """Secondary model family: the upwind PSD-style flux kernel
    (`compute_psd_flux` / `flux.c` analogue; see ops/flux.py for the spec)."""

    def __init__(self, parts, nvar, **kw):
        super().__init__(parts, nvar, op="flux", **kw)
