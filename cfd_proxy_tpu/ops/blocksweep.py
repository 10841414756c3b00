"""Block-local Pallas sweeps — the production TPU kernels for the hot loop.

This is the speed-of-light path for `compute_gradients_gg` (reference
`gradients.c`, SURVEY.md §4.3).  Measured on v5e, XLA's gather/scatter run at
19 GB/s / 3 GB/s against a 782 GB/s streaming ceiling, so the entire sweep is
done inside one Pallas kernel over VMEM-sized point blocks with NO scatters
and no large-table gathers.

Layout (everything transposed, "SoA-T"):
    var_T  (NV, npoint_dev)   — state, NV = nvar padded to 8 sublanes
    grad_T (3*NV, npoint_dev) — output, row d*NV+v

Preprocessing (host, this module) groups the 2F directed incidences
(slot = one face endpoint) by destination point, orders each point's slots by
incidence id (golden summation order), and blocks points into BP-column
groups.  Per block:
    slot_idx (K, BP)    W-index of the *other* endpoint of each slot
    slot_w   (K, 3, BP) sign × face normal (±n_f), zero on padding
    ext_idx  (EP,)      device columns gathered into the block table
    scale    (1, BP)    1/V at owned points (volume scaling fused), 0 on pad
The block table is tbl = [own columns | ext columns] (NV, W = BP+EP).

Two kernel formulations share this metadata:

PACKED (production): the per-slot SOURCE VALUES are pre-gathered into
    slot_src (K, NV, BP) once per state update (the benchmark's timed
    iteration exchanges GRADIENTS over a static state — SURVEY.md §4.2 —
    so the state-side gather is setup cost, exactly like the ext tables).
    The hot kernel is then pure stream+FMA: per slot,
    acc += w_k ⊙ 0.5·(own + slot_src[k]) — ZERO in-kernel gathers, memory
    bound by construction.  Costs K×NV×4 bytes/point of extra stream.

GATHER (memory-lean cross-check): gathers sources in-kernel.  The
    destination endpoint is lane-ALIGNED (slots are directed), so each slot
    needs ONE gather; Mosaic's `tpu.dynamic_gather` shuffles within a single
    128-lane vreg only, so the gather over W lanes is decomposed into W/128
    masked passes with the vreg id (idx>>7) / in-vreg offset (idx&127)
    hoisted out of the pass loop.  Round-1 measurement: the per-slot gather
    issue cost (~10 cy) dominates and is VPU-bound ~4× off the memory floor
    — which is why PACKED exists.  (A dynamic per-(block,slot,tile) pass
    skip via lax.cond was tried and is 13x SLOWER — scalar branches stall
    the vector pipeline.)

Accumulating on top of a previous grad (input_output_aliases) makes
boundary-kernel ∘ interior-kernel == bulk kernel, the schedule-equivalence
property (SURVEY.md §5.8).  A scalar-prefetch block list restricts a kernel
to the blocks a face class actually touches (the rangelist-stage analogue).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfd_proxy_tpu.utils.errors import check
from cfd_proxy_tpu.utils import round_up

LANE = 128
NV = 8          # padded variable count (sublane tile for f32)




@dataclass
class BlockPlan:
    """Host-side block metadata for one face class on one shard."""

    npoint_dev: int            # padded device point count (multiple of BP)
    bp: int                    # points per block
    ep: int                    # ext columns per block (multiple of 128)
    kslots: int                # max slots per point (uniform)
    nblocks: int               # blocks in this plan's block list
    block_ids: np.ndarray      # (nblocks,) i32 — device block index per grid step
    slot_idx: np.ndarray       # (nblocks, K, BP) i32 — W-index of other endpoint
    slot_w: np.ndarray         # (nblocks, K, 3, BP) f32 — ± normals
    ext_idx: np.ndarray        # (nblocks, EP) i32 — device columns to gather
    scale: np.ndarray          # (nblocks, 1, BP) f32 — 1/V (fused), 0 on pad
    ext_cnt: np.ndarray | None = None  # (nblocks,) i32 — REAL ext columns per
                               # block (≤ EP, which is the max padded up);
                               # lets gather-style kernels bound their pass
                               # loops per block instead of scanning all EP


def build_block_plan(
    faces: np.ndarray,         # (F, 2) device point columns
    normals: np.ndarray,       # (F, 3)
    npoint_dev: int,           # multiple of bp
    inv_scale: np.ndarray,     # (npoint_dev,) — 1/V at owned, 0 elsewhere
    *,
    bp: int = 256,
    face_sel: np.ndarray | None = None,   # bool (F,) — restrict to a face class
    all_blocks: bool = False,  # keep every block in the grid even if empty
    pads: tuple[int, int] | None = None,  # (ep, kslots) forced paddings
    dst_lt: int | None = None,  # drop slots whose DESTINATION column is
                               # >= this bound.  Used with dst_lt = nowned to
                               # drop ghost-destination slots: their sums are
                               # dead by construction (scale 0 at ghosts /
                               # overwritten by the halo unpack), and carrying
                               # them wastes stream, inflates kslots/ext
                               # lists, and blunts the compact prefix widths
                               # (the ghost region cannot be degree-sorted).
) -> BlockPlan:
    check(npoint_dev % bp == 0, "npoint_dev %d not a multiple of bp %d", npoint_dev, bp)
    check(bp % LANE == 0, "bp must be a multiple of 128")
    native = _build_block_plan_native(
        faces, normals, npoint_dev, inv_scale, bp, face_sel, all_blocks, pads,
        dst_lt,
    )
    if native is not None:
        return native
    F = faces.shape[0]
    if face_sel is None:
        fsel = np.arange(F)
    else:
        fsel = np.flatnonzero(face_sel)
    f = faces[fsel]
    n = normals[fsel]

    # directed incidences: destination point, other endpoint, ±normal, order
    dst = np.concatenate([f[:, 0], f[:, 1]])
    oth = np.concatenate([f[:, 1], f[:, 0]])
    sgn = np.concatenate([np.ones(len(f)), -np.ones(len(f))])
    w = sgn[:, None] * np.concatenate([n, n], axis=0)          # (2Fs, 3)
    inc_id = np.concatenate([2 * fsel, 2 * fsel + 1])          # golden order
    if dst_lt is not None:
        keep = dst < dst_lt
        dst, oth, w, inc_id = dst[keep], oth[keep], w[keep], inc_id[keep]

    blk = dst // bp
    nblk_total = npoint_dev // bp
    if all_blocks:
        blocks = np.arange(nblk_total)
    else:
        blocks = np.unique(blk) if blk.size else np.zeros(1, np.int64)
    nblocks = len(blocks)
    blk_pos = np.full(nblk_total, -1, np.int64)
    blk_pos[blocks] = np.arange(nblocks)

    # per-point slot assignment, slots ordered by incidence id
    order = np.lexsort((inc_id, dst))
    dst_s, oth_s, w_s = dst[order], oth[order], w[order]
    counts = np.bincount(dst_s, minlength=npoint_dev)
    kmax = int(counts.max()) if counts.size else 0
    starts = np.zeros(npoint_dev + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot_of = np.arange(dst_s.size) - starts[dst_s]

    # per-block ext lists: other endpoints outside the block
    lane = dst_s % bp
    b_of = blk_pos[dst_s // bp]
    own_lo = (dst_s // bp) * bp
    is_ext = (oth_s < own_lo) | (oth_s >= own_lo + bp)

    ext_lists: list[np.ndarray] = []
    ext_max = 0
    for bi, b in enumerate(blocks):
        sel = (b_of == bi) & is_ext
        uniq = np.unique(oth_s[sel])
        ext_lists.append(uniq)
        ext_max = max(ext_max, len(uniq))
    ep = round_up(max(ext_max, 1), LANE)
    if pads is not None:
        check(pads[0] >= ep, "pads ep %d < required %d", pads[0], ep)
        check(pads[1] >= kmax, "pads kslots %d < required %d", pads[1], kmax)
        ep, kmax = pads
    kmax = max(kmax, 1)

    slot_idx = np.zeros((nblocks, kmax, bp), np.int32)
    slot_w = np.zeros((nblocks, kmax, 3, bp), np.float32)
    ext_idx = np.zeros((nblocks, ep), np.int32)
    scale = np.zeros((nblocks, 1, bp), np.float32)
    for bi, b in enumerate(blocks):
        scale[bi, 0, :] = inv_scale[b * bp : (b + 1) * bp]
        ext = ext_lists[bi]
        ext_idx[bi, : len(ext)] = ext
        sel = b_of == bi
        if not sel.any():
            continue
        o = oth_s[sel]
        # W-index: own columns at o - b*bp; ext columns at bp + rank
        local = o - b * bp
        ext_rank = np.searchsorted(ext, o)
        widx = np.where((local >= 0) & (local < bp), local, bp + ext_rank)
        slot_idx[bi, slot_of[sel], lane[sel]] = widx.astype(np.int32)
        slot_w[bi, slot_of[sel], :, lane[sel]] = w_s[sel].astype(np.float32)

    return BlockPlan(
        npoint_dev=npoint_dev, bp=bp, ep=ep, kslots=kmax, nblocks=nblocks,
        block_ids=blocks.astype(np.int32), slot_idx=slot_idx, slot_w=slot_w,
        ext_idx=ext_idx, scale=scale,
        ext_cnt=np.array([len(e) for e in ext_lists], np.int32),
    )


def prefix_widths(slot_w: np.ndarray, bp: int) -> tuple[int, ...]:
    """Static per-slot lane widths for the COMPACT packed layout.

    slot_w: host array (..., K, 3, bp).  Width of slot k = max over all
    leading dims (shards × blocks) of (last lane with a nonzero weight + 1),
    rounded up to the 128-lane vreg.  CORRECT for any point order — a slot's
    active lanes always sit inside its prefix because per-point slot counts
    are contiguous from k=0 (a point of degree d uses slots 0..d-1, so slot
    k's active lane set shrinks monotonically with k).  The WIDTHS need not
    be monotone, though: a slot serving only zero-normal (degenerate) faces
    stores all-zero weights and can measure narrower than a later slot, so
    consumers must treat wks per-slot (the packed layout does by
    construction; the gather kernel's tile skip enumerates live slots
    explicitly).  TIGHT when points are
    degree-sorted within each block (mesh/partition.py::rcb_owned_order
    degree_sort=True), which concentrates high-degree points in the leading
    lanes.  On the benchmark mesh (2.8M faces, bp=4096) this cuts the
    srcs+slot_w streams 19.5%: T_k tiles = [32,32,32,32,32,32,12,2]."""
    a = np.asarray(slot_w)
    K = a.shape[-3]
    nz = (a.reshape(-1, K, 3, bp) != 0).any(axis=2)           # (R, K, bp)
    has = nz.any(axis=2)                                      # (R, K)
    last = bp - 1 - nz[:, :, ::-1].argmax(axis=2)
    w = np.where(has, last + 1, 0).max(axis=0) if nz.shape[0] else \
        np.zeros(K, np.int64)                                 # (K,)
    w = (w + LANE - 1) // LANE * LANE
    if w.sum() == 0:
        w[0] = LANE     # degenerate all-empty class: keep one inert chunk
    return tuple(int(x) for x in w)


def compact_len(wks: tuple[int, ...]) -> int:
    return int(sum(wks))


def compact_slot_w(slot_w: np.ndarray, wks: tuple[int, ...]) -> np.ndarray:
    """(..., K, 3, bp) → (..., 3, L) prefix-compacted weights (host)."""
    K = slot_w.shape[-3]
    check(K == len(wks), "wks length %d != kslots %d", len(wks), K)
    parts = [slot_w[..., k, :, :w] for k, w in enumerate(wks) if w]
    return np.concatenate(parts, axis=-1)


def compact_srcs(srcs, wks: tuple[int, ...]):
    """(nb, K, NV, bp) slot sources → (nb, NV, L) compact (XLA reference for
    pack_srcs' compact output; tests/microbenches)."""
    parts = [srcs[:, k, :, :w] for k, w in enumerate(wks) if w]
    return jnp.concatenate(parts, axis=-1)


def slot_src_cols(plan: BlockPlan) -> np.ndarray:
    """Resolve each slot's W-index to its DEVICE column: (nblocks, K, BP) i32.

    Own-table entries (widx < bp) live at block_base + widx; ext entries at
    ext_idx[b, widx - bp].  Padding slots resolve to some valid column — their
    zero weight kills the contribution exactly.  This is the index set the
    PACKED formulation pre-gathers at state-distribution time."""
    nb, K, bp = plan.slot_idx.shape
    base = plan.block_ids.astype(np.int64)[:, None, None] * bp
    widx = plan.slot_idx.astype(np.int64)
    own = base + widx
    ext = np.take_along_axis(
        plan.ext_idx.astype(np.int64)[:, None, :],
        np.clip(widx - bp, 0, plan.ep - 1),
        axis=2,
    )
    return np.where(widx < bp, own, ext).astype(np.int32)


def _build_block_plan_native(faces, normals, npoint_dev, inv_scale, bp,
                             face_sel, all_blocks, pads,
                             dst_lt=None) -> BlockPlan | None:
    """Native (C++) fast path — same semantics as the NumPy construction.

    Built by `make -C native`; returns None (→ NumPy fallback) if absent."""
    import ctypes

    from cfd_proxy_tpu.native import lib, ptr

    L = lib()
    if L is None:
        return None
    faces_c = np.ascontiguousarray(faces, np.int32)
    normals_c = np.ascontiguousarray(normals, np.float64)
    F = faces_c.shape[0]
    sel = (None if face_sel is None
           else np.ascontiguousarray(face_sel, np.uint8))
    sel_p = None if sel is None else ptr(sel, ctypes.c_uint8)
    nblk_total = npoint_dev // bp
    dlt = npoint_dev if dst_lt is None else int(dst_lt)
    kmax = ctypes.c_int32(0)
    extmax = ctypes.c_int32(0)
    touched = np.zeros(nblk_total, np.uint8)
    rc = L.cfd_plan_sizes(
        ptr(faces_c, ctypes.c_int32), F, sel_p, npoint_dev, bp, dlt,
        ctypes.byref(kmax), ctypes.byref(extmax), ptr(touched, ctypes.c_uint8),
    )
    check(rc == 0, "cfd_plan_sizes failed rc=%d", rc)
    ep = round_up(max(int(extmax.value), 1), LANE)
    ks = max(int(kmax.value), 1)
    if pads is not None:
        check(pads[0] >= ep, "pads ep %d < required %d", pads[0], ep)
        check(pads[1] >= ks, "pads kslots %d < required %d", pads[1], ks)
        ep, ks = pads

    if all_blocks:
        blocks = np.arange(nblk_total)
    else:
        blocks = np.flatnonzero(touched)
        if blocks.size == 0:
            blocks = np.zeros(1, np.int64)
    # the C fill writes COMPACT rows via this map — a sparse face class on a
    # big padded shard allocates only its touched blocks, like the NumPy path
    blk_pos = np.full(nblk_total, -1, np.int32)
    blk_pos[blocks] = np.arange(len(blocks), dtype=np.int32)
    nrows = len(blocks)
    slot_idx = np.zeros((nrows, ks, bp), np.int32)
    slot_w = np.zeros((nrows, ks, 3, bp), np.float32)
    ext_idx = np.zeros((nrows, ep), np.int32)
    ext_cnt = np.zeros(nrows, np.int32)
    rc = L.cfd_plan_fill(
        ptr(faces_c, ctypes.c_int32), F, ptr(normals_c, ctypes.c_double),
        sel_p, npoint_dev, bp, dlt, ks, ep, ptr(blk_pos, ctypes.c_int32),
        ptr(slot_idx, ctypes.c_int32), ptr(slot_w, ctypes.c_float),
        ptr(ext_idx, ctypes.c_int32), ptr(ext_cnt, ctypes.c_int32),
    )
    check(rc == 0, "cfd_plan_fill failed rc=%d", rc)

    scale = np.zeros((nrows, 1, bp), np.float32)
    for bi, b in enumerate(blocks):
        scale[bi, 0, :] = inv_scale[b * bp : (b + 1) * bp]
    return BlockPlan(
        npoint_dev=npoint_dev, bp=bp, ep=ep, kslots=ks, nblocks=nrows,
        block_ids=blocks.astype(np.int32),
        slot_idx=slot_idx, slot_w=slot_w,
        ext_idx=ext_idx, scale=scale, ext_cnt=ext_cnt,
    )


# ------------------------------------------------------------------ kernel

def out_rows(op: str) -> int:
    """Output row count: gradients are (3, NV) planes, fluxes (NV,)."""
    return 3 * NV if op == "gg" else NV


def _masked_gather(tbl, idx, npass):
    """Gather one 128-lane tile from the (NV, W) block table: W spans npass
    vregs, Mosaic's dynamic_gather shuffles within ONE vreg, so the gather
    decomposes into npass compare+gather+select passes with the vreg id
    (idx>>7) / in-vreg offset (idx&127) hoisted out of the pass loop.
    Shared by the GATHER sweep kernels and the pack_srcs re-pack — the
    W-index layout must stay identical between them."""
    hi = jnp.broadcast_to((idx >> 7)[None, :], (NV, LANE))
    lo = jnp.broadcast_to((idx & 127)[None, :], (NV, LANE))
    gat = jnp.zeros((NV, LANE), jnp.float32)
    for j in range(npass):
        tbl_j = tbl[:, j * LANE : (j + 1) * LANE]
        g_j = jnp.take_along_axis(tbl_j, lo, axis=1)
        gat = jnp.where(hi == j, g_j, gat)
    return gat


# NOTE — dynamic per-block pass bounds are a MEASURED DEAD END (round 2):
# a fori_loop over ext passes with a runtime trip count (128-aligned dynamic
# ref loads; dynamic_slice on a VALUE does not lower at all) Mosaic-compiles
# but runs 5.7× SLOWER than the static unroll (33.3 vs 5.8 ms solver-mode
# step) — loop control serializes the kernel, echoing the lax.cond lesson.
# And the upside was nil: after the RCB relabel the model's per-class ext
# counts cluster tightly (545-680 of ep 768 at 2.8M faces), so the static
# pass count is already near the per-block optimum.  BlockPlan.ext_cnt is
# kept as HOST-side geometry metadata only.


def _block_compute(bp: int, ep: int, kslots: int, accumulate: bool, op: str,
                   wks: tuple[int, ...] | None = None):
    """Shared per-block compute body (used by the sweep and overlap kernels).

    wks (compact prefix widths, --kcompact with the GATHER kernel): tile t
    skips slot k entirely when wks[k] <= t*128 — with degree-sorted blocks
    every lane of that tile has a zero weight there, so the gather+FMA is
    provably inert.  The slot tables stay full rectangles (the gather kernel
    is VPU-bound on gather issue, not on the idx/weight streams); only the
    ~20% dead (tile, slot) pairs drop out of the unrolled loop."""
    npass = (bp + ep) // LANE
    ntile = bp // LANE
    rows = out_rows(op)

    def compute(own_ref, ext_ref, sidx_ref, sw_ref, scale_ref, init_ref,
                out_ref):
        tbl = jnp.concatenate([own_ref[:], ext_ref[0]], axis=1)  # (NV, W)
        for t in range(ntile):
            own_tile = own_ref[:, t * LANE : (t + 1) * LANE]      # (NV, 128)

            # K loop statically unrolled: Mosaic cannot dynamically index the
            # sublane axis of the slot tables ("unaligned dynamic load").
            # Accumulation SEEDS from init (boundary sums) so the composed
            # boundary∘interior chain adds slots in exactly the bulk order —
            # the bit-equality-of-schedules invariant (SURVEY.md §4b).
            if accumulate:
                acc = init_ref[:, t * LANE : (t + 1) * LANE].astype(
                    jnp.float32)
            else:
                acc = jnp.zeros((rows, LANE), jnp.float32)
            # enumerate the exact live slots rather than assuming wks is
            # monotone non-increasing: widths are per-slot maxima of the
            # last NONZERO weight, and a slot serving only degenerate
            # (zero-normal) faces can be narrower than a later slot —
            # a first-kt prefix loop would then skip a live slot
            live = (range(kslots) if wks is None
                    else [k for k, wk in enumerate(wks) if wk > t * LANE])
            for k in live:
                idx = sidx_ref[0, k, t * LANE : (t + 1) * LANE]   # (128,)
                gat = _masked_gather(tbl, idx, npass)
                wk = sw_ref[0, k, :, t * LANE : (t + 1) * LANE].astype(
                    jnp.float32)                                  # (3, 128)
                if op == "gg":
                    avg = 0.5 * (own_tile + gat)                  # (NV, 128)
                    acc = acc + (wk[:, None, :] * avg[None, :, :]).reshape(
                        rows, LANE)
                else:  # upwind flux (ops/flux.py directed-slot form)
                    udw = jnp.sum(own_tile[:3] * wk, axis=0)      # (128,)
                    uow = jnp.sum(gat[:3] * wk, axis=0)
                    a = jnp.maximum(jnp.abs(udw), jnp.abs(uow))
                    acc = acc + 0.5 * (udw[None, :] * own_tile
                                       + uow[None, :] * gat) \
                        - 0.5 * a[None, :] * (gat - own_tile)
            acc = acc * scale_ref[0, 0, t * LANE : (t + 1) * LANE][None, :]
            out_ref[:, t * LANE : (t + 1) * LANE] = acc.astype(out_ref.dtype)

    return compute


def _block_compute_packed(bp: int, kslots: int, accumulate: bool, op: str,
                          src_format: str = "f32",
                          wks: tuple[int, ...] | None = None):
    """Per-block compute for the PACKED formulation: sources pre-gathered
    into src_ref (1, K, NV, BP) — pure stream + FMA, no in-kernel gathers.

    Slot-k accumulation order matches the gather kernel's (same per-lane
    summation order; schedule composition stays order-identical).

    slot_w may arrive in bf16 (--meta-dtype bf16: halves the weight stream;
    ~1e-3 relative error bound, see models/gradients_pallas.py) — weights
    are upcast to f32 before the FMA either way.

    src_format "bf16d" stores DELTAS src−own in bf16 (--src-dtype bfloat16):
    the srcs stream — the largest of the kernel's streams — halves, measured
    ~17% faster end to end (paired kbench, BASELINE.md).  Deltas rather than
    raw values because the Green-Gauss signal IS the neighbor delta (the
    own·Σw term cancels over closed dual cells), so bf16 rounding scales
    with |src−own| and the gradient keeps a ~1e-3 relative bound instead of
    the ~1e-2 that bf16 raw state would give.

    wks (COMPACT layout, --kcompact): slot k's sources/weights occupy only a
    static lane PREFIX of width wks[k] ≤ bp (src_ref (1, NV, L) and sw_ref
    (1, 3, L), L = Σwks, chunk k at lane offset Σ_{j<k}wks[j]).  With points
    degree-sorted within blocks this drops the ~21% inert padding slots from
    the two dominant streams (prefix_widths).  All offsets/widths are static
    — no dynamic control flow (the measured 5.7×-loss dead end) anywhere.
    Dropped lanes carried exactly-zero weights, so per-point sums are
    unchanged (each remaining slot adds the same term in the same order)."""
    rows = out_rows(op)

    def compute(own_ref, src_ref, sw_ref, scale_ref, init_ref, out_ref):
        # dtype-agnostic own read: a no-op cast for f32 var_T; enables the
        # bf16-state experiment (kbench var16 variant) where deltas are
        # packed against the QUANTIZED own so the own·Σw rounding cancels
        # over closed dual cells exactly like the f32 case
        own = own_ref[:].astype(jnp.float32)                  # (NV, bp)
        if accumulate:
            # init may be bf16 (--grad-dtype bfloat16); accumulate in f32
            acc = init_ref[:].astype(jnp.float32)
        else:
            acc = jnp.zeros((rows, bp), jnp.float32)
        off = 0
        for k in range(kslots):
            if wks is None:
                w, own_k = bp, own
                src_k = src_ref[0, k]                         # (NV, bp)
                wk = sw_ref[0, k].astype(jnp.float32)         # (3, bp)
            else:
                w = wks[k]
                if w == 0:
                    continue
                own_k = own if w == bp else own[:, :w]
                src_k = src_ref[0, :, off:off + w]            # (NV, w)
                wk = sw_ref[0, :, off:off + w].astype(jnp.float32)
                off += w
            if op == "gg":
                if src_format == "bf16d":
                    avg = own_k + 0.5 * src_k.astype(jnp.float32)  # src − own
                else:
                    avg = 0.5 * (own_k + src_k)
                contrib = (wk[:, None, :] * avg[None, :, :]).reshape(rows, w)
            else:  # upwind flux (ops/flux.py directed-slot form)
                if src_format == "bf16d":
                    gat = own_k + src_k.astype(jnp.float32)
                else:
                    gat = src_k
                udw = jnp.sum(own_k[:3] * wk, axis=0)         # (w,)
                uow = jnp.sum(gat[:3] * wk, axis=0)
                a = jnp.maximum(jnp.abs(udw), jnp.abs(uow))
                contrib = 0.5 * (udw[None, :] * own_k + uow[None, :] * gat) \
                    - 0.5 * a[None, :] * (gat - own_k)
            if w == bp:
                acc = acc + contrib
            else:
                # prefix-only accumulate.  NOT acc.at[:, :w].add(...): that
                # lowers to scatter-add, which Mosaic does not implement —
                # a lane-aligned concat of (updated prefix, untouched
                # suffix) is pure vector ops
                acc = jnp.concatenate([acc[:, :w] + contrib, acc[:, w:]],
                                      axis=1)
        out_ref[:] = (acc * scale_ref[0, 0][None, :]).astype(out_ref.dtype)

    return compute


def _sweep_kernel(bp: int, ep: int, kslots: int, accumulate: bool, op: str,
                  packed: bool, src_format: str = "f32",
                  wks: tuple[int, ...] | None = None):
    if packed:
        compute = _block_compute_packed(bp, kslots, accumulate, op,
                                        src_format, wks)

        def kernel(bids_ref, own_ref, src_ref, sw_ref, scale_ref, *rest):
            if accumulate:
                init_ref, out_ref = rest
            else:
                init_ref, (out_ref,) = None, rest
            compute(own_ref, src_ref, sw_ref, scale_ref, init_ref, out_ref)

        return kernel

    compute = _block_compute(bp, ep, kslots, accumulate, op, wks)

    def kernel(bids_ref, own_ref, ext_ref, sidx_ref, sw_ref,
               scale_ref, *rest):
        if accumulate:
            init_ref, out_ref = rest
        else:
            init_ref, (out_ref,) = None, rest
        compute(own_ref, ext_ref, sidx_ref, sw_ref, scale_ref, init_ref,
                out_ref)

    return kernel


def sweep_blocks(
    var_T: jax.Array,            # (NV, npoint_dev) f32
    plan_arrays: dict,           # device arrays of a BlockPlan (see below)
    *,
    bp: int,
    ep: int,
    kslots: int,
    nblocks: int,
    init: jax.Array | None = None,   # (rows, npoint_dev) to accumulate onto
    interpret: bool = False,
    op: str = "gg",                  # "gg" gradients | "flux" upwind flux
    packed: bool = False,            # PACKED formulation (see module doc)
    src_format: str = "f32",         # f32 | bf16d (bf16 deltas; packed only)
    wks: tuple[int, ...] | None = None,  # COMPACT prefix widths (packed only)
    out_dtype=jnp.float32,           # f32 | bf16 gradient store (--grad-dtype)
) -> jax.Array:
    """Run the block sweep; returns (out_rows(op), npoint_dev).

    plan_arrays keys: block_ids (nblocks,), slot_w, scale, plus per
    formulation: gather — exts (nblocks, NV, EP) pre-gathered ext columns +
    slot_idx; packed — srcs (nblocks, K, NV, BP) pre-gathered slot sources
    (f32 values, or bf16 deltas vs own for src_format="bf16d").  Both
    pre-gathers are setup-time (var is static across benchmark iterations;
    see models/gradients.py).

    wks (packed only): COMPACT layout — srcs (nblocks, NV, L) and slot_w
    (nblocks, 3, L), L = Σ wks; see _block_compute_packed.

    out_dtype: dtype of the STORED gradient planes (accumulation stays f32
    in-kernel; only the final per-block store rounds).  bf16 shrinks the
    largest remaining f32 stream — the (3·NV, npts) output — by half; with
    accumulate (schedule composition) the boundary sums round once at the
    boundary-sweep store and are upcast back to f32 before the interior
    slots accumulate, so the extra error stays ~1 output rounding (~4e-3
    rel) rather than compounding per slot.  init must match out_dtype
    (they alias).
    """
    npoint_dev = var_T.shape[1]
    accumulate = init is not None
    if accumulate and init.dtype != jnp.dtype(out_dtype):
        raise ValueError(
            f"init dtype {init.dtype} must match out_dtype "
            f"{jnp.dtype(out_dtype)} (aliased buffers)")
    rows = out_rows(op)
    # wks with packed=True selects the COMPACT table layout; with the gather
    # formulation it only skips the dead (tile, slot) pairs in the unrolled
    # loops (tables stay rectangular — _block_compute docstring)
    kernel = _sweep_kernel(bp, ep, kslots, accumulate, op, packed, src_format,
                           wks)

    def bid(i, bids):
        return bids[i]

    if packed and wks is not None:
        L = compact_len(wks)
        in_specs = [
            pl.BlockSpec((NV, bp), lambda i, bids: (0, bid(i, bids)),
                         memory_space=pltpu.VMEM),                   # own
            pl.BlockSpec((1, NV, L), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # srcs
            pl.BlockSpec((1, 3, L), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # slot_w
            pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # scale
        ]
        args = [
            var_T,
            plan_arrays["srcs"],
            plan_arrays["slot_w"],
            plan_arrays["scale"],
        ]
    elif packed:
        in_specs = [
            pl.BlockSpec((NV, bp), lambda i, bids: (0, bid(i, bids)),
                         memory_space=pltpu.VMEM),                   # own
            pl.BlockSpec((1, kslots, NV, bp), lambda i, bids: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),                   # srcs
            pl.BlockSpec((1, kslots, 3, bp), lambda i, bids: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),                   # slot_w
            pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # scale
        ]
        args = [
            var_T,
            plan_arrays["srcs"],
            plan_arrays["slot_w"],
            plan_arrays["scale"],
        ]
    else:
        in_specs = [
            pl.BlockSpec((NV, bp), lambda i, bids: (0, bid(i, bids)),
                         memory_space=pltpu.VMEM),                   # own
            pl.BlockSpec((1, NV, ep), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # exts
            pl.BlockSpec((1, kslots, bp), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # slot_idx
            pl.BlockSpec((1, kslots, 3, bp), lambda i, bids: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),                   # slot_w
            pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # scale
        ]
        args = [
            var_T,
            plan_arrays["exts"],
            plan_arrays["slot_idx"],
            plan_arrays["slot_w"],
            plan_arrays["scale"],
        ]
    out_spec = pl.BlockSpec((rows, bp), lambda i, bids: (0, bid(i, bids)),
                            memory_space=pltpu.VMEM)
    if accumulate:
        in_specs.append(
            pl.BlockSpec((rows, bp), lambda i, bids: (0, bid(i, bids)),
                         memory_space=pltpu.VMEM)
        )
        args.append(init)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    kwargs = {}
    if accumulate:
        # alias init (last operand; index counts the scalar-prefetch operand
        # at 0, then the tensor inputs) with the output buffer so untouched
        # blocks keep their prior values
        kwargs["input_output_aliases"] = {len(args): 0}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, npoint_dev), out_dtype),
        interpret=interpret,
        **kwargs,
    )(plan_arrays["block_ids"], *args)


def sweep_blocks_overlap(
    var_T: jax.Array,            # (NV, npoint_dev) f32
    plan_arrays: dict,           # interior-class BlockPlan device arrays
    *,
    bp: int,
    ep: int,
    kslots: int,
    nblocks: int,
    init: jax.Array,             # (rows, ndev) — the boundary-sweep result
    sendbufs: jax.Array,         # (nphases, rows, s_max) — packed halo pushes
    dsts: jax.Array,             # (nphases,) i32 dest device per phase
                                 # (self for idle devices; see tlayout)
    srcs: jax.Array,             # (nphases,) i32 src device per phase
    interpret: bool = False,
    op: str = "gg",
    packed: bool = False,
    src_format: str = "f32",
    wks: tuple[int, ...] | None = None,  # COMPACT prefix widths (packed only)
    out_dtype=jnp.float32,           # grad store dtype (see sweep_blocks)
    debug: str | None = None,        # fixed-cost attribution knobs (P=1
                                     # self-send timing ONLY — results are
                                     # wrong/unsynchronized at P>1):
                                     # "nobar" skips the readiness barrier
                                     # (collective_id dropped — correct at
                                     # P=1 where sender==receiver);
                                     # "nodma" also skips the RDMA
                                     # start/waits (recv stays its zero
                                     # alias — measures the fused kernel's
                                     # own structural cost);
                                     # "plain" strips the kernel to a bare
                                     # pallas_call — no semaphore scratch,
                                     # no has_side_effects, no collective
                                     # machinery at all; only the operand
                                     # set and the two aliased outputs
                                     # remain (bisects operand/alias cost
                                     # from the side-effect/scratch cost)
) -> tuple[jax.Array, jax.Array]:
    """FUSED interior sweep + one-sided halo push — the GASPI analogue.

    The reference's signature mechanism (SURVEY.md §4.3/§4.5): sends fire from
    INSIDE the compute loop once the halo data is final, and communication is
    hidden under interior compute.  Here: the packed boundary-gradient buffers
    are pushed to partner devices with `make_async_remote_copy` (one-sided ICI
    RDMA — the moral equivalent of gaspi_write_notify) STARTED at the first
    grid step of the interior sweep; the DMAs fly while all interior blocks
    compute; completion (notify_waitsome analogue) is awaited at the last grid
    step.  Returns (grad, recvbufs); the caller scatters recvbufs into the
    static per-phase ghost regions.
    """
    npoint_dev = var_T.shape[1]
    rows = out_rows(op)
    nph = int(sendbufs.shape[0])
    if init.dtype != jnp.dtype(out_dtype):
        raise ValueError(
            f"init dtype {init.dtype} must match out_dtype "
            f"{jnp.dtype(out_dtype)} (aliased buffers)")
    if packed:
        compute_packed = _block_compute_packed(bp, kslots, True, op,
                                               src_format, wks)
    else:
        compute_gather = _block_compute(bp, ep, kslots, True, op, wks)

    check(debug in (None, "nobar", "nodma", "plain"),
          "unknown overlap debug mode %r", debug)
    do_bar = debug is None
    do_dma = debug in (None, "nobar")
    plain = debug == "plain"

    def body(dsts_ref, srcs_ref, send_ref, recv_ref, send_sems, recv_sems,
             run_compute):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def rdma(k):
            return pltpu.make_async_remote_copy(
                src_ref=send_ref.at[k],
                dst_ref=recv_ref.at[k],
                send_sem=send_sems.at[k],
                recv_sem=recv_sems.at[k],
                device_id=dsts_ref[k],
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

        # every device sends in every phase (idle devices self-send masked
        # zeros) → uniform collective participation; fire all pushes at the
        # FIRST interior grid step, complete at the LAST — the transfers fly
        # under the whole interior sweep
        @pl.when(i == 0)
        def _():
            # readiness barrier before any one-sided push: a remote write may
            # not land before its receiver has entered this kernel (its recv
            # buffer may still be live for preceding XLA work).  Each device
            # tells every SOURCE "my buffers are ready", then waits until all
            # of its own RECEIVERS said so.  Self-sends balance the count.
            # (Compiled mode only: the interpreter cannot lower
            # get_barrier_semaphore and synchronizes collectives itself.)
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

        run_compute()

        @pl.when(i == n - 1)
        def _():
            if do_dma:
                for k in range(nph):
                    rdma(k).wait_send()
                    rdma(k).wait_recv()

    if plain:
        # bare pallas_call: same operands/aliases, no scratch, no collective
        # machinery — the fixed-cost bisection's "operand structure only" rung
        if packed:
            def kernel(bids_ref, dsts_ref, srcs_ref, own_ref, src_ref,
                       sw_ref, scale_ref, send_ref, init_ref, rinit_ref,
                       out_ref, recv_ref):
                del dsts_ref, srcs_ref, send_ref, rinit_ref, recv_ref
                compute_packed(own_ref, src_ref, sw_ref, scale_ref,
                               init_ref, out_ref)
        else:
            def kernel(bids_ref, dsts_ref, srcs_ref, own_ref, ext_ref,
                       sidx_ref, sw_ref, scale_ref, send_ref, init_ref,
                       rinit_ref, out_ref, recv_ref):
                del dsts_ref, srcs_ref, send_ref, rinit_ref, recv_ref
                compute_gather(own_ref, ext_ref, sidx_ref, sw_ref,
                               scale_ref, init_ref, out_ref)
    elif packed:
        def kernel(bids_ref, dsts_ref, srcs_ref, own_ref, src_ref, sw_ref,
                   scale_ref, send_ref, init_ref, rinit_ref,
                   out_ref, recv_ref, send_sems, recv_sems):
            del rinit_ref  # aliased with recv_ref: zeros phases with no recv
            body(dsts_ref, srcs_ref, send_ref, recv_ref, send_sems, recv_sems,
                 lambda: compute_packed(own_ref, src_ref, sw_ref, scale_ref,
                                        init_ref, out_ref))
    else:
        def kernel(bids_ref, dsts_ref, srcs_ref, own_ref, ext_ref,
                   sidx_ref, sw_ref, scale_ref, send_ref, init_ref, rinit_ref,
                   out_ref, recv_ref, send_sems, recv_sems):
            del rinit_ref
            body(dsts_ref, srcs_ref, send_ref, recv_ref, send_sems, recv_sems,
                 lambda: compute_gather(own_ref, ext_ref, sidx_ref, sw_ref,
                                        scale_ref, init_ref, out_ref))

    def bid(i, bids, dsts, srcs):
        return bids[i]

    if packed and wks is not None:
        L = compact_len(wks)
        tbl_specs = [
            pl.BlockSpec((1, NV, L), lambda i, b, d, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # srcs
        ]
        tbl_args = [plan_arrays["srcs"]]
    elif packed:
        tbl_specs = [
            pl.BlockSpec((1, kslots, NV, bp), lambda i, b, d, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),                   # srcs
        ]
        tbl_args = [plan_arrays["srcs"]]
    else:
        tbl_specs = [
            pl.BlockSpec((1, NV, ep), lambda i, b, d, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # exts
            pl.BlockSpec((1, kslots, bp), lambda i, b, d, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # slot_idx
        ]
        tbl_args = [plan_arrays["exts"], plan_arrays["slot_idx"]]
    in_specs = [
        pl.BlockSpec((NV, bp), lambda i, b, d, s: (0, bid(i, b, d, s)),
                     memory_space=pltpu.VMEM),                       # own
        *tbl_specs,
        (pl.BlockSpec((1, 3, compact_len(wks)),
                      lambda i, b, d, s: (i, 0, 0),
                      memory_space=pltpu.VMEM)
         if packed and wks is not None else
         pl.BlockSpec((1, kslots, 3, bp), lambda i, b, d, s: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)),                     # slot_w
        pl.BlockSpec((1, 1, bp), lambda i, b, d, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),                       # scale
        pl.BlockSpec(memory_space=pl.ANY),                           # sendbufs
        pl.BlockSpec((rows, bp), lambda i, b, d, s: (0, bid(i, b, d, s)),
                     memory_space=pltpu.VMEM),                       # init
        pl.BlockSpec(memory_space=pl.ANY),                           # recv init
    ]
    out_specs = (
        pl.BlockSpec((rows, bp), lambda i, b, d, s: (0, bid(i, b, d, s)),
                     memory_space=pltpu.VMEM),                       # grad
        pl.BlockSpec(memory_space=pl.ANY),                           # recvbufs
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=([] if plain else [
            pltpu.SemaphoreType.DMA((nph,)),
            pltpu.SemaphoreType.DMA((nph,)),
        ]),
    )
    args = (var_T, *tbl_args, plan_arrays["slot_w"], plan_arrays["scale"],
            sendbufs, init, jnp.zeros(sendbufs.shape, sendbufs.dtype))
    # operand index: prefetch(3) count as 0..2, then tensor inputs; init
    # (second-to-last) aliases the grad output; the zero recv-init (last)
    # aliases the recv buffer so no-recv phases read deterministic zeros
    n_ops = 3 + len(args)
    grad, recv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, npoint_dev), out_dtype),
            jax.ShapeDtypeStruct(sendbufs.shape, sendbufs.dtype),
        ),
        input_output_aliases={n_ops - 2: 0, n_ops - 1: 1},
        # collective_id is required by (and only valid with) the
        # get_barrier_semaphore readiness barrier above — Mosaic rejects it
        # for kernels without a custom barrier (hardware-verified), so the
        # debug modes that drop the barrier must drop it too
        compiler_params=(pltpu.CompilerParams(
            has_side_effects=True, collective_id=7) if do_bar
            else None if plain
            else pltpu.CompilerParams(has_side_effects=True)),
        interpret=interpret,
    )(plan_arrays["block_ids"], dsts, srcs, *args)
    return grad, recv


def gather_exts(var_T: jax.Array, ext_idx: jax.Array) -> jax.Array:
    """(NV, N) × (nblocks, EP) → (nblocks, NV, EP).  Setup-time only — var is
    static across benchmark iterations (the reference exchanges gradients,
    not state; SURVEY.md §4.2), so this slow XLA gather is off the hot path."""
    nb, ep = ext_idx.shape
    g = jnp.take(var_T, ext_idx.reshape(-1), axis=1)     # (NV, nb*EP)
    return jnp.moveaxis(g.reshape(NV, nb, ep), 0, 1)


def gather_srcs(var_T: jax.Array, src_cols: jax.Array) -> jax.Array:
    """(NV, N) × (nblocks, K, BP) → (nblocks, K, NV, BP) pre-gathered slot
    sources for the PACKED formulation, via XLA take.  Reference path for
    tests/microbenches; production state updates use `pack_srcs` (XLA's
    gather lowering runs ~5-7 GB/s on this class of index sets — ~90 ms per
    refresh at 2.8M faces — where the Pallas pack runs at sweep speed)."""
    nb, k, bp = src_cols.shape
    g = jnp.take(var_T, src_cols.reshape(-1), axis=1)    # (NV, nb*K*BP)
    return jnp.moveaxis(g.reshape(NV, nb, k, bp), 0, 2)


def pack_srcs(
    var_T: jax.Array,            # (NV, npoint_dev) f32
    plan_arrays: dict,           # block_ids, exts (nb, NV, EP), slot_idx
    *,
    bp: int,
    ep: int,
    kslots: int,
    nblocks: int,
    interpret: bool = False,
    src_format: str = "f32",
    wks: tuple[int, ...] | None = None,
) -> jax.Array:
    """Pallas source re-pack for the PACKED formulation: gather each slot's
    source VALUES into (nblocks, K, NV, BP) using the same in-VMEM masked
    multi-pass machinery as the GATHER sweep — but writing values instead of
    accumulating.  One state update costs ~a sweep instead of XLA's slow
    gather; exts are the (small, RCB-local) pre-gathered ext columns.

    src_format "bf16d" writes bf16 DELTAS gathered−own instead (the
    --src-dtype bfloat16 stream-halving option; see _block_compute_packed).

    wks: write the COMPACT layout (nblocks, NV, L) instead — slot k's prefix
    tiles at static lane offset Σ_{j<k}wks[j] (see _block_compute_packed);
    tiles beyond a slot's prefix hold only inert padding and are skipped,
    which also drops ~20% of the re-pack's gather work."""
    ntile = bp // LANE
    npass = (bp + ep) // LANE
    out_dtype = jnp.bfloat16 if src_format == "bf16d" else jnp.float32

    def gather_tile(own_ref, tbl, sidx_ref, t, k):
        own_tile = own_ref[:, t * LANE : (t + 1) * LANE]
        idx = sidx_ref[0, k, t * LANE : (t + 1) * LANE]
        gat = _masked_gather(tbl, idx, npass)
        if src_format == "bf16d":
            gat = (gat - own_tile).astype(jnp.bfloat16)
        return gat

    if wks is None:
        def kernel(bids_ref, own_ref, ext_ref, sidx_ref, out_ref):
            tbl = jnp.concatenate([own_ref[:], ext_ref[0]], axis=1)  # (NV, W)
            for t in range(ntile):
                for k in range(kslots):
                    out_ref[0, k, :, t * LANE : (t + 1) * LANE] = \
                        gather_tile(own_ref, tbl, sidx_ref, t, k)

        out_spec = pl.BlockSpec((1, kslots, NV, bp),
                                lambda i, bids: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nblocks, kslots, NV, bp), out_dtype)
    else:
        L = compact_len(wks)

        def kernel(bids_ref, own_ref, ext_ref, sidx_ref, out_ref):
            tbl = jnp.concatenate([own_ref[:], ext_ref[0]], axis=1)  # (NV, W)
            off = 0
            for k, w in enumerate(wks):
                for t in range(w // LANE):
                    out_ref[0, :, off + t * LANE : off + (t + 1) * LANE] = \
                        gather_tile(own_ref, tbl, sidx_ref, t, k)
                off += w

        out_spec = pl.BlockSpec((1, NV, L), lambda i, bids: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nblocks, NV, L), out_dtype)

    def bid(i, bids):
        return bids[i]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((NV, bp), lambda i, bids: (0, bid(i, bids)),
                         memory_space=pltpu.VMEM),                   # own
            pl.BlockSpec((1, NV, ep), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # exts
            pl.BlockSpec((1, kslots, bp), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),                   # slot_idx
        ],
        out_specs=out_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(plan_arrays["block_ids"], var_T, plan_arrays["exts"],
      plan_arrays["slot_idx"])


def own_cols(var_T: jax.Array, block_ids: jax.Array, bp: int) -> jax.Array:
    """Each block's own state columns: (NV, N) × (nblocks,) → (nblocks, NV,
    BP).  The single place that encodes the block→device-column convention
    for delta packing (srcs_to_format and kbench's quantization experiments
    must agree on it)."""
    cols = block_ids.astype(jnp.int32)[:, None] * bp + jnp.arange(
        bp, dtype=jnp.int32)[None, :]                       # (nblocks, BP)
    return jnp.moveaxis(jnp.take(var_T, cols.reshape(-1), axis=1).reshape(
        var_T.shape[0], *cols.shape), 0, 1)                 # (nblocks, NV, BP)


def srcs_to_format(srcs: jax.Array, var_T: jax.Array, block_ids: jax.Array,
                   bp: int, src_format: str) -> jax.Array:
    """XLA reference for pack_srcs' output formats: convert f32 slot sources
    (nblocks, K, NV, BP) to src_format ("f32" passthrough, or "bf16d" = bf16
    deltas vs the destination block's own columns).  Used by tests and the
    kbench microbench; production re-packs go through pack_srcs."""
    if src_format == "f32":
        return srcs
    check(src_format == "bf16d", "unknown src_format %r", src_format)
    own = own_cols(var_T, block_ids, bp)
    return (srcs - own[:, None, :, :]).astype(jnp.bfloat16)
