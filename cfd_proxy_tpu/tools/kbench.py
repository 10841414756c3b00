"""Kernel-formulation microbench: where do the packed sweep's cycles go?

Times variants of the packed block sweep on the benchmark mesh to attribute
the gap to the streaming memory floor (BASELINE.md):

    prod     the production packed kernel (ops/blocksweep.py), bp from --bp
    stream   same streams, minimal math (sum of sources) — the achievable
             memory floor for this data layout
    wsum     production math with the own-side term hoisted out of the slot
             loop (25% fewer VPU ops; splits the own term per class so it is
             NOT schedule-composition-exact — measurement only)
    nv7      pad-drop experiment: var/srcs carry 7 sublane rows (nvar) instead
             of the 8-row tile, out 21 rows — streams 7/8 of the srcs/var/out
             bytes (VMEM pads internally; HBM does not).  MEASURED 30% SLOWER
             (paired, median ratio prod/nv7 = 0.774, IQR 0.770-0.784):
             off-tile sublane counts cost more in DMA/relayout than the
             stream saving — dead end, do not productionize
    bf16src  the production --src-dtype bfloat16 path: DELTA-packed bf16
             sources (src−own), upcast in-kernel — halves the dominant srcs
             stream (~27% of total bytes); measured 17% faster (paired
             median ratio 1.17, BASELINE.md); ~1e-3 rel accuracy bound
    w16      f32 sources + bf16 slot weights (--meta-dtype bfloat16 alone):
             paired ratio 1.089 over prod — corrects round-2's single-run
             "slower" verdict, which was timing noise
    bf16sw   sources AND weights bf16 (the full reduced-precision mode):
             paired ratio 1.106 over bf16src ⇒ ~1.29x prod, ~7.0 Gf/s raw
    prod_alt / bf16sw_alt
             the same kernels on a SECOND plan built at --bp-alt — decides
             block-size questions drift-free.  Verdicts (2.8M faces):
             bp 1024→2048 ratio 1.08 f32 / 1.24 bf16; 2048→4096 another
             1.10 bf16 (0.303 ms ≈ 9.2 Gf/s raw)
    compact / compact_bsw
             the --kcompact prefix layout (degree-sorted blocks, per-slot
             static lane prefixes — 20% fewer lanes on this mesh): srcs
             (nb, NV, L), slot_w (nb, 3, L).  PAIRED VERDICTS (round 3):
             prod/compact median ratio 1.3364, IQR [1.2135, 1.3558] —
             0.432 → 0.334 ms f32 at 2.8M faces (8.4 Gf/s raw);
             bf16sw/compact_bsw ratio 1.2094, IQR [1.1689, 1.3338] —
             0.298 → 0.247 ms (11.3 Gf/s raw reduced precision)
    flat     attribution control: prod's full bytes in compact's 3-D
             layout.  VERDICT: prod/flat = 0.996, IQR [0.989, 1.039] —
             layout-neutral; compact's win is entirely the lane cut.
             compact/compact_alt at --bp-alt 8192: 0.944 f32 (noisy) /
             0.846 bf16 — 8192 regresses, bp 4096 stays optimal
    var16    bf16 STATE reads on top of compact_bso (deltas packed against
             the QUANTIZED own so own rounding cancels over closed cells).
             VERDICT: compact_bso/var16 = 1.035, IQR [1.004, 1.085], n=12
             — a small real win (half the ~7% byte prediction; the (8, bp)
             bf16 block is half the native 16-sublane tile).  NOT
             productionized: keeping srcs at f32 accuracy requires the f32
             state table at pack time, which the static benchmark path has
             but solver-mode rebuilds (bf16 var would put state rounding
             into the deltas and the ~1e-3 bound becomes ~1e-2 on smooth
             fields).  +3.5% did not justify that semantic fork; variant
             kept for future stacking
    cflux / cflux_fact
             the secondary (PSD upwind) kernel on the compact layout, and
             its factored-upwind rewrite (cu·own + cg·gat; ~40% fewer
             elementwise VPU ops, algebraically identical).  VERDICT
             (2026-08-18): 0.976, IQR [0.87, 1.07] — NEUTRAL; flux's +8%
             over gg is stream bill + per-slot dots/|max|, production
             formula unchanged.  --check fingerprints both vs the FLUX golden
    cstream_flux
             the flux kernel's own stream twin (identical bytes, minimal
             math).  VERDICT (2026-08-18): cflux/cstream_flux = 1.1596,
             IQR [1.1151, 1.2267], n=11 (0.425 vs 0.368 ms) — flux carries
             a modest ~16% compute tax over its floor (the per-slot
             udw/uow dots and |max|), between f32 gg (~3%) and the bf16
             stack (1.56x); quantifies what cflux_fact's NEUTRAL implied
    cstream_c
             same twin with f32 compact tables — the f32 compact kernel's
             own memory floor (the round-2 "~3% off floor" twin was
             measured on the UNCOMPACTED layout).  VERDICT (2026-08-18):
             compact/cstream_c = 1.0064, IQR [0.9753, 1.0800], n=11
             (0.353 vs 0.362 ms medians) — DEAD EVEN: the f32 compact
             kernel sits exactly at its memory floor.  The floor triple:
             f32 gg 1.006 (memory-bound), flux 1.16 (modest dot/|max|
             tax), bf16 gg 1.56 (VPU compute-bound)
    cstream_bso
             stream twin of compact_bso (same bf16 srcs/weights/out + f32
             var bytes, minimal math) — the reduced-precision kernel's own
             memory floor; compact_bso/cstream_bso attributes remaining
             compute headroom.  VERDICT (2026-08-18): median ratio 1.5572,
             IQR [1.4280, 1.8476], n=16 (0.234 vs 0.152 ms) — unlike the
             f32 kernel (~3% off its floor), the full-bf16 kernel runs
             ~1.56x its own stream floor: it is COMPUTE/relayout-bound
    bso_fold / bso_wsum
             VPU-op-cut experiments on that headroom, both MEASURED DEAD
             ENDS (2026-08-18): bso_fold (pre-halved weights + hoisted
             own+own, ~12% fewer ops, composition-exact) ratio 1.0041,
             IQR [0.9105, 1.1414] — NEUTRAL; bso_wsum (own term applied
             once per point via a Σw' stream, ~25% fewer ops) ratio
             0.8537, IQR [0.8342, 0.8973] — 15% SLOWER (the extra (3, bp)
             stream + a second acc pass cost more than the op cut saves).
    bso_acc3 third rung of the same ladder: three (NV, bp) accumulators
             (one per spatial d, single-sublane broadcasts) instead of the
             per-slot (3, NV, w)→(21, w) broadcast-reshape, concatenated
             once at the end — composition-exact.  VERDICT (2026-08-18):
             0.9634, IQR [0.7760, 1.3706], n=12 — NEUTRAL (noisy session).
             ATTRIBUTION across the three rungs: the stream twin performs
             the SAME per-slot upcasts and prefix-concats as production —
             the 1.56x gap is exactly the 21-row outer-product accumulate
             (~120M FMA + ~100M aux lane-ops at 2.8M faces, i.e.
             0.06-0.13 ms at 1-2k lane-ops/cycle, bracketing the measured
             0.082 ms gap).  Irreducible VPU work (per-lane outer products
             cannot ride the MXU: each point has its own weights, so there
             is no shared operand).  The f32 kernel sits at its MEMORY
             floor; the bf16 kernel sits at its VPU COMPUTE floor — the
             reduced-precision headline is speed-of-light for this
             formulation, and further gains need fewer slot lanes (mesh
             ordering), not kernel work
    compact_i8
             int8 DELTA sources on top of compact_bso — the precision rung
             below bf16 on the srcs stream (the largest remaining stream of
             the full-bf16 kernel).  Deltas src−own are symmetric-quantized
             per (block, var) (scale = max|δ|/127, a (nb, NV) side table
             lane-tiled to 128 so the kernel reads it as one vreg row);
             dequant is one extra VPU multiply per slot chunk.  Accuracy is
             block-relative: ~max|δ|/254 absolute per slot, i.e. ~4e-3·the
             block's delta range — an experiment rung, not a production
             mode.  Risk priced in from nv7/var16: an (8, w) int8 chunk is
             a QUARTER of the native 32-sublane int8 tile, so the relayout
             tax eats more of the ~22%-byte prediction than bf16's half
             tile did.  VERDICT (2026-08-18): compact_bso/compact_i8 median
             ratio 0.898, IQR [0.808, 1.108], n=16 (0.232 vs 0.246 ms) —
             a ~10% LOSS at the median on an unusually noisy session (the
             IQR spans parity; no configuration showed a win).  The
             sublane-tile ladder is now fully measured: f32→bf16 half-tile
             realizes ~half its byte prediction, bf16→int8 quarter-tile
             goes NEGATIVE.  int8 sources are a dead end on this tile
             geometry; variant kept as the record

Timing uses the two-point chained-loop method (solver.time_schedule): the
axon tunnel's block_until_ready does not wait and dispatch costs ~30 ms.

`--paired A,B` interleaves two-point samples of the two variants in
alternating order (A,B then B,A, ...) and reports the median of per-pair
time ratios: linear drift in host/HBM load cancels to first order, which
makes ~10% levers decidable under this chip's ±8-15% run-to-run noise.

Usage:  python -m cfd_proxy_tpu.tools.kbench --nx 96 --variants prod,stream
        python -m cfd_proxy_tpu.tools.kbench --paired prod,nv7 --repeats 12
"""

from __future__ import annotations

import argparse

import numpy as np

from cfd_proxy_tpu.utils.timing import two_point_sampler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cfd_proxy_tpu.tools.kbench")
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--bp", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--variants", default="prod,stream,wsum")
    ap.add_argument("--paired", default=None, metavar="A,B",
                    help="interleaved paired comparison of two variants "
                         "(drift-cancelling; see module doc)")
    ap.add_argument("--repeats", type=int, default=10,
                    help="paired-mode sample pairs")
    ap.add_argument("--check", action="store_true",
                    help="validate the prod kernel's output against the f64 "
                         "golden via an on-device abs-sum fingerprint")
    ap.add_argument("--bp-alt", type=int, default=None,
                    help="build a SECOND plan at this block size and expose "
                         "prod_alt / bf16sw_alt variants — lets --paired "
                         "decide block-size questions drift-free "
                         "(e.g. --paired prod,prod_alt --bp-alt 2048)")
    ap.add_argument("--hub-frac", type=float, default=0.0,
                    help="high-valence tail stress mesh (generator hub "
                         "mode): fraction of points gaining --hub-extra "
                         "second-shell edges (K tail to ~16-20)")
    ap.add_argument("--hub-extra", type=int, default=12)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cfd_proxy_tpu.mesh.generator import generate_mesh, make_state
    from cfd_proxy_tpu.ops.blocksweep import (
        LANE, NV, build_block_plan, compact_len, compact_slot_w,
        compact_srcs, gather_srcs, own_cols, prefix_widths, slot_src_cols,
        srcs_to_format, sweep_blocks,
    )

    interpret = jax.default_backend() != "tpu"
    bp = args.bp
    if interpret:
        # same rationale as the model-level cap (gradients_pallas.py): the
        # kernel trace grows ~bp^2/128^2 and interpret executes each traced
        # op eagerly — bp 4096 effectively hangs on CPU-sized runs
        bp = min(bp, 1024)
        if args.bp_alt:
            args.bp_alt = min(args.bp_alt, 1024)
    m = generate_mesh(args.nx, args.nx, args.nx, jitter=0.05, diag_frac=0.2,
                      seed=0, hub_frac=args.hub_frac,
                      hub_extra=args.hub_extra)
    # in-block degree sort (the model's kcompact relabel): heavy points go to
    # each block's leading tiles so the compact variants' prefix widths are
    # tight.  Pure in-block lane permutation — identical shapes/streams for
    # every non-compact variant, so it is applied unconditionally and paired
    # comparisons stay apples-to-apples on one plan.
    from cfd_proxy_tpu.mesh.partition import degree_sort_order

    deg = np.bincount(m.faces.ravel(), minlength=m.npoint)
    new_of_old = degree_sort_order(deg, bp)
    faces = new_of_old[m.faces].astype(np.int32)
    volume = np.empty_like(m.volume)
    volume[new_of_old] = m.volume

    npoint_dev = ((m.npoint + bp - 1) // bp) * bp + bp  # + trash block
    inv = np.zeros(npoint_dev)
    inv[: m.npoint] = 1.0 / volume
    plan = build_block_plan(faces, m.normals, npoint_dev,
                            inv, bp=bp, all_blocks=True)
    wks = prefix_widths(plan.slot_w, bp)
    print(f"nface={m.nface} npoint={m.npoint} bp={bp} nblocks={plan.nblocks} "
          f"K={plan.kslots} ep={plan.ep} "
          f"compact={sum(wks)}/{plan.kslots * bp} lanes")

    var = make_state(m.npoint, 7, seed=1, dtype=np.float32)
    var_T = np.zeros((NV, npoint_dev), np.float32)
    var_T[:7, new_of_old] = var.T
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

    # ---- nv7 pad-drop experiment: 7 sublane rows end to end ------------
    nv7 = 7
    var7 = var_T[:nv7]
    pa7 = dict(pa)
    pa7["srcs"] = jax.jit(lambda s: s[:, :, :nv7, :].copy())(pa["srcs"])

    def nv7_kernel(bids, own_ref, src_ref, sw_ref, scale_ref, out_ref):
        own = own_ref[:]                                      # (7, bp)
        acc = jnp.zeros((3 * nv7, bp), jnp.float32)
        for k in range(K):
            gat = src_ref[0, k]
            wk = sw_ref[0, k]
            avg = 0.5 * (own + gat)
            acc = acc + (wk[:, None, :] * avg[None, :, :]).reshape(
                3 * nv7, bp)
        out_ref[:] = acc * scale_ref[0, 0][None, :]

    def nv7_fn(v, pa):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,),
            in_specs=[
                pl.BlockSpec((nv7, bp), lambda i, bids: (0, bids[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, nv7, bp), lambda i, bids: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, 3, bp), lambda i, bids: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3 * nv7, bp),
                                   lambda i, bids: (0, bids[i]),
                                   memory_space=pltpu.VMEM))
        return pl.pallas_call(
            nv7_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((3 * nv7, npoint_dev),
                                           jnp.float32),
            interpret=interpret,
        )(pa["block_ids"], v, pa["srcs"], pa["slot_w"], pa["scale"])

    # ---- bf16src: the production --src-dtype bfloat16 path (bf16 deltas,
    # sweep_blocks src_format="bf16d") — first measured here as raw-bf16
    # sources (same streams/op count; ratio 1.17 over prod, BASELINE.md)
    pa_bf = dict(pa)
    pa_bf["srcs"] = jax.jit(
        lambda s, v, b: srcs_to_format(s, v, b, bp, "bf16d")
    )(pa["srcs"], var_T, pa["block_ids"])

    def bf16src_fn(v, pa):
        return sweep_blocks(v, pa, bp=bp, ep=plan.ep, kslots=K, nblocks=nb,
                            interpret=interpret, packed=True,
                            src_format="bf16d")

    # ---- bf16sw: bf16 deltas AND bf16 slot weights (--src-dtype bfloat16
    # --meta-dtype bfloat16) — the remaining big stream after bf16d srcs is
    # slot_w (~86 MB at 2.8M faces)
    pa_bsw = dict(pa_bf)
    pa_bsw["slot_w"] = jax.jit(lambda w: w.astype(jnp.bfloat16))(pa["slot_w"])

    # ---- w16: f32 sources + bf16 slot weights (--meta-dtype alone) ------
    pa_w = dict(pa)
    pa_w["slot_w"] = pa_bsw["slot_w"]

    # ---- compact: the --kcompact prefix layout (srcs (nb, NV, L), slot_w
    # (nb, 3, L)) — drops the inert padding slots from both dominant streams
    # (~20% fewer lanes on the benchmark mesh; prefix_widths docstring)
    csw = jnp.asarray(compact_slot_w(plan.slot_w, wks))
    pa_c = dict(pa)
    pa_c["slot_w"] = csw
    pa_c["srcs"] = jax.jit(lambda s: compact_srcs(s, wks))(pa["srcs"])
    pa_cb = dict(pa_c)       # compact + bf16 deltas + bf16 weights
    pa_cb["srcs"] = jax.jit(lambda s: compact_srcs(s, wks))(pa_bf["srcs"])
    pa_cb["slot_w"] = jax.jit(lambda w: w.astype(jnp.bfloat16))(csw)

    # ---- var16: bf16 STATE reads on top of the full bf16 stack — var_T is
    # the last f32 stream in the compact_bso kernel ((NV, bp)/block, ~15% of
    # its bytes).  Deltas are packed against the QUANTIZED own (f32(bf16))
    # so reconstruction errors still ride the delta and own·Σw cancels over
    # closed cells; accuracy stays delta-class except at boundary cells.
    # Caveat measured into the verdict: an (8, bp) bf16 block is half the
    # native 16-sublane bf16 tile — the nv7-style relayout cost applies.
    var_q = jax.jit(lambda v: v.astype(jnp.bfloat16))(var_T)
    pa_cq = dict(pa_cb)
    pa_cq["srcs"] = jax.jit(
        lambda s, v, b: compact_srcs(
            srcs_to_format(s, v.astype(jnp.bfloat16).astype(jnp.float32),
                           b, bp, "bf16d"), wks)
    )(pa["srcs"], var_T, pa["block_ids"])

    # ---- compact_i8: int8 DELTA sources on top of the full bf16 stack —
    # the next precision rung on the dominant srcs stream (see module doc).
    # Quantization is per (block, var): scale = max|src−own|/127 over the
    # block's ACTIVE compact lanes (padding lanes inside a 128-rounded
    # prefix resolve to block point 0 and carry field-scale garbage deltas
    # — masking by nonzero slot weight keeps the scale on the real
    # neighbor-delta range), stored lane-tiled (nb, NV, LANE) so the kernel
    # reads it as a single (NV, 128) vreg row per block.  Built only when
    # the variant is requested: the tables cost a compile + an extra
    # ~25%-of-srcs residency that unrelated pairings should not pay.
    L_c = compact_len(wks)

    def _i8_quant(s_c, sw_c, v, bids):
        own = own_cols(v, bids, bp)                         # (nb, NV, BP)
        parts, off = [], 0
        for w in wks:
            if w:
                parts.append(s_c[:, :, off:off + w] - own[:, :, :w])
                off += w
        d = jnp.concatenate(parts, axis=-1)                 # (nb, NV, L)
        active = (sw_c != 0).any(axis=1)[:, None, :]        # (nb, 1, L)
        # zero the inactive lanes BEFORE quantizing, not just for the scale:
        # padding lanes inside a 128-rounded prefix carry field-scale garbage
        # deltas that can exceed int8 range under the active-lane scale, and
        # .astype(int8) overflow is implementation-defined.  The kernel
        # zero-weights those lanes either way; this keeps the stored table
        # well-defined (advisor find, round 3).
        d = jnp.where(active, d, 0.0)
        sc = jnp.maximum(jnp.abs(d).max(axis=2), 1e-30) / 127.0  # (nb, NV)
        q = jnp.round(d / sc[:, :, None]).astype(jnp.int8)
        return q, jnp.broadcast_to(sc[:, :, None],
                                   (*sc.shape, LANE)).astype(jnp.float32)

    req = set((args.paired or args.variants).split(","))
    pa_i8 = dict(pa_cb)
    if "compact_i8" in req:
        q_i8, sc_i8 = jax.jit(_i8_quant)(pa_c["srcs"], csw, var_T,
                                         pa["block_ids"])
        pa_i8["srcs"] = q_i8
        pa_i8["i8_scale"] = sc_i8

    def i8_kernel(bids, own_ref, src_ref, sw_ref, scale_ref, sc_ref,
                  out_ref):
        own = own_ref[:]                                    # (NV, bp) f32
        acc = jnp.zeros((rows, bp), jnp.float32)
        s = sc_ref[0][:, :1]                                # (NV, 1)
        off = 0
        for w in wks:
            if w == 0:
                continue
            own_k = own if w == bp else own[:, :w]
            dk = src_ref[0, :, off:off + w].astype(jnp.float32) * s
            wk = sw_ref[0, :, off:off + w].astype(jnp.float32)
            avg = own_k + 0.5 * dk                          # own + δ/2
            contrib = (wk[:, None, :] * avg[None, :, :]).reshape(rows, w)
            if w == bp:
                acc = acc + contrib
            else:
                acc = jnp.concatenate([acc[:, :w] + contrib, acc[:, w:]],
                                      axis=1)
            off += w
        out_ref[:] = (acc * scale_ref[0, 0][None, :]).astype(out_ref.dtype)

    def i8_fn(v, pa):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,),
            in_specs=[
                pl.BlockSpec((NV, bp), lambda i, bids: (0, bids[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NV, L_c), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, L_c), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NV, LANE), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, bp), lambda i, bids: (0, bids[i]),
                                   memory_space=pltpu.VMEM))
        return pl.pallas_call(
            i8_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, npoint_dev), jnp.bfloat16),
            interpret=interpret,
        )(pa["block_ids"], v, pa["srcs"], pa["slot_w"], pa["scale"],
          pa["i8_scale"])

    # ---- cstream_bso: the full-bf16-stack kernel's own STREAM TWIN — the
    # same bytes as compact_bso (bf16 compact srcs + bf16 compact weights +
    # f32 var + bf16 out rows) with minimal math (running sums, one final
    # mul) — the achievable memory floor for THAT layout, mirroring the f32
    # `stream` twin.  compact_bso/cstream_bso attributes whether the
    # reduced-precision kernel has compute headroom left or is memory-bound.
    def cstream_bso_kernel(bids, own_ref, src_ref, sw_ref, scale_ref,
                           out_ref):
        s1 = own_ref[:].astype(jnp.float32)               # (NV, bp)
        s2 = jnp.zeros((3, bp), jnp.float32)
        off = 0
        for w in wks:
            if w == 0:
                continue
            src_k = src_ref[0, :, off:off + w].astype(jnp.float32)
            wk = sw_ref[0, :, off:off + w].astype(jnp.float32)
            if w == bp:
                s1 = s1 + src_k
                s2 = s2 + wk
            else:
                s1 = jnp.concatenate([s1[:, :w] + src_k, s1[:, w:]], axis=1)
                s2 = jnp.concatenate([s2[:, :w] + wk, s2[:, w:]], axis=1)
            off += w
        out_ref[:] = ((s2[:, None, :] * s1[None, :, :]).reshape(rows, bp)
                      * scale_ref[0, 0][None, :]).astype(out_ref.dtype)

    def _cstream_fn(out_dtype):
        # the twin body is dtype-agnostic (the upcasts are no-ops on f32
        # inputs), so the SAME kernel serves as the f32 compact kernel's
        # floor (cstream_c: pa_c + f32 out) and the bf16 stack's floor
        # (cstream_bso: pa_cb + bf16 out)
        def fn(v, pa):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nb,),
                in_specs=[
                    pl.BlockSpec((NV, bp), lambda i, bids: (0, bids[i]),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, NV, L_c), lambda i, bids: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 3, L_c), lambda i, bids: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows, bp),
                                       lambda i, bids: (0, bids[i]),
                                       memory_space=pltpu.VMEM))
            return pl.pallas_call(
                cstream_bso_kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((rows, npoint_dev), out_dtype),
                interpret=interpret,
            )(pa["block_ids"], v, pa["srcs"], pa["slot_w"], pa["scale"])
        return fn

    cstream_bso_fn = _cstream_fn(jnp.bfloat16)
    cstream_c_fn = _cstream_fn(jnp.float32)

    # ---- bso_fold / bso_wsum: VPU-op-cut experiments on the bf16 stack,
    # motivated by the cstream_bso twin verdict (compact_bso runs ~1.46x its
    # own memory floor — the bf16 kernel is COMPUTE-bound, unlike f32).
    # bso_fold: weights stored PRE-HALVED (w' = 0.5w) and the own term
    #   hoisted as o2 = own+own once per block; per slot t = o2+δ,
    #   contrib = w'⊗t — same real value (0.5w⊗(2·own+δ) == w⊗(own+0.5δ)),
    #   SAME per-slot accumulation order (composition-exact), ~12% fewer ops.
    # bso_wsum: additionally hoists the own term entirely: acc = Σ w'⊗δ per
    #   slot + (Σw')⊗o2 once at the end (Σw' static per point, an extra
    #   (1,3,bp) stream) — ~25% fewer ops but the own term is applied ONCE,
    #   so cross-schedule composition is no longer order-identical
    #   (measurement rung, like wsum).
    pa_fold = dict(pa_cb)
    pa_fold["slot_w"] = jax.jit(lambda w: (0.5 * w.astype(jnp.float32))
                                .astype(jnp.bfloat16))(csw)
    ws_half = jnp.asarray(0.5 * plan.slot_w.sum(axis=1))      # (nb, 3, bp)
    pa_wsum = dict(pa_fold)
    pa_wsum["wsum"] = ws_half.astype(jnp.float32)

    def _bso_kernel(hoist_own):
        def kern(bids, own_ref, src_ref, sw_ref, scale_ref, *rest):
            if hoist_own:
                ws_ref, out_ref = rest
            else:
                (out_ref,) = rest
            own = own_ref[:].astype(jnp.float32)
            o2 = own + own
            acc = jnp.zeros((rows, bp), jnp.float32)
            off = 0
            for w in wks:
                if w == 0:
                    continue
                d = src_ref[0, :, off:off + w].astype(jnp.float32)
                wk = sw_ref[0, :, off:off + w].astype(jnp.float32)
                t = d if hoist_own else (o2 if w == bp else o2[:, :w]) + d
                contrib = (wk[:, None, :] * t[None, :, :]).reshape(rows, w)
                if w == bp:
                    acc = acc + contrib
                else:
                    acc = jnp.concatenate([acc[:, :w] + contrib, acc[:, w:]],
                                          axis=1)
                off += w
            if hoist_own:
                ws = ws_ref[0]                                 # (3, bp)
                acc = acc + (ws[:, None, :] * o2[None, :, :]).reshape(rows, bp)
            out_ref[:] = (acc * scale_ref[0, 0][None, :]).astype(out_ref.dtype)
        return kern

    def _bso_fn(hoist_own):
        specs = [
            pl.BlockSpec((NV, bp), lambda i, bids: (0, bids[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NV, L_c), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, L_c), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if hoist_own:
            specs.append(pl.BlockSpec((1, 3, bp), lambda i, bids: (i, 0, 0),
                                      memory_space=pltpu.VMEM))

        def fn(v, pa):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nb,), in_specs=specs,
                out_specs=pl.BlockSpec((rows, bp),
                                       lambda i, bids: (0, bids[i]),
                                       memory_space=pltpu.VMEM))
            extra = (pa["wsum"],) if hoist_own else ()
            return pl.pallas_call(
                _bso_kernel(hoist_own), grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((rows, npoint_dev),
                                               jnp.bfloat16),
                interpret=interpret,
            )(pa["block_ids"], v, pa["srcs"], pa["slot_w"], pa["scale"],
              *extra)
        return fn

    # ---- bso_acc3: relayout-structure experiment on the bf16 compute tax.
    # Production keeps ONE (3*NV, w) accumulator and forms each slot's
    # contribution as a (3, NV, w) broadcast-multiply reshaped to (21, w) —
    # a sublane relayout per slot chunk.  bso_acc3 keeps THREE (NV, w)
    # accumulators (one per spatial d) and per slot does 3 single-sublane
    # broadcasts wk[d] * avg — no 3-D intermediate, no per-slot reshape; the
    # (21, bp) output is concatenated ONCE at the end.  Per-point per-slot
    # accumulation order identical to production (composition-exact).
    def bso_acc3_kernel(bids, own_ref, src_ref, sw_ref, scale_ref, out_ref):
        own = own_ref[:].astype(jnp.float32)                   # (NV, bp)
        accs = [jnp.zeros((NV, bp), jnp.float32) for _ in range(3)]
        off = 0
        for w in wks:
            if w == 0:
                continue
            own_k = own if w == bp else own[:, :w]
            avg = own_k + 0.5 * src_ref[0, :, off:off + w].astype(jnp.float32)
            wk = sw_ref[0, :, off:off + w].astype(jnp.float32)  # (3, w)
            for d in range(3):
                contrib = wk[d:d + 1, :] * avg                  # (NV, w)
                if w == bp:
                    accs[d] = accs[d] + contrib
                else:
                    accs[d] = jnp.concatenate(
                        [accs[d][:, :w] + contrib, accs[d][:, w:]], axis=1)
            off += w
        acc = jnp.concatenate(accs, axis=0)                     # (rows, bp)
        out_ref[:] = (acc * scale_ref[0, 0][None, :]).astype(out_ref.dtype)

    def bso_acc3_fn(v, pa):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,),
            in_specs=[
                pl.BlockSpec((NV, bp), lambda i, bids: (0, bids[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NV, L_c), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, L_c), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, bp), lambda i, bids: (0, bids[i]),
                                   memory_space=pltpu.VMEM))
        return pl.pallas_call(
            bso_acc3_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, npoint_dev), jnp.bfloat16),
            interpret=interpret,
        )(pa["block_ids"], v, pa["srcs"], pa["slot_w"], pa["scale"])

    def compact_fn(src_format, use_wks, out_dtype=jnp.float32):
        def fn(v, pa):
            return sweep_blocks(v, pa, bp=bp, ep=plan.ep, kslots=K,
                                nblocks=nb, interpret=interpret, packed=True,
                                src_format=src_format, wks=use_wks,
                                out_dtype=out_dtype)
        return fn

    # ---- flat: attribution control for compact — the SAME bytes as prod
    # (every slot at full bp width) but in compact's 3-D (nb, NV, K*bp)
    # layout.  compact/flat isolates the byte saving; prod/flat isolates the
    # 4-D-vs-3-D BlockSpec DMA layout effect.
    wks_flat = tuple([bp] * K)
    pa_f = dict(pa)
    pa_f["slot_w"] = jnp.asarray(compact_slot_w(plan.slot_w, wks_flat))
    pa_f["srcs"] = jax.jit(lambda s: compact_srcs(s, wks_flat))(pa["srcs"])

    # ---- flux variants: the secondary (PSD upwind) kernel is COMPUTE-bound
    # (f32 compact flux 0.441 ms vs gg's 0.388 at 2.8M faces despite writing
    # 2/3 FEWER output bytes; its reduced-precision win is only 1.078 vs
    # gg's 1.49 — streams are not its bottleneck), so the lever is FLOPs.
    # cflux = the production compact flux (sweep_blocks op="flux").
    # cflux_fact = ALGEBRAICALLY IDENTICAL factored upwind update:
    #   0.5*(udw*own + uow*gat) - 0.5*a*(gat - own)
    #     == cu*own + cg*gat,  cu = 0.5*(udw + a), cg = 0.5*(uow - a)
    # — the NV-row elementwise work drops ~7 -> 3 ops per slot lane (the
    # udw/uow dots and |max| are per-lane rows and unchanged).  FP results
    # differ by reassociation ULPs only.
    def cflux_fn(v, pa):
        return sweep_blocks(v, pa, bp=bp, ep=plan.ep, kslots=K, nblocks=nb,
                            interpret=interpret, packed=True, op="flux",
                            wks=wks)

    frows = NV

    def cflux_fact_kernel(bids, own_ref, src_ref, sw_ref, scale_ref,
                          out_ref):
        own = own_ref[:]
        acc = jnp.zeros((frows, bp), jnp.float32)
        off = 0
        for w in wks:
            if w == 0:
                continue
            own_k = own if w == bp else own[:, :w]
            gat = src_ref[0, :, off:off + w]
            wk = sw_ref[0, :, off:off + w]
            udw = jnp.sum(own_k[:3] * wk, axis=0)
            uow = jnp.sum(gat[:3] * wk, axis=0)
            a = jnp.maximum(jnp.abs(udw), jnp.abs(uow))
            cu = 0.5 * (udw + a)
            cg = 0.5 * (uow - a)
            contrib = cu[None, :] * own_k + cg[None, :] * gat
            if w == bp:
                acc = acc + contrib
            else:
                acc = jnp.concatenate([acc[:, :w] + contrib, acc[:, w:]],
                                      axis=1)
            off += w
        out_ref[:] = acc * scale_ref[0, 0][None, :]

    def cflux_fact_fn(v, pa):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,),
            in_specs=[
                pl.BlockSpec((NV, bp), lambda i, bids: (0, bids[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NV, L_c), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, L_c), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((frows, bp), lambda i, bids: (0, bids[i]),
                                   memory_space=pltpu.VMEM))
        return pl.pallas_call(
            cflux_fact_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((frows, npoint_dev), jnp.float32),
            interpret=interpret,
        )(pa["block_ids"], v, pa["srcs"], pa["slot_w"], pa["scale"])

    # ---- cstream_flux: the flux kernel's own STREAM TWIN — identical bytes
    # to cflux (f32 compact srcs + slot_w + var in, (NV, bp) f32 out),
    # minimal math.  cflux/cstream_flux quantifies the flux kernel's
    # compute tax the way cstream_bso did for the bf16 gg kernel (until
    # now "flux is compute-bound" rested on indirect evidence: fewer
    # output bytes yet slower than gg, small reduced-precision win).
    def cstream_flux_kernel(bids, own_ref, src_ref, sw_ref, scale_ref,
                            out_ref):
        s1 = own_ref[:]                                    # (NV, bp)
        s2 = jnp.zeros((3, bp), jnp.float32)
        off = 0
        for w in wks:
            if w == 0:
                continue
            src_k = src_ref[0, :, off:off + w]
            wk = sw_ref[0, :, off:off + w]
            if w == bp:
                s1 = s1 + src_k
                s2 = s2 + wk
            else:
                s1 = jnp.concatenate([s1[:, :w] + src_k, s1[:, w:]], axis=1)
                s2 = jnp.concatenate([s2[:, :w] + wk, s2[:, w:]], axis=1)
            off += w
        out_ref[:] = (s1 * (s2[0:1] + s2[1:2] + s2[2:3])
                      * scale_ref[0, 0][None, :])

    def cstream_flux_fn(v, pa):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,),
            in_specs=[
                pl.BlockSpec((NV, bp), lambda i, bids: (0, bids[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NV, L_c), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, L_c), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bp), lambda i, bids: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((frows, bp), lambda i, bids: (0, bids[i]),
                                   memory_space=pltpu.VMEM))
        return pl.pallas_call(
            cstream_flux_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((frows, npoint_dev), jnp.float32),
            interpret=interpret,
        )(pa["block_ids"], v, pa["srcs"], pa["slot_w"], pa["scale"])

    variants = {
        "prod": (prod_fn, var_T, pa),
        "cflux": (cflux_fn, var_T, pa_c),
        "cflux_fact": (cflux_fact_fn, var_T, pa_c),
        "cstream_flux": (cstream_flux_fn, var_T, pa_c),
        "stream": (call(stream_kernel), var_T, pa),
        "wsum": (call(wsum_kernel), var_T, pa),
        "nv7": (nv7_fn, var7, pa7),
        "bf16src": (bf16src_fn, var_T, pa_bf),
        "bf16sw": (bf16src_fn, var_T, pa_bsw),
        "w16": (prod_fn, var_T, pa_w),
        "compact": (compact_fn("f32", wks), var_T, pa_c),
        "compact_bsw": (compact_fn("bf16d", wks), var_T, pa_cb),
        "compact_bso": (compact_fn("bf16d", wks, jnp.bfloat16), var_T, pa_cb),
        "cstream_bso": (cstream_bso_fn, var_T, pa_cb),
        "cstream_c": (cstream_c_fn, var_T, pa_c),
        "bso_fold": (_bso_fn(False), var_T, pa_fold),
        "bso_wsum": (_bso_fn(True), var_T, pa_wsum),
        "bso_acc3": (bso_acc3_fn, var_T, pa_cb),
        "var16": (compact_fn("bf16d", wks, jnp.bfloat16), var_q, pa_cq),
        "compact_i8": (i8_fn, var_T, pa_i8),
        "flat": (compact_fn("f32", wks_flat), var_T, pa_f),
    }

    if args.bp_alt:
        bp2 = args.bp_alt
        # own degree-sorted relabel at bp2 granularity (block boundaries
        # move with bp, so the in-block sort must be redone)
        noo2 = degree_sort_order(deg, bp2)
        faces2 = noo2[m.faces].astype(np.int32)
        vol2 = np.empty_like(m.volume)
        vol2[noo2] = m.volume
        nd2 = ((m.npoint + bp2 - 1) // bp2) * bp2 + bp2
        inv2 = np.zeros(nd2)
        inv2[: m.npoint] = 1.0 / vol2
        plan2 = build_block_plan(faces2, m.normals, nd2,
                                 inv2, bp=bp2, all_blocks=True)
        wks2 = prefix_widths(plan2.slot_w, bp2)
        print(f"alt: bp={bp2} nblocks={plan2.nblocks} K={plan2.kslots} "
              f"ep={plan2.ep} compact={sum(wks2)}/{plan2.kslots * bp2} lanes")
        vT2 = np.zeros((NV, nd2), np.float32)
        vT2[:7, noo2] = var.T
        vT2 = jnp.asarray(vT2)
        pa2 = {
            "block_ids": jnp.asarray(plan2.block_ids),
            "slot_w": jnp.asarray(plan2.slot_w),
            "scale": jnp.asarray(plan2.scale),
        }
        pa2["srcs"] = jax.jit(gather_srcs)(
            vT2, jnp.asarray(slot_src_cols(plan2)))

        def alt_fn(src_format, use_wks=None):
            def fn(v, pa):
                return sweep_blocks(
                    v, pa, bp=bp2, ep=plan2.ep, kslots=plan2.kslots,
                    nblocks=plan2.nblocks, interpret=interpret, packed=True,
                    src_format=src_format, wks=use_wks)
            return fn

        pa2b = dict(pa2)
        pa2b["srcs"] = jax.jit(
            lambda s, v, b: srcs_to_format(s, v, b, bp2, "bf16d")
        )(pa2["srcs"], vT2, pa2["block_ids"])
        pa2b["slot_w"] = jax.jit(lambda w: w.astype(jnp.bfloat16))(
            pa2["slot_w"])
        variants["prod_alt"] = (alt_fn("f32"), vT2, pa2)
        variants["bf16sw_alt"] = (alt_fn("bf16d"), vT2, pa2b)
        # compact at the alt block size (compact vs compact_alt decides the
        # compact kernel's own bp optimum drift-free)
        csw2 = jnp.asarray(compact_slot_w(plan2.slot_w, wks2))
        pa2c = dict(pa2)
        pa2c["slot_w"] = csw2
        pa2c["srcs"] = jax.jit(lambda s: compact_srcs(s, wks2))(pa2["srcs"])
        pa2cb = dict(pa2c)
        pa2cb["srcs"] = jax.jit(lambda s: compact_srcs(s, wks2))(
            pa2b["srcs"])
        pa2cb["slot_w"] = jax.jit(lambda w: w.astype(jnp.bfloat16))(csw2)
        variants["compact_alt"] = (alt_fn("f32", wks2), vT2, pa2c)
        variants["compact_bsw_alt"] = (alt_fn("bf16d", wks2), vT2, pa2cb)

    def sampler(name):
        """Compile a variant's chained-loop runners; return a function that
        takes one two-point sample (seconds/iteration, NaN below floor)."""
        fn, v0, pargs = variants[name]

        @jax.jit
        def run(n, v, pa):
            def body(_i, vv):
                g = fn(vv, pa)
                return vv + 1e-30 * g[: vv.shape[0]]
            return jax.lax.fori_loop(0, n, body, v)

        def sync(n):
            return float(np.asarray(run(n, v0, pargs)[0, 0]))

        n0 = max(1, args.iters // 10)
        sync(n0)
        sync(n0 + args.iters)  # compiles
        inner = two_point_sampler(lambda: sync(n0),
                                  lambda: sync(n0 + args.iters), args.iters)

        def sample():
            v = inner()
            return float("nan") if v is None else v

        return sample

    def timed(name):
        s = sampler(name)
        vals = [s() for _ in range(3)]
        vals = [v for v in vals if np.isfinite(v)]
        return min(vals) if vals else float("inf")

    requested = (args.paired.split(",") if args.paired
                 else args.variants.split(","))
    if args.paired and len(requested) != 2:
        ap.error(f"--paired takes exactly two variants, got {requested}")
    for name in requested:
        if name not in variants:
            ap.error(f"unknown variant {name!r} "
                     f"(choose from {sorted(variants)}; the *_alt variants "
                     f"need --bp-alt)")

    rc = 0
    if args.check:
        from cfd_proxy_tpu.ops.golden import (
            compute_gradients_gg, scale_gradients,
        )

        ref = scale_gradients(
            compute_gradients_gg(var.astype(np.float64), m.faces, m.normals),
            m.volume, m.npoint)
        want = float(np.abs(ref).sum())
        want_flux = None
        if any(n.startswith("cflux") for n in requested):
            from cfd_proxy_tpu.ops.flux import (
                compute_psd_flux, flux_residual_scale,
            )

            ref_fx = flux_residual_scale(
                compute_psd_flux(var.astype(np.float64), m.faces, m.normals),
                m.volume, m.npoint)
            want_flux = float(np.abs(ref_fx).sum())
        # abs-sum fingerprint tolerances: f32 accumulation over ~20M values
        # → 1e-3; bf16 variants carry ~3e-3 pointwise error that partially
        # cancels in the abs-sum → 1e-2
        tols = {"prod": 1e-3, "nv7": 1e-3, "w16": 1e-2, "bf16src": 1e-2,
                "bf16sw": 1e-2, "prod_alt": 1e-3, "bf16sw_alt": 1e-2,
                "compact": 1e-3, "compact_bsw": 1e-2, "flat": 1e-3,
                "compact_alt": 1e-3, "compact_bsw_alt": 1e-2,
                # bf16 grad STORES add one output rounding (~4e-3 pointwise,
                # partially cancelling in the abs-sum) on top of bsw's bf16
                # source/weight error
                "compact_bso": 1e-2,
                # bf16 state adds boundary-cell own rounding on top of bso
                "var16": 1e-2,
                # int8 deltas: ~max|δ|/254 absolute per slot, block-relative
                # (~4e-3 of the block's delta range); partial cancellation
                # in the abs-sum keeps it inside 3e-2 on the test meshes
                "compact_i8": 3e-2,
                # flux fingerprints check against the FLUX golden (below);
                # f32 accumulation class
                "cflux": 1e-3, "cflux_fact": 1e-3,
                # bf16-stack op-cut experiments (same bf16 error class)
                "bso_fold": 1e-2, "bso_wsum": 1e-2, "bso_acc3": 1e-2}
        for name in requested:
            if name not in tols:       # stream/wsum are not gg semantics
                continue
            fn, v0, pargs = variants[name]
            g = jax.jit(fn)(v0, pargs)
            got = float(np.asarray(jnp.abs(g).sum()))  # one scalar off-device
            w_ref = want_flux if name.startswith("cflux") else want
            rel = abs(got - w_ref) / max(1.0, w_ref)
            ok = rel < tols[name]
            print(f"check {name}: |g|sum device {got:.6e} vs golden "
                  f"{w_ref:.6e} rel {rel:.2e} -> {'OK' if ok else 'FAIL'}",
                  flush=True)
            if not ok:
                rc = 1

    if args.paired:
        a, b = requested
        sa, sb = sampler(a), sampler(b)
        # untimed settling pairs: the first dispatches of a FRESHLY compiled
        # executable run slower through the tunnel (remote executable
        # caching) — without this burn a cold-vs-warm pair biases the early
        # ratios hard (observed: a bimodal IQR [0.80, 1.13] whose first
        # pairs penalized the just-compiled variant; solver.time_schedule
        # burns --warmup runs for the same reason)
        for _ in range(2):
            sa(), sb()
        ratios, ta_all, tb_all = [], [], []
        for r in range(args.repeats):
            if r % 2 == 0:
                ta = sa(); tb = sb()
            else:
                tb = sb(); ta = sa()
            if np.isfinite(ta) and np.isfinite(tb):
                ratios.append(ta / tb)
                ta_all.append(ta); tb_all.append(tb)
                print(f"  pair {r:2d}: {a} {ta*1e3:7.3f} ms  "
                      f"{b} {tb*1e3:7.3f} ms  ratio {ta/tb:.4f}", flush=True)
        if not ratios:
            print("paired: every sample below the dispatch-noise floor")
            return 1
        ratios = np.array(ratios)
        med = float(np.median(ratios))
        q1, q3 = np.percentile(ratios, [25, 75])
        print(f"paired {a}/{b}: median ratio {med:.4f}  IQR "
              f"[{q1:.4f}, {q3:.4f}]  n={len(ratios)}")
        print(f"  {a}: median {np.median(ta_all)*1e3:.3f} ms  "
              f"{b}: median {np.median(tb_all)*1e3:.3f} ms")
        return rc

    for name in args.variants.split(","):
        t = timed(name)
        if not np.isfinite(t):
            print(f"{name:8s} below dispatch-noise floor — rerun with a "
                  f"larger --iters/--nx", flush=True)
            continue
        print(f"{name:8s} {t * 1e3:8.3f} ms  {m.nface / t / 1e9:6.2f} Gf/s",
              flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
