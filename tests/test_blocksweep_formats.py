"""Kernel-level tests for the packed-source formats (ops/blocksweep.py):
the Pallas pack_srcs re-pack must agree BITWISE with the XLA reference
construction (gather_srcs / srcs_to_format) in both f32 and bf16-delta
("bf16d", the --src-dtype bfloat16 production format)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfd_proxy_tpu.mesh.generator import generate_mesh, make_state
from cfd_proxy_tpu.ops.blocksweep import (
    NV,
    build_block_plan,
    compact_len,
    compact_slot_w,
    compact_srcs,
    gather_exts,
    gather_srcs,
    pack_srcs,
    prefix_widths,
    slot_src_cols,
    srcs_to_format,
    sweep_blocks,
)

BP = 128


@pytest.fixture(scope="module")
def setup():
    m = generate_mesh(7, 6, 5, jitter=0.05, diag_frac=0.25, shuffle=True,
                      seed=11)
    npoint_dev = ((m.npoint + BP - 1) // BP) * BP + BP
    inv = np.zeros(npoint_dev)
    inv[: m.npoint] = 1.0 / m.volume
    plan = build_block_plan(m.faces.astype(np.int32), m.normals, npoint_dev,
                            inv, bp=BP, all_blocks=True)
    var = make_state(m.npoint, 7, seed=3, dtype=np.float32)
    var_T = np.zeros((NV, npoint_dev), np.float32)
    var_T[:7, : m.npoint] = var.T
    var_T = jnp.asarray(var_T)
    pa = {
        "block_ids": jnp.asarray(plan.block_ids),
        "slot_idx": jnp.asarray(plan.slot_idx),
        "slot_w": jnp.asarray(plan.slot_w),
        "scale": jnp.asarray(plan.scale),
    }
    pa["exts"] = gather_exts(var_T, jnp.asarray(plan.ext_idx))
    srcs_ref = gather_srcs(var_T, jnp.asarray(slot_src_cols(plan)))
    return m, plan, var_T, pa, srcs_ref


def _pack(plan, var_T, pa, fmt):
    return pack_srcs(var_T, pa, bp=BP, ep=plan.ep, kslots=plan.kslots,
                     nblocks=plan.nblocks, interpret=True, src_format=fmt)


def test_pack_srcs_f32_bitwise(setup):
    m, plan, var_T, pa, srcs_ref = setup
    got = np.asarray(_pack(plan, var_T, pa, "f32"))
    np.testing.assert_array_equal(got, np.asarray(srcs_ref))


def test_plan_ext_cnt_metadata(setup):
    """BlockPlan.ext_cnt (host-side geometry metadata) counts the REAL ext
    columns per block — consistent between the NumPy and native builders
    (tests/test_native.py covers the parity) and bounded by the padded EP.
    Kernel-side dynamic pass bounds built on it are a measured dead end
    (5.7x slower; see ops/blocksweep.py note)."""
    m, plan, var_T, pa, srcs_ref = setup
    assert plan.ext_cnt is not None
    assert plan.ext_cnt.shape == (plan.nblocks,)
    assert (plan.ext_cnt >= 0).all() and (plan.ext_cnt <= plan.ep).all()
    # each block's ext_idx has exactly ext_cnt leading real entries: entries
    # past the count are padding zeros
    for b in range(plan.nblocks):
        c = int(plan.ext_cnt[b])
        assert (plan.ext_idx[b, c:] == 0).all()


def test_pack_srcs_bf16d_bitwise(setup):
    """The Pallas bf16-delta pack equals the XLA reference (same gather,
    same subtraction, same rounding) — including padding slots, which
    resolve to a deterministic valid column in both paths."""
    m, plan, var_T, pa, srcs_ref = setup
    got = np.asarray(_pack(plan, var_T, pa, "bf16d"))
    want = np.asarray(srcs_to_format(srcs_ref, var_T, pa["block_ids"], BP,
                                     "bf16d"))
    assert got.dtype == want.dtype == jnp.bfloat16
    np.testing.assert_array_equal(got.astype(np.float32),
                                  want.astype(np.float32))


# ---------------------------------------------------------- compact layout

CBP = 256


@pytest.fixture(scope="module")
def csetup():
    """Degree-sorted single-block fixture at bp=256 so the compact prefix
    widths genuinely shrink (the second 128-lane tile holds only low-degree
    points → high slots span one tile, not two)."""
    m = generate_mesh(7, 6, 5, jitter=0.05, diag_frac=0.25, shuffle=True,
                      seed=11)
    deg = np.bincount(m.faces.ravel(), minlength=m.npoint)
    order = np.lexsort((np.arange(m.npoint), -deg))
    new_of_old = np.empty(m.npoint, np.int64)
    new_of_old[order] = np.arange(m.npoint)
    faces = new_of_old[m.faces].astype(np.int32)
    volume = np.empty_like(m.volume)
    volume[new_of_old] = m.volume

    npoint_dev = ((m.npoint + CBP - 1) // CBP) * CBP + CBP
    inv = np.zeros(npoint_dev)
    inv[: m.npoint] = 1.0 / volume
    plan = build_block_plan(faces, m.normals, npoint_dev, inv, bp=CBP,
                            all_blocks=True)
    wks = prefix_widths(plan.slot_w, CBP)
    var = make_state(m.npoint, 7, seed=3, dtype=np.float32)
    var_T = np.zeros((NV, npoint_dev), np.float32)
    var_T[:7, new_of_old] = var.T
    var_T = jnp.asarray(var_T)
    pa = {
        "block_ids": jnp.asarray(plan.block_ids),
        "slot_idx": jnp.asarray(plan.slot_idx),
        "slot_w": jnp.asarray(plan.slot_w),
        "scale": jnp.asarray(plan.scale),
    }
    pa["exts"] = gather_exts(var_T, jnp.asarray(plan.ext_idx))
    srcs_ref = gather_srcs(var_T, jnp.asarray(slot_src_cols(plan)))
    pac = dict(pa)
    pac["slot_w"] = jnp.asarray(compact_slot_w(plan.slot_w, wks))
    pac["srcs"] = compact_srcs(srcs_ref, wks)
    return m, plan, wks, var_T, pa, pac, srcs_ref


def test_prefix_widths_properties(csetup):
    """Widths are 128-multiples, monotone non-increasing, cover every
    nonzero weight, and actually compact this fixture."""
    m, plan, wks, *_ = csetup
    assert len(wks) == plan.kslots
    assert all(w % 128 == 0 for w in wks)
    assert all(wks[i] >= wks[i + 1] for i in range(len(wks) - 1))
    for k, w in enumerate(wks):
        assert (plan.slot_w[:, k, :, w:] == 0).all()
    assert compact_len(wks) < plan.kslots * CBP  # real compaction happened


def test_compact_sweep_bitwise_equals_uncompacted(csetup):
    """The compact packed sweep drops only exactly-zero-weight slots, so per
    point it adds the same terms in the same order — outputs equal."""
    m, plan, wks, var_T, pa, pac, srcs_ref = csetup
    common = dict(bp=CBP, ep=plan.ep, kslots=plan.kslots,
                  nblocks=plan.nblocks, interpret=True, packed=True)
    pa_full = dict(pa)
    pa_full["srcs"] = srcs_ref
    want = np.asarray(sweep_blocks(var_T, pa_full, **common))
    got = np.asarray(sweep_blocks(var_T, pac, wks=wks, **common))
    np.testing.assert_array_equal(got, want)
    # accumulate path (boundary∘interior chaining uses init seeding)
    init = jnp.asarray(
        np.random.default_rng(0).normal(size=want.shape).astype(np.float32))
    want_i = np.asarray(sweep_blocks(var_T, pa_full, init=init, **common))
    got_i = np.asarray(sweep_blocks(var_T, pac, wks=wks, init=init, **common))
    np.testing.assert_array_equal(got_i, want_i)


def test_compact_sweep_bf16d_and_flux(csetup):
    """Compact layout under the bf16-delta source format and the flux op."""
    m, plan, wks, var_T, pa, pac, srcs_ref = csetup
    common = dict(bp=CBP, ep=plan.ep, kslots=plan.kslots,
                  nblocks=plan.nblocks, interpret=True, packed=True)
    deltas = srcs_to_format(srcs_ref, var_T, pa["block_ids"], CBP, "bf16d")
    pa_full = dict(pa)
    pa_full["srcs"] = deltas
    pac_bf = dict(pac)
    pac_bf["srcs"] = compact_srcs(deltas, wks)
    want = np.asarray(sweep_blocks(var_T, pa_full, src_format="bf16d",
                                   **common))
    got = np.asarray(sweep_blocks(var_T, pac_bf, wks=wks,
                                  src_format="bf16d", **common))
    np.testing.assert_array_equal(got, want)

    pa_fx = dict(pa)
    pa_fx["srcs"] = srcs_ref
    want_fx = np.asarray(sweep_blocks(var_T, pa_fx, op="flux", **common))
    got_fx = np.asarray(sweep_blocks(var_T, pac, wks=wks, op="flux",
                                     **common))
    np.testing.assert_array_equal(got_fx, want_fx)


def test_pack_srcs_compact_bitwise(csetup):
    """The compact Pallas re-pack equals compact_srcs of the XLA reference
    gather, in both source formats."""
    m, plan, wks, var_T, pa, pac, srcs_ref = csetup

    def packc(fmt):
        return pack_srcs(var_T, pa, bp=CBP, ep=plan.ep, kslots=plan.kslots,
                         nblocks=plan.nblocks, interpret=True,
                         src_format=fmt, wks=wks)

    got = np.asarray(packc("f32"))
    np.testing.assert_array_equal(got, np.asarray(compact_srcs(srcs_ref,
                                                               wks)))
    got_bf = np.asarray(packc("bf16d")).astype(np.float32)
    deltas = srcs_to_format(srcs_ref, var_T, pa["block_ids"], CBP, "bf16d")
    want_bf = np.asarray(compact_srcs(deltas, wks)).astype(np.float32)
    np.testing.assert_array_equal(got_bf, want_bf)


def test_dst_lt_drops_ghost_destination_slots(setup):
    """dst_lt=n: no slot lands on a destination column >= n, other-endpoint
    reads are unrestricted, and owned-column sums are unchanged."""
    m, plan, var_T, pa, srcs_ref = setup
    cut = (m.npoint // 2) | 1
    npoint_dev = plan.npoint_dev
    inv = np.zeros(npoint_dev)
    inv[: m.npoint] = 1.0
    p2 = build_block_plan(m.faces.astype(np.int32), m.normals, npoint_dev,
                          inv, bp=BP, all_blocks=True, dst_lt=cut)
    # weights vanish at/above the cut, survive below it
    for b in range(p2.nblocks):
        base = int(p2.block_ids[b]) * BP
        lanes = np.arange(BP) + base
        w_any = (p2.slot_w[b] != 0).any(axis=(0, 1))
        assert not w_any[lanes >= cut].any()
    full = build_block_plan(m.faces.astype(np.int32), m.normals, npoint_dev,
                            inv, bp=BP, all_blocks=True)
    # per-point slot multiset below the cut is identical (same order too)
    for b in range(full.nblocks):
        base = int(full.block_ids[b]) * BP
        sel = np.arange(BP) + base < cut
        np.testing.assert_array_equal(p2.slot_w[b][..., sel],
                                      full.slot_w[b][..., sel])


def test_gather_compact_skip_nonmonotone_widths():
    """prefix_widths need NOT be monotone non-increasing: a slot serving
    only zero-normal (degenerate) faces stores all-zero weights and can
    measure narrower than a later slot.  The gather kernel's compact tile
    skip must enumerate live slots per-slot — regression for a first-kt
    prefix loop that silently dropped a live later slot (wrong gradients,
    no error) on such meshes."""
    bp = 256
    npoint_dev = bp
    # point 200: three faces, the SECOND with an exactly zero normal ->
    # its slot-1 weight is all-zero; point 5 keeps slot 1 alive only in
    # the first 128-lane tile.  Widths come out (256, 128, 256).
    faces = np.array([[200, 1], [200, 2], [200, 3], [5, 6], [5, 7]],
                     np.int32)
    normals = np.array([[1.0, 0, 0], [0, 0, 0], [0, 1.0, 0],
                        [1.0, 1.0, 0], [0, 1.0, 1.0]], np.float32)
    inv = np.ones(npoint_dev)
    plan = build_block_plan(faces, normals, npoint_dev, inv, bp=bp)
    wks = prefix_widths(plan.slot_w, bp)
    assert list(wks) == [256, 128, 256]        # non-monotone by construction
    rng = np.random.default_rng(7)
    var = rng.standard_normal((npoint_dev, 7)).astype(np.float32)
    var_T = np.zeros((NV, npoint_dev), np.float32)
    var_T[:7] = var.T
    var_T = jnp.asarray(var_T)
    pa = {
        "block_ids": jnp.asarray(plan.block_ids),
        "slot_idx": jnp.asarray(plan.slot_idx),
        "slot_w": jnp.asarray(plan.slot_w),
        "scale": jnp.asarray(plan.scale),
    }
    pa["exts"] = gather_exts(var_T, jnp.asarray(plan.ext_idx))
    common = dict(bp=bp, ep=plan.ep, kslots=plan.kslots,
                  nblocks=plan.nblocks, interpret=True)
    want = np.asarray(sweep_blocks(var_T, pa, **common))
    got = np.asarray(sweep_blocks(var_T, pa, wks=wks, **common))
    # the skip only removes provably inert (tile, slot) work
    np.testing.assert_array_equal(got, want)
    # absolute anchor: point 200's third face must be present
    from cfd_proxy_tpu.ops.golden import compute_gradients_gg
    g = compute_gradients_gg(var, faces, normals)          # (npts, nvar, 3)
    for d in range(3):      # out rows are d-major with NV(=8)-padded stride
        np.testing.assert_allclose(got[d * NV : d * NV + 7], g[:, :, d].T,
                                   rtol=1e-5, atol=1e-5)


def test_sweep_bf16d_matches_manual(setup):
    """sweep_blocks(src_format='bf16d') == the same accumulation computed in
    NumPy from the bf16 deltas (per-slot order, f32 accumulate)."""
    m, plan, var_T, pa, srcs_ref = setup
    deltas = np.asarray(srcs_to_format(srcs_ref, var_T, pa["block_ids"], BP,
                                       "bf16d")).astype(np.float32)
    pa2 = dict(pa)
    pa2["srcs"] = jnp.asarray(deltas).astype(jnp.bfloat16)
    got = np.asarray(sweep_blocks(
        var_T, pa2, bp=BP, ep=plan.ep, kslots=plan.kslots,
        nblocks=plan.nblocks, interpret=True, packed=True,
        src_format="bf16d"))
    # manual: acc_k += w_k * (own + 0.5*delta_k), then scale
    vt = np.asarray(var_T)
    nb = plan.nblocks
    want = np.zeros((3 * NV, vt.shape[1]), np.float32)
    for bi in range(nb):
        b = int(plan.block_ids[bi])
        own = vt[:, b * BP : (b + 1) * BP]                     # (NV, BP)
        acc = np.zeros((3, NV, BP), np.float32)
        for k in range(plan.kslots):
            avg = own + 0.5 * deltas[bi, k]                    # (NV, BP)
            acc = acc + plan.slot_w[bi, k][:, None, :] * avg[None, :, :]
        want[:, b * BP : (b + 1) * BP] = (
            acc.reshape(3 * NV, BP) * plan.scale[bi, 0][None, :])
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-5)
