"""Halo topology / device layout invariants."""

import numpy as np
import pytest

from cfd_proxy_tpu.mesh.generator import generate_mesh
from cfd_proxy_tpu.mesh.partition import partition_mesh
from cfd_proxy_tpu.parallel.tlayout import build_tlayout
from cfd_proxy_tpu.parallel.topology import build_halo_topology


@pytest.fixture(scope="module", params=[(4, 1), (8, 2), (5, 1)])
def setup(request):
    npart, gl = request.param
    mesh = generate_mesh(9, 8, 7, jitter=0.05, diag_frac=0.25, seed=61)
    parts = partition_mesh(mesh, npart, ghost_layers=gl)
    npoint_pad = max(p.npoint for p in parts) + 1
    topo = build_halo_topology(parts, npoint_pad)
    return parts, topo


def test_phases_are_partial_matchings(setup):
    parts, topo = setup
    for ph in topo.phases:
        srcs = [s for s, _ in ph.perm]
        dsts = [d for _, d in ph.perm]
        assert len(set(srcs)) == len(srcs), "duplicate sender in a phase"
        assert len(set(dsts)) == len(dsts), "duplicate receiver in a phase"
    # rounds are ordered
    rounds = [ph.round for ph in topo.phases]
    assert rounds == sorted(rounds)


def test_every_edge_scheduled_once(setup):
    parts, topo = setup
    want = set()
    for p in parts:
        for e in p.comm:
            if e.sendidx.size:
                want.add((p.part_id, e.partner, e.round))
    got = set()
    for ph in topo.phases:
        for (s, d) in ph.perm:
            key = (s, d, ph.round)
            assert key not in got, "edge scheduled twice"
            got.add(key)
    assert got == want


def test_tlayout_permutation_completion(setup):
    parts, topo = setup
    lay = build_tlayout(parts, topo)
    P = len(parts)
    for k in range(lay.nphases):
        # dsts/srcs rows form a full permutation (uniform RDMA participation)
        assert sorted(lay.dsts[:, k]) == list(range(P))
        assert sorted(lay.srcs[:, k]) == list(range(P))
        # consistency: srcs is the inverse of dsts
        for d in range(P):
            assert lay.srcs[lay.dsts[d, k], k] == d
    # every local point has a unique device column
    for lm in lay.locmap:
        assert np.unique(lm).size == lm.size
        assert lm.max() < lay.ndev
    # ghost columns land inside their phase region
    for d, p in enumerate(parts):
        for e in p.comm:
            cols = lay.locmap[d][e.recvidx]
            if cols.size == 0:
                continue
            k = (cols.min() - lay.ghost_start) // lay.s_max
            assert (cols >= lay.ghost_start + k * lay.s_max).all()
            assert (cols < lay.ghost_start + (k + 1) * lay.s_max).all()
