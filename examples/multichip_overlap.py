"""Example: the multi-device deployment path — sharding, phase topology,
and the three exchange schedules.

This is the workflow a user runs on a real TPU slice (here on the virtual
8-device CPU mesh so it works anywhere):

1. partition a mesh one-shard-per-device (with a 2-device-deep ghost
   closure handled by `partition_mesh`),
2. build `GreenGaussPallas` over all devices with `slice_size` describing
   the hardware (devices within a slice talk over ICI, across slices over
   DCN — the topology schedules ICI phases before DCN phases so the
   early/overlap schedules hide the slow hops under interior compute,
   ARCHITECTURE.md §3),
3. inspect the halo-exchange phase schedule the edge coloring produced,
4. run all three schedules (reference analogues: bulk-sync MPI, early
   two-sided recv, GASPI write+notify — SURVEY.md §5.8) and check they
   agree with each other and with the NumPy golden.

On real hardware the solver CLI reports per-schedule timings and
`overlap_efficiency = (t_bulk − t_overlap) / (t_bulk − t_nocomm)` when the
comm cost is measurable (P > 1); on this CPU example timings are
meaningless, so the demonstration is the API + bit-level agreement.

Run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_overlap.py
"""

import numpy as np

import jax

if jax.default_backend() not in ("tpu",):
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

from cfd_proxy_tpu.mesh.generator import generate_mesh, make_state
from cfd_proxy_tpu.mesh.partition import partition_mesh
from cfd_proxy_tpu.models import GreenGaussPallas
from cfd_proxy_tpu.ops.golden import compute_gradients_gg, scale_gradients

SCHEDULES = ("bulk", "early", "overlap")


def main(nx=12, ny=12, nz=10, nparts=None, slice_size=4, verbose=True):
    nparts = nparts or min(8, jax.device_count())
    slice_size = min(slice_size, nparts)
    mesh = generate_mesh(nx, ny, nz, jitter=0.05, diag_frac=0.2, seed=0)
    parts = partition_mesh(mesh, npart=nparts, ghost_layers=1)
    model = GreenGaussPallas(parts, nvar=7, slice_size=slice_size)

    topo = model.topology
    if verbose:
        print(f"mesh: {mesh.npoint} points / {mesh.nface} faces, "
              f"{nparts} shards, slice_size={slice_size}")
        print(f"halo topology: {topo.nphases} ppermute phase(s), "
              f"{topo.nrounds} round(s)")
        for i, ph in enumerate(topo.phases):
            kind = "DCN (inter-slice)" if ph.inter_slice else "ICI"
            print(f"  phase {i}: round {ph.round}, {len(ph.perm)} edges, "
                  f"{ph.send_idx.shape[1]} pts/device max, {kind}")

    q0 = make_state(mesh.npoint, 7, seed=1)
    state = model.distribute_state(q0)
    grads = {s: model.gather_global(model.step(state, s)) for s in SCHEDULES}

    ref = scale_gradients(
        compute_gradients_gg(q0.astype(np.float64), mesh.faces, mesh.normals),
        mesh.volume, mesh.npoint).reshape(mesh.npoint, -1)
    denom = max(1.0, float(np.abs(ref).max()))
    out = {}
    for s in SCHEDULES:
        out[f"{s}_vs_golden"] = float(
            np.abs(grads[s] - ref).max() / denom)
        if s != "bulk":
            out[f"{s}_vs_bulk"] = float(np.abs(grads[s] - grads["bulk"]).max())
    if verbose:
        for k, v in out.items():
            print(f"{k} = {v:.3e}")
        print("done")
    return topo, out


if __name__ == "__main__":
    main()
