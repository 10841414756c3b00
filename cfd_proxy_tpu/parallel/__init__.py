"""L4: the exchange layer — XLA collectives over ICI via shard_map + ppermute.

Reference equivalents: `exchange_data_mpi.c` (two-sided), `exchange_data_mpidma.c`
(MPI RMA), `exchange_data_gaspi.c` (GPI-2 write_notify) — SURVEY.md §2 L4,
§4.5, §5.8.  On TPU all ICI transfers are already one-sided DMA, so the
reference's three transports collapse into ONE transport (collective permutes)
and the transport×schedule matrix survives as a *schedule* axis:

  bulk    — full sweep → exchange (barrier semantics; `Isend/Irecv/Waitall`
            after compute);
  early   — boundary sweep → exchange started → interior sweep independent of
            the exchange → merge (the early-posted-receive / async-collective
            analogue; XLA overlaps the ppermute with the interior kernel);
  overlap — the GASPI full-overlap analogue: a fused Pallas kernel pushes
            halo data with `make_async_remote_copy` RDMA while computing
            interior faces (ops/blocksweep.py::sweep_blocks_overlap, wired in
            models/gradients_pallas.py).
"""

from cfd_proxy_tpu.parallel.topology import HaloTopology, build_halo_topology
from cfd_proxy_tpu.parallel.halo import DeviceHalo, device_halo, exchange

__all__ = [
    "HaloTopology",
    "build_halo_topology",
    "DeviceHalo",
    "device_halo",
    "exchange",
]
