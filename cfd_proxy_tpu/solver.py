"""Benchmark driver CLI — the `solver.c` / `cfd_proxy.c` `main` analogue.

Mirrors the reference driver's structure (SURVEY.md §4.1/§4.2): obtain a
partitioned mesh (read netCDF files, or generate+partition in-process), set up
comm metadata and sweep plans, loop over comm variants × iterations, time
each, verify variants against the bulk-sync reference result, and print a
min/median/max table with speedups.

Usage examples:
    python -m cfd_proxy_tpu.solver --nx 40 --ny 40 --nz 40 --parts 4 \
        --schedule all --iters 20
    python -m cfd_proxy_tpu.solver --mesh data/m --parts 8 --schedule overlap
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from dataclasses import dataclass

import numpy as np

from cfd_proxy_tpu.mesh.generator import generate_mesh, make_state
from cfd_proxy_tpu.mesh.partition import partition_mesh
from cfd_proxy_tpu.mesh.reader import partition_path, read_partition
from cfd_proxy_tpu.parallel.schedules import SCHEDULES
from cfd_proxy_tpu.utils.timing import (IterationStats, format_stats_table,
                                        two_point_sampler)


@dataclass
class SolverConfig:
    nx: int = 24
    ny: int = 24
    nz: int = 24
    mesh_prefix: str | None = None
    parts: int = 1
    ghost_layers: int = 1
    nvar: int = 7          # TAU-like variable count (SURVEY.md §4.3 [M])
    iters: int = 20
    warmup: int = 3
    schedule: str = "all"
    backend: str = "pallas"     # pallas (production) | xla (reference)
    model: str = "gg"           # gg (Green-Gauss gradients) | flux (PSD flux)
    kernel: str = "packed"      # packed (streaming, production) | gather
                                # (memory-lean cross-check) — blocksweep.py
    force_rdma: bool = False    # keep the fused RDMA overlap kernel even
                                # with no real transfers (P=1 self-send —
                                # hardware proof of the GASPI analogue)
    slice_size: int | None = None   # devices per TPU slice: intra-slice
                                    # (ICI) halo phases scheduled before
                                    # inter-slice (DCN) ones
    meta_dtype: str = "float32"     # bfloat16 halves the slot-weight stream
                                    # (~1e-3 rel error bound; BASELINE.md)
    src_dtype: str = "float32"      # bfloat16 = delta-packed bf16 slot
                                    # sources: srcs stream halves, ~17%
                                    # faster, ~1e-3 rel bound (BASELINE.md)
    kcompact: bool | None = None    # compact prefix slot mode: packed
                                    # kernel drops the inert padding slots
                                    # from its srcs/slot_w streams; gather
                                    # kernel skips the dead (tile, slot)
                                    # gather pairs; None = auto (on)
    halo_dtype: str = "float32"     # bfloat16 halves the exchanged gradient
                                    # payloads on the wire (pack-time cast,
                                    # unpack upcast); ghost gradients carry
                                    # a ~4e-3 rel bound, owned untouched
    overlap_debug: str | None = None    # fused-RDMA fixed-cost attribution
                                        # (nobar|nodma|...) — P=1 timing
                                        # only; see sweep_blocks_overlap
    pack_force: str | None = None   # benchmark-only: "gather" disables the
                                    # slice/segs pack lowerings (paired A/B
                                    # of the segmented lanes vs the
                                    # windowed column gather)
    min_phases: int = 1         # pad the exchange schedule to this many
                                # phases (self-sends) — multi-phase RDMA
                                # machinery on one chip
    fake_sends: int = 0         # benchmark-only: padded phases carry REAL
                                # shuffled-owned payloads of this many
                                # lanes (self-sends; owned results
                                # unchanged) — measures P>1-shaped pack/
                                # exchange fixed costs on one chip
    fake_tail_frac: float = 0.0     # benchmark-only, with fake_sends: the
                                    # trailing fraction of fake lanes packs
                                    # by GATHER (strided tail) — reproduces
                                    # the real mixed slices+tail layout
    grad_dtype: str = "float32"     # bfloat16 stores the gradient planes
                                    # (the largest remaining f32 stream) in
                                    # bf16: ~5.6% paired win on top of the
                                    # reduced-precision mode; results carry
                                    # a ~4e-3 field-norm bound (BASELINE.md)
    bp: int | None = None       # points per Pallas block — the thread-config
                                # analogue (reference: pthread count sweeps).
                                # None = AUTO: 4096 for shards >= ~256k
                                # points, 1024 below (paired small-shard
                                # scan, BASELINE.md); explicit values follow
                                # the paired big-mesh scan (f32 flat
                                # 2048-4096, bf16 best at 4096, 8192
                                # regresses 23%)
    dtype: str = "float32"
    diag_frac: float = 0.2
    jitter: float = 0.05
    stretch: float = 1.0    # geometric z-spacing growth (boundary-layer
                            # anisotropy, the F6-like mesh family)
    hub_frac: float = 0.0   # high-valence tail stress: fraction of points
                            # gaining hub_extra second-shell edges (real
                            # TAU meshes carry K up to ~16-20 near singular
                            # vertices; the base generator tops out at 8)
    hub_extra: int = 12
    seed: int = 0
    platform: str | None = None     # force a jax platform (e.g. cpu) before
                                    # backend init — the TPU plugin ignores
                                    # JAX_PLATFORMS, so "cpu" here is the
                                    # only way to get the virtual multi-
                                    # device mesh on a TPU host
    solver_mode: bool = False   # time the FULL per-time-step dataflow
                                # (sweep + state update + var halo exchange
                                # + table rebuild) instead of the proxy's
                                # static-state iteration; pallas backend only
    sweeps_per_step: int = 1    # solver-mode only: gradient evaluations per
                                # table rebuild — a multi-stage solver (RK
                                # stages, multigrid) re-evaluates gradients
                                # more often than it re-packs; amortizes the
                                # rebuild-bound per-step cost (BASELINE.md)
    verify: bool = True
    json_out: bool = False
    profile_dir: str | None = None   # jax.profiler trace output (optional)


def solver_mode_defaults(sweeps_per_step: int = 1) -> tuple[str, int | None]:
    """The DECIDED solver-mode kernel config per sweeps_per_step — the ONE
    place the measured crossover lives (paired verdicts, BASELINE.md round
    5: gather/512 wins at N<=2 (0.80 at N=2), packed/auto from N=4 (1.05),
    crossover ~N=3).  Shared by the CLI's --solver-mode defaulting and
    bench.py's sweeps table so the recorded artifact and the CLI cannot
    drift apart.  Returns (kernel, bp); bp None = the model's AUTO rule."""
    return ("gather", 512) if sweeps_per_step <= 2 else ("packed", None)


def build_model(cfg: SolverConfig):
    import jax.numpy as jnp

    from cfd_proxy_tpu.models import GreenGaussModel

    if cfg.mesh_prefix:
        try:
            parts = [
                read_partition(partition_path(cfg.mesh_prefix, i, cfg.parts))
                for i in range(cfg.parts)
            ]
        except FileNotFoundError as e:
            raise SystemExit(
                f"mesh partition file not found: {e.filename} — expected "
                f"<prefix>.<parts>p.<i>.nc; generate with "
                f"`python -m cfd_proxy_tpu.tools.partition --parts {cfg.parts} "
                f"--out {cfg.mesh_prefix}` (plus your --nx/--ny/--nz/"
                f"--ghost-layers/--seed — the tool's defaults are a 24^3 mesh)"
            )
        gmesh = None
    else:
        gmesh = generate_mesh(
            cfg.nx, cfg.ny, cfg.nz, jitter=cfg.jitter, diag_frac=cfg.diag_frac,
            seed=cfg.seed, stretch=cfg.stretch,
            hub_frac=cfg.hub_frac, hub_extra=cfg.hub_extra,
        )
        parts = partition_mesh(gmesh, cfg.parts, ghost_layers=cfg.ghost_layers)
    if cfg.backend == "pallas":
        from cfd_proxy_tpu.models import GreenGaussPallas

        if cfg.dtype != "float32":
            raise SystemExit("pallas backend is float32; use --backend xla for f64")
        model = GreenGaussPallas(parts, cfg.nvar, op=cfg.model, bp=cfg.bp,
                                 kernel=cfg.kernel, force_rdma=cfg.force_rdma,
                                 slice_size=cfg.slice_size,
                                 meta_dtype=cfg.meta_dtype,
                                 src_dtype=cfg.src_dtype,
                                 kcompact=cfg.kcompact,
                                 halo_dtype=cfg.halo_dtype,
                                 grad_dtype=cfg.grad_dtype,
                                 overlap_debug=cfg.overlap_debug,
                                 min_phases=cfg.min_phases,
                                 fake_sends=cfg.fake_sends,
                                 fake_tail_frac=cfg.fake_tail_frac,
                                 pack_force=cfg.pack_force)
    else:
        if cfg.model != "gg":
            raise SystemExit("--model flux requires --backend pallas")
        devices = None
        if cfg.dtype == "float64":
            # without this, jax silently truncates to f32 and the f64
            # verification anchor quietly degrades
            import jax

            jax.config.update("jax_enable_x64", True)
            devices = f64_devices(cfg.parts)
        dtype = {"float32": jnp.float32, "float64": jnp.float64}[cfg.dtype]
        model = GreenGaussModel(parts, cfg.nvar, dtype=dtype, devices=devices,
                                slice_size=cfg.slice_size)
    return model, gmesh


def f64_devices(parts: int):
    """Devices for the f64 verification gate: CPU on TPU hosts (axon's f64
    TPU compiles hang).  Grows the CPU device pool if the backend is not yet
    initialised; otherwise explains how to pre-size it."""
    import jax

    # size the CPU pool BEFORE anything initialises the backend (querying
    # default_backend/devices initialises it and freezes the device count)
    try:
        jax.config.update("jax_num_cpu_devices", max(parts, 1))
    except RuntimeError:
        pass
    if jax.default_backend() != "tpu":
        return None
    devs = jax.devices("cpu")
    if len(devs) < parts:
        raise SystemExit(
            f"f64 runs on CPU devices on a TPU host, but only {len(devs)} "
            f"are available; rerun with XLA_FLAGS="
            f"--xla_force_host_platform_device_count={parts}"
        )
    return devs[:parts]


def _sync_scalar(out) -> float:
    """Force completion by pulling ONE scalar to the host (device→host bulk
    transfers and block_until_ready are unreliable/slow over the axon tunnel)."""
    return float(np.asarray(out[(0,) * out.ndim]))


def time_schedule(
    model, var, schedule: str, iters: int, warmup: int, repeats: int = 3,
    solver_mode: bool = False, sweeps_per_step: int = 1,
) -> IterationStats:
    """Two-point timing: run chained loops of n0 and n0+iters iterations in
    single dispatches; the difference isolates per-iteration time from the
    per-dispatch overhead (~30 ms through the tunnel)."""
    n0 = max(1, iters // 10)
    kw = ({"solver_mode": True, "sweeps_per_step": sweeps_per_step}
          if solver_mode else {})
    small = model.iterate_fn(schedule, n0, **kw)
    big = model.iterate_fn(schedule, n0 + iters, **kw)
    args = model.iter_args(var)
    _sync_scalar(small(*args))  # compile
    _sync_scalar(big(*args))    # compile
    for _ in range(max(0, warmup)):
        # untimed settling runs beyond the compile itself — the first
        # post-compile dispatches through the tunnel are routinely slower
        # (remote executable caching); --warmup sets how many to burn.
        # Burn BOTH runners: the two-point diff is big − small, so a
        # still-cold small runner biases every sample low (kbench/mbench
        # settle both sides for the same reason)
        _sync_scalar(small(*args))
        _sync_scalar(big(*args))
    stats = IterationStats(schedule)
    sample = two_point_sampler(lambda: _sync_scalar(small(*args)),
                               lambda: _sync_scalar(big(*args)), iters)
    for _ in range(repeats):
        v = sample()
        if v is not None:
            stats.add(v)
    if stats.n == 0:
        # every repeat was below the tunnel's dispatch-noise floor: the
        # two-point difference no longer measures the iteration — report NaN
        # rather than a fantastical faces/sec (tiny meshes)
        stats.add(float("nan"))
    return stats


def run(cfg: SolverConfig) -> tuple[dict, list[IterationStats]]:
    import jax

    if cfg.platform:
        # jax silently IGNORES jax_platforms updates once the backend is
        # initialised — verify the request actually took effect rather than
        # proceeding on the wrong platform
        jax.config.update("jax_platforms", cfg.platform)
        got = jax.default_backend()
        if got != cfg.platform:
            raise SystemExit(
                f"--platform {cfg.platform} did not take effect (backend is "
                f"{got!r} — jax was already initialised in this process; "
                f"set the platform before any jax use)")
    if cfg.solver_mode and cfg.backend != "pallas":
        raise SystemExit("--solver-mode requires the pallas backend")
    if cfg.sweeps_per_step > 1 and not cfg.solver_mode:
        raise SystemExit("--sweeps-per-step requires --solver-mode (the "
                         "static iteration never rebuilds tables)")
    model, gmesh = build_model(cfg)
    nface_total = sum(p.nface for p in model.parts)
    npoint_total = sum(p.nowned for p in model.parts)

    rng_state = make_state(npoint_total, cfg.nvar, seed=cfg.seed + 1)
    if cfg.backend == "pallas" and cfg.schedule != "all":
        # single-schedule runs skip the unused table classes (the packed
        # srcs tables are the largest arrays in HBM); verification also
        # steps the bulk reference
        scheds = [cfg.schedule] + (
            ["bulk"] if cfg.verify and cfg.schedule != "bulk" else [])
        var = model.distribute_state(rng_state, schedules=scheds)
    else:
        var = model.distribute_state(rng_state)

    schedules = list(SCHEDULES) if cfg.schedule == "all" else [cfg.schedule]
    all_stats: list[IterationStats] = []
    results: dict = {
        "device": str(model.mesh.devices.flatten()[0]),
        "npart": len(model.parts),
        "npoint": npoint_total,
        "nface": nface_total,
        "nvar": cfg.nvar,
        "dtype": cfg.dtype,
        "src_dtype": cfg.src_dtype,
        "grad_dtype": cfg.grad_dtype,
        "solver_mode": cfg.solver_mode,
        "sweeps_per_step": cfg.sweeps_per_step if cfg.solver_mode else None,
        "backend": cfg.backend,
        "kernel": cfg.kernel,
        # effective block size (the model caps cfg.bp at the shard size)
        "bp": getattr(model, "bp", None),
        "iters": cfg.iters,
        "schedules": {},
    }

    profiler_cm = None
    if cfg.profile_dir:
        # optional device traces (SURVEY.md §5.1: the reference has only
        # self-timing; we add jax.profiler on request). May be unsupported
        # on tunneled backends — degrade gracefully.
        try:
            import jax.profiler

            profiler_cm = jax.profiler.trace(cfg.profile_dir)
            profiler_cm.__enter__()
        except Exception as e:  # pragma: no cover
            print(f"profiler unavailable: {e}", file=__import__("sys").stderr)
            profiler_cm = None

    try:
        # compute-only floor, for overlap efficiency (only worth a compile
        # when several schedules are being compared)
        nocomm = None
        if len(schedules) > 1:
            nocomm = time_schedule(model, var, "nocomm", cfg.iters, cfg.warmup,
                                   solver_mode=cfg.solver_mode,
                                   sweeps_per_step=cfg.sweeps_per_step)
        bulk_med = None
        for s in schedules:
            st = time_schedule(model, var, s, cfg.iters, cfg.warmup,
                               solver_mode=cfg.solver_mode,
                               sweeps_per_step=cfg.sweeps_per_step)
            all_stats.append(st)
            if s == "bulk":
                bulk_med = st.median
            entry = st.summary()
            # solver mode with N>1 sweeps/step evaluates gradients over
            # nface N times per timed iteration — faces/sec counts SWEPT
            # faces so the amortization shows up as effective throughput
            sweeps = (cfg.sweeps_per_step
                      if cfg.solver_mode and cfg.sweeps_per_step > 1 else 1)
            entry["faces_per_sec"] = nface_total * sweeps / st.median
            results["schedules"][s] = entry
        if nocomm is not None:
            all_stats.append(nocomm)
            comm_cost = (bulk_med - nocomm.median) if bulk_med else None
            for s in schedules:
                if s == "bulk":
                    continue
                # noise gate: a comm cost under 5% of the bulk median is
                # indistinguishable from two-point timing noise on this
                # tunnel — a ratio of two noise terms is not a measurement
                if (comm_cost and comm_cost > 0 and bulk_med
                        and comm_cost >= 0.05 * bulk_med):
                    exposed = results["schedules"][s]["median_s"] - nocomm.median
                    results["schedules"][s]["overlap_efficiency"] = float(
                        np.clip(1.0 - exposed / comm_cost, 0.0, 1.0)
                    )
                else:
                    # the secondary metric (BASELINE.json) must be REPORTED,
                    # not silently omitted — null with the ACTUAL reason
                    # attached: the P=1 self-send explanation must not be
                    # stamped on a multi-chip run whose comm merely sits at
                    # the noise floor of this topology
                    if cfg.parts <= 1:
                        why = ("at P=1 the exchange is pack/unpack + "
                               "self-send only — real overlap efficiency "
                               "needs multi-chip")
                    else:
                        why = (f"at P={cfg.parts} on this topology the "
                               f"measured comm cost is below the 5% noise "
                               f"gate — overlap has nothing measurable to "
                               f"hide here")
                    results["schedules"][s]["overlap_efficiency"] = None
                    results["schedules"][s]["overlap_efficiency_note"] = (
                        "comm cost unmeasurable (bulk - nocomm below the "
                        "two-point noise floor; " + why + ")")
    finally:
        if profiler_cm is not None:
            profiler_cm.__exit__(None, None, None)

    if cfg.verify:
        results["verification"] = verify_model(model, var, schedules, gmesh, rng_state)

    return results, all_stats


def verify_model(model, var, schedules, gmesh, gvar) -> dict:
    """Cross-variant verification — every schedule vs bulk-sync reference
    (reference semantics: SURVEY.md §4b), plus vs the NumPy golden when the
    global mesh is available in-process."""
    import jax.numpy as jnp

    out = {}
    if all(s == "bulk" for s in schedules) and gmesh is None:
        # nothing to compare: no non-bulk schedule and no in-process golden
        # — skip the bulk single-step compile (~minutes cold on this stack)
        return out
    ref = model.step(var, "bulk")
    # fake-send phases (benchmark-only) legitimately desynchronize the FAKE
    # ghost regions across schedules: bulk packs real scaled gradients at
    # the fake points while early/overlap pack boundary-sweep zeros there
    # (the fake points are not boundary points).  Owned columns — the
    # result — still must agree bitwise, so compare those only.
    ncmp = ref.shape[-1]
    if getattr(model, "fake_sends", 0) > 0:
        ncmp = model.layout.owned_pad
    for s in schedules:
        if s == "bulk":
            continue
        g = model.step(var, s)
        # reduce on device, pull one scalar (bulk device→host is slow on axon)
        out[f"{s}_vs_bulk_maxabs"] = float(
            jnp.abs(g[..., :ncmp] - ref[..., :ncmp]).max())
    small_enough = ref.size < 20_000_000
    if gmesh is not None and small_enough:
        if getattr(model, "op", "gg") == "flux":
            from cfd_proxy_tpu.ops.flux import compute_psd_flux, flux_residual_scale

            gg = flux_residual_scale(
                compute_psd_flux(gvar.astype(np.float64), gmesh.faces, gmesh.normals),
                gmesh.volume, gmesh.npoint,
            )
        else:
            from cfd_proxy_tpu.ops.golden import compute_gradients_gg, scale_gradients

            gg = scale_gradients(
                compute_gradients_gg(gvar.astype(np.float64), gmesh.faces,
                                     gmesh.normals),
                gmesh.volume, gmesh.npoint,
            ).reshape(gmesh.npoint, -1)
        got = model.gather_global(ref)
        denom = max(1.0, float(np.abs(gg).max()))
        out["bulk_vs_golden_relmax"] = float(np.abs(got - gg).max() / denom)
    return out


def _finite_or_none(obj):
    """NaN/inf → None recursively: time_schedule reports NaN when every repeat
    sat below the dispatch-noise floor, and bare NaN is not valid strict JSON
    for downstream consumers of --json / bench.py output."""
    if isinstance(obj, dict):
        return {k: _finite_or_none(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_finite_or_none(v) for v in obj]
    if isinstance(obj, float) and not np.isfinite(obj):
        return None
    return obj


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="cfd_proxy_tpu.solver",
        description="TPU-native CFD-Proxy benchmark driver",
    )
    ap.add_argument("--nx", type=int, default=24)
    ap.add_argument("--ny", type=int, default=24)
    ap.add_argument("--nz", type=int, default=24)
    ap.add_argument("--mesh", dest="mesh_prefix", default=None,
                    help="read pre-partitioned netCDF files <prefix>.<P>p.<i>.nc")
    ap.add_argument("--parts", type=int, default=1)
    ap.add_argument("--ghost-layers", type=int, default=1)
    ap.add_argument("--nvar", type=int, default=7)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3,
                    help="untimed settling dispatches of BOTH runners "
                         "after compilation, before the timed repeats "
                         "(solver.time_schedule)")
    ap.add_argument("--schedule", default="all", choices=["all", *SCHEDULES])
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--model", default="gg", choices=["gg", "flux"])
    ap.add_argument("--kernel", default=None, choices=["packed", "gather"],
                    help="Pallas sweep formulation (blocksweep.py module "
                         "doc).  Default: packed for the static iteration; "
                         "gather (with bp 512 unless --bp given) under "
                         "--solver-mode, where the kernel choice FLIPS — "
                         "the gather kernel needs no per-step source "
                         "re-pack (paired verdict 1.509x, BASELINE.md)")
    ap.add_argument("--force-rdma", action="store_true",
                    help="fused RDMA overlap kernel even with no real "
                         "transfers (P=1 self-send hardware smoke)")
    ap.add_argument("--slice-size", type=int, default=None,
                    help="devices per TPU slice (multi-slice: ICI phases "
                         "before DCN phases)")
    ap.add_argument("--meta-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="slot-weight precision (bfloat16: ~1e-3 rel bound)")
    ap.add_argument("--src-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="packed slot-source precision (bfloat16: delta-"
                         "packed, srcs stream halves, ~17%% faster, ~1e-3 "
                         "rel bound — BASELINE.md)")
    ap.add_argument("--bp", type=int, default=None,
                    help="points per Pallas block (multiple of 128; default "
                         "auto — 4096 for shards >=256k points, 1024 below)")
    ap.add_argument("--halo-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="wire precision of exchanged gradient halo payloads "
                         "(bfloat16: comm bytes halve; ghost gradients carry "
                         "a ~4e-3 rel bound)")
    ap.add_argument("--grad-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="stored gradient precision (bfloat16: the output "
                         "planes — the largest remaining f32 stream — halve; "
                         "~4e-3 field-norm bound, schedules agree to the "
                         "same bound instead of 1e-6)")
    ap.add_argument("--kcompact", default="auto",
                    choices=["auto", "on", "off"],
                    help="compact prefix slot mode: packed kernel stores "
                         "prefix-compacted tables; gather kernel skips the "
                         "dead (tile, slot) gather pairs; auto = on")
    ap.add_argument("--dtype", default="float32", choices=["float32", "float64"])
    ap.add_argument("--diag-frac", type=float, default=0.2)
    ap.add_argument("--stretch", type=float, default=1.0,
                    help="geometric z-spacing growth ratio (boundary-layer "
                         "anisotropy)")
    ap.add_argument("--hub-frac", type=float, default=0.0,
                    help="high-valence tail stress: fraction of points "
                         "gaining --hub-extra second-shell edges (K tail "
                         "to ~16-20, like real TAU meshes)")
    ap.add_argument("--hub-extra", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--solver-mode", action="store_true",
                    help="time the full per-time-step dataflow (sweep + "
                         "state update + var halo exchange + source-table "
                         "rebuild) instead of the proxy's static-state "
                         "iteration (pallas backend)")
    ap.add_argument("--sweeps-per-step", type=int, default=1,
                    help="solver-mode only: gradient evaluations (sweep + "
                         "gradient exchange + toy update) per source-table "
                         "rebuild — the multi-stage-solver amortization of "
                         "the rebuild-bound per-step cost (BASELINE.md)")
    ap.add_argument("--min-phases", type=int, default=1,
                    help="pad the exchange schedule to this many self-send "
                         "phases (multi-phase RDMA machinery on one chip)")
    ap.add_argument("--fake-sends", type=int, default=0,
                    help="benchmark-only: padded phases carry REAL shuffled-"
                         "owned payloads of this many lanes (self-sends; "
                         "owned results unchanged) — measures P>1-shaped "
                         "pack/exchange fixed costs on one chip")
    ap.add_argument("--fake-tail-frac", type=float, default=0.0,
                    help="benchmark-only, with --fake-sends: trailing "
                         "fraction of fake lanes becomes a strided GATHER "
                         "tail (the real mixed slices+tail layout)")
    ap.add_argument("--pack-force", default=None,
                    choices=["gather", "nocombine", "combine"],
                    help="benchmark-only: 'gather' disables the slice/segs "
                         "pack lowerings (A/B vs the windowed column "
                         "gather); 'combine' packs all segs phases through "
                         "one concatenated fusion (measured SLOWER — the "
                         "refuted round-5 variant); 'nocombine' = explicit "
                         "per-phase default")
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--json", action="store_true", help="emit one JSON line")
    ap.add_argument("--profile", dest="profile_dir", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform before backend init (e.g. "
                         "cpu with XLA_FLAGS=--xla_force_host_platform_"
                         "device_count=8 for the virtual multi-device mesh "
                         "on a TPU host)")
    args = ap.parse_args(argv)

    if args.kernel is None:
        # solver-mode default encodes the DECIDED kernel flip (mbench paired
        # packed/gather = 1.509 at 2.8M faces, BASELINE.md): the per-step
        # dataflow is rebuild-bound and the gather kernel skips the source
        # re-pack entirely; its own bp scan optimum is 512.  The flip flips
        # BACK with --sweeps-per-step: amortizing the rebuild over N sweeps
        # re-weights the trade toward the fast-sweep/expensive-rebuild
        # packed kernel — round-5 paired verdicts: gather wins at N<=2
        # (0.80 at N=2), packed wins from N=4 (1.05), crossover ~N=3
        if args.solver_mode:
            args.kernel, bp_def = solver_mode_defaults(args.sweeps_per_step)
            if args.bp is None:
                args.bp = bp_def
            print(f"cfd_proxy_tpu: --solver-mode defaults to --kernel "
                  f"{args.kernel}"
                  + (" --bp 512" if args.kernel == "gather" else "")
                  + f" at sweeps_per_step={args.sweeps_per_step} (paired "
                  f"verdicts, BASELINE.md); pass --kernel/--bp to override",
                  file=sys.stderr)
        else:
            args.kernel = "packed"

    cfg = SolverConfig(
        nx=args.nx, ny=args.ny, nz=args.nz, mesh_prefix=args.mesh_prefix,
        parts=args.parts, ghost_layers=args.ghost_layers, nvar=args.nvar,
        iters=args.iters, warmup=args.warmup, schedule=args.schedule,
        backend=args.backend, model=args.model, kernel=args.kernel,
        force_rdma=args.force_rdma, slice_size=args.slice_size,
        min_phases=args.min_phases, fake_sends=args.fake_sends,
        fake_tail_frac=args.fake_tail_frac,
        pack_force=args.pack_force,
        meta_dtype=args.meta_dtype, src_dtype=args.src_dtype,
        halo_dtype=args.halo_dtype,
        grad_dtype=args.grad_dtype,
        kcompact={"auto": None, "on": True, "off": False}[args.kcompact],
        bp=args.bp, dtype=args.dtype,
        diag_frac=args.diag_frac, stretch=args.stretch,
        hub_frac=args.hub_frac, hub_extra=args.hub_extra, seed=args.seed,
        platform=args.platform,
        solver_mode=args.solver_mode,
        sweeps_per_step=args.sweeps_per_step,
        verify=not args.no_verify, json_out=args.json,
        profile_dir=args.profile_dir,
    )
    results, stats = run(cfg)
    if cfg.json_out:
        print(json.dumps(_finite_or_none(results)))
    else:
        print(f"device={results['device']} parts={results['npart']} "
              f"points={results['npoint']} faces={results['nface']} "
              f"nvar={results['nvar']} dtype={results['dtype']}")
        print(format_stats_table(stats, ref="bulk"))
        for s, e in results["schedules"].items():
            # overlap_efficiency is None (with a _note) when comm cost is
            # unmeasurable (P=1) — print the reason, don't %-format None
            if e.get("overlap_efficiency") is not None:
                extra = f"  overlap_eff={e['overlap_efficiency']:.1%}"
            elif "overlap_efficiency_note" in e:
                extra = f"  overlap_eff=n/a ({e['overlap_efficiency_note']})"
            else:
                extra = ""
            print(f"{s:<10} {e['faces_per_sec'] / 1e6:9.2f} Mfaces/s{extra}")
        if "verification" in results:
            for k, v in results["verification"].items():
                print(f"verify {k} = {v:.3e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
