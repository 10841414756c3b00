#!/usr/bin/env python
"""Headline benchmark: faces/sec/chip on the Green-Gauss sweep.

Prints ONE JSON line:
  {"metric": "faces_per_sec_per_chip", "value": N, "unit": "faces/s",
   "vs_baseline": N, ...diagnostics...}

vs_baseline is measured against this machine's 1-core C golden
(native/golden.cc — the reference's language; falls back to the NumPy
golden if the native lib is absent) — the stand-in denominator until real
2-socket node numbers exist (BASELINE.md).  vs_baseline_numpy keeps the
flattering NumPy-denominator figure for comparison with round-1 records.

Env knobs: BENCH_NX (grid edge, default 96 on TPU / 16 on CPU),
BENCH_ITERS (default 300), BENCH_SCHEDULE (default: all on TPU — every
schedule incl. the fused-RDMA overlap is timed — else bulk),
BENCH_BACKEND (default pallas), BENCH_KERNEL (default packed),
BENCH_BP (default: the model's auto rule — 4096 at the headline size,
1024 for small shards; paired scans, BASELINE.md).
"""

import json
import os
import sys
import threading
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# exactly-once guard for the final stdout line: the healthy path and the
# mid-run watchdog can race at the very end of a run (timer fires between the
# last stage and wd2.cancel()), and two final lines — or a truncated one, if
# fire()'s os._exit lands mid-write — would break the driver's parse of the
# last line (advisor r4)
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _finite_or_none(obj):
    """NaN/inf → None recursively (bare NaN is invalid strict JSON).  Local
    copy of solver._finite_or_none: the watchdog thread calls _emit_final,
    and importing cfd_proxy_tpu.solver from that thread could deadlock on the
    import lock if the main thread wedged during that module's first import
    (advisor r4)."""
    if isinstance(obj, dict):
        return {k: _finite_or_none(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_finite_or_none(v) for v in obj]
    if isinstance(obj, float) and not np.isfinite(obj):
        return None
    return obj


def _sig(x, n=4):
    """Round floats to n significant digits, recursively — the compact
    stdout line's byte budget is real (see _compact)."""
    if isinstance(x, dict):
        return {k: _sig(v, n) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_sig(v, n) for v in x]
    if isinstance(x, float):
        if not np.isfinite(x) or x == 0.0:
            return x if np.isfinite(x) else None
        import math

        return round(x, -int(math.floor(math.log10(abs(x)))) + (n - 1))
    return x


def _div(x, d):
    return None if x is None else x / d


def _compact(o: dict) -> dict:
    """Compact summary of the full result dict for the FINAL stdout line.

    The driver's artifact keeps only the LAST 2000 chars of stdout and
    parses the last line as JSON; round 3's single full-detail line outgrew
    that window and the f32 headline fell out of BENCH_r03.json (VERDICT r3
    item 1).  The full dict now goes to stderr (FULL_JSON line) and this
    abbreviated view — same numbers, short keys, 4 significant digits — is
    what gets committed.  Schema notes: sched_ms = median ms per schedule;
    mc_model rows = [bulk_gfps, overlap_gfps, eff_hide, eff_solverdef]."""
    c = {k: o.get(k) for k in ("metric", "value", "unit", "vs_baseline",
                               "platform", "kernel", "nface", "schedule",
                               "median_ms")}
    if "schedules" in o:
        c["sched_ms"] = {s: e.get("median_ms")
                         for s, e in o["schedules"].items()}
    if "overlap_efficiency" in o:
        c["overlap_efficiency"] = o["overlap_efficiency"]
        if o.get("overlap_efficiency") is None:
            note = o.get("overlap_efficiency_note", "")
            c["oe_note"] = ("P=1: comm unmeasurable" if "P=1" in note
                            else note[:90])
    rp = o.get("reduced_precision")
    if rp:
        c["reduced"] = {
            "gfps": _div(rp.get("faces_per_sec"), 1e9),
            "ms": rp.get("median_ms"),
            "x_f32": rp.get("speedup_vs_f32"),
            "x_node": rp.get("vs_2socket_node_est"),
        }
        bg = rp.get("with_bf16_grads")
        if bg:
            c["reduced"]["bf16_grads_gfps"] = _div(
                bg.get("faces_per_sec"), 1e9)
    sm = o.get("small_mesh")
    if sm:
        c["small"] = {
            "nface": sm.get("nface"),
            "ms": {s: e.get("median_ms")
                   for s, e in sm.get("schedules", {}).items()},
            "ovl_x_bulk": sm.get("overlap_speedup_vs_bulk"),
        }
    if o.get("flux"):
        c["flux_gfps"] = _div(o["flux"].get("faces_per_sec"), 1e9)
    if o.get("solver_mode"):
        c["solver_ms"] = o["solver_mode"].get("ms_per_step")
        sw = o["solver_mode"].get("sweeps_per_step")
        if sw:
            c["solver_ms_per_sweep"] = {
                n: e.get("ms_per_sweep") for n, e in sw.items()}
    mc = o.get("multichip_model")
    if mc:
        m = {"note": "MODEL not measurement; rows=[bulk_gfps, ovl_gfps, "
                     "eff_hide, eff_solverdef (gate metric), "
                     "exposed_comm_us, ovl_x_bulk]"}
        for k, v in mc.items():
            if isinstance(v, dict) and "bulk_gfps" in v:
                m[k] = [v.get("bulk_gfps"), v.get("overlap_gfps"),
                        v.get("eff_hide"), v.get("eff_solverdef"),
                        v.get("exposed_comm_us"), v.get("ovl_x_bulk")]
        sens = mc.get("strong_P8_eff_solverdef_vs_pack_ns_per_col")
        if sens:
            m["effS_P8_vs_pack_ns"] = sens
        cross = mc.get("crossing_ge85_shard_faces_P8")
        if cross:
            m["cross85_P8_shard_faces"] = {
                k: v for k, v in cross.items() if k != "note"}
        c["mc_model"] = m
    if o.get("node_est_faces_per_sec") is not None:
        c["node"] = {
            "c1_dram_mfps": _div(
                o.get("cpu_golden_c_dram_faces_per_sec"), 1e6),
            "est_gfps": _div(o["node_est_faces_per_sec"], 1e9),
            "x_est": o.get("vs_2socket_node_est"),
            "x_maxest": o.get("vs_2socket_node_maxest"),
            "x_64c_legacy": o.get("vs_2socket_node_64c_est"),
            "x_at_gbps": o.get("vs_node_at_gbps"),
            "host_cores": o.get("host_cores"),
        }
    return c


def measure_cpu_golden(nx: int = 32) -> dict:
    """CPU-denominator measurements: NumPy golden + the C golden
    (native/golden.cc, the reference's actual language) at 1 core and at
    all cores of this host.  The ≥10× north star is against a 2-socket node
    running the C loop — the C rate is the honest per-core stand-in
    (BASELINE.md; VERDICT round 1 item 3)."""
    import os as _os

    from cfd_proxy_tpu.mesh.generator import generate_mesh, make_state
    from cfd_proxy_tpu.native import golden_gg_c
    from cfd_proxy_tpu.ops.golden import compute_gradients_gg

    m = generate_mesh(nx, nx, nx, jitter=0.05, diag_frac=0.2, seed=0)
    var = make_state(m.npoint, 7, seed=1).astype("float64")

    def best(fn, nface, reps=3):
        # nface must be the face count of the mesh fn actually sweeps —
        # closing over m.nface here once under-reported the DRAM-bound rate
        # 8.15x (the md lambda swept 824k faces but divided by m's 101k)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return nface / min(ts)

    from cfd_proxy_tpu.native import lib

    out = {"cpu_nface": m.nface, "host_cores": _os.cpu_count() or 1}
    out["numpy_fps"] = best(
        lambda: compute_gradients_gg(var, m.faces, m.normals), m.nface)
    if lib() is not None:
        # validate endpoints ONCE outside the timed lambdas (validate=False
        # below) so the denominator times only the sweep, not a per-rep scan
        assert m.faces.min() >= 0 and m.faces.max() < m.npoint
        out["c1_fps"] = best(
            lambda: golden_gg_c(var, m.faces, m.normals, nthreads=1,
                                validate=False), m.nface)
        nt = out["host_cores"]
        out["call_fps"] = (out["c1_fps"] if nt <= 1 else best(
            lambda: golden_gg_c(var, m.faces, m.normals, nthreads=nt,
                                validate=False), m.nface))
        # DRAM-bound 1-core rate: the small mesh's ~26 MB working set is
        # L3-resident on an idle host (measured up to ~29 Mf/s — 2-3x the
        # round-2 loaded-host figures), which is NOT the rate a node core
        # sustains on a benchmark-sized mesh.  An ~830k-face mesh (~210 MB
        # working set) forces the DRAM-bound rate — the honest per-core
        # stand-in for the multi-million-face comparison.
        nx_d = int(os.environ.get("BENCH_CPU_DRAM_NX", "64"))
        md = generate_mesh(nx_d, nx_d, nx_d, jitter=0.05, diag_frac=0.2,
                           seed=0)
        vard = make_state(md.npoint, 7, seed=1).astype("float64")
        assert md.faces.min() >= 0 and md.faces.max() < md.npoint
        out["cpu_dram_nface"] = md.nface
        out["c1_dram_fps"] = best(
            lambda: golden_gg_c(vard, md.faces, md.normals, nthreads=1,
                                validate=False), md.nface)
        # MEASURED thread-scaling table on the DRAM-bound mesh (VERDICT r3
        # item 3: the node estimate's linear-64 input had never been
        # anchored by a measured saturation curve).  On a multi-core host
        # this records where the shared memory bus saturates; THIS sandbox
        # host has 1 core (nproc=1, verified), so the table here can only
        # document that fact — the curve itself is environmentally
        # unmeasurable and the node margin's sensitivity to the assumed
        # node bandwidth is reported instead (node_sensitivity below).
        nts, nt = [], 1
        while nt < out["host_cores"]:
            nts.append(nt)
            nt *= 2
        nts.append(out["host_cores"])
        if out["host_cores"] == 1:
            nts = [1, 2]    # 2 = oversubscription smoke: threaded mode runs
        out["c_thread_fps"] = {
            str(t): best(lambda t=t: golden_gg_c(
                vard, md.faces, md.normals, nthreads=t, validate=False),
                md.nface)
            for t in nts
        }
    log(f"cpu golden: {m.nface} faces, numpy {out['numpy_fps']/1e6:.2f} "
        f"Mf/s, C 1-core {out.get('c1_fps', 0)/1e6:.2f} Mf/s, "
        f"C {out['host_cores']}-core {out.get('call_fps', 0)/1e6:.2f} Mf/s, "
        f"C 1-core DRAM-bound ({out.get('cpu_dram_nface', 0)} faces) "
        f"{out.get('c1_dram_fps', 0)/1e6:.2f} Mf/s")
    return out


class _InitWatchdog:
    """If TPU/backend init wedges (a stale pool grant can block the claim
    indefinitely — observed 2026-08-19 after a SIGKILLed benchmark run), die
    LOUDLY with a parseable final JSON line instead of hanging forever and
    leaving an empty BENCH artifact.  Cancel once the first device op lands.

    Round-5 hardening (VERDICT r4 weak #1): on expiry the watchdog does NOT
    exit immediately — it waits one extra cool-down window for the in-flight
    dispatch to land (the 2026-08-20 congestion episode showed a claim that
    LOOKED wedged landing after 374 s; the main thread's original dispatch
    IS the single patient probe CLAUDE.md's operating notes call for — no
    new probes are spawned).  If it still hasn't landed, a best-effort clean
    backend shutdown runs before exit, so the abrupt death doesn't leave the
    stale server-side grant that wedged the NEXT claim in round 4."""

    def __init__(self, seconds: float, cooldown: float = 120.0):
        self.seconds = seconds
        self.cooldown = cooldown
        self.done = threading.Event()
        self._t = threading.Timer(seconds, self._fire)
        self._t.daemon = True
        self._t.start()

    def cancel(self):
        self.done.set()
        self._t.cancel()

    def _fire(self):
        if self.done.wait(self.cooldown):
            return          # the patient re-check: dispatch landed late
        try:
            print(json.dumps({
                "metric": "faces_per_sec_per_chip", "value": None,
                "unit": "faces/s", "vs_baseline": None,
                "error": f"backend init exceeded "
                         f"{self.seconds + self.cooldown:.0f}s (incl. "
                         f"{self.cooldown:.0f}s cool-down re-check) — axon "
                         f"tunnel/pool grant wedged; last good numbers in "
                         f"BASELINE.md",
            }), flush=True)
        except Exception:
            pass
        # best-effort clean shutdown from a bounded helper thread (the main
        # thread is stuck inside the dispatch); daemon + join-timeout so a
        # hanging teardown can't hold the exit
        th = threading.Thread(target=self._shutdown, daemon=True)
        th.start()
        th.join(30.0)
        os._exit(3)

    @staticmethod
    def _shutdown():
        try:
            import jax

            jax.clear_backends()
        except Exception:
            pass


def _init_watchdog(seconds: float):
    return _InitWatchdog(seconds)


def _node_estimate(c1_dram_fps: float, gbps: float = 500.0,
                   cores: int = 64, bytes_per_face: float = 816.0):
    """Physical 2-socket-node throughput estimate for the memory-bound C
    loop: linear core scaling CAPPED by the node's DRAM bus — min(linear,
    wall).  Returns (node, linear, wall) faces/sec.  The wall (gbps x 1e9 /
    bytes_per_face) is the stable anchor: c1_dram varies ~3x with sandbox
    host load (5.3 Mf/s loaded -> 14.9 idle, rounds 3-4), while the bytes
    per face are measured and the bandwidth is the stated assumption whose
    sensitivity vs_node_at_gbps reports."""
    lin = cores * c1_dram_fps
    wall = gbps * 1e9 / bytes_per_face
    return min(lin, wall), lin, wall


def _emit_final(out: dict) -> None:
    """The one stdout contract: full detail to stderr (FULL_JSON), then ONE
    compact JSON line on stdout, shedding optional blocks before it can
    outgrow the driver's 2000-char tail window (VERDICT r3 item 1).  Shared
    by the healthy path and the mid-run watchdog so a wedged tunnel still
    yields a parseable artifact with every completed row.  Exactly-once: the
    first caller (healthy path or watchdog) wins; the loser is a no-op."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    # tiny meshes can sit below the dispatch-noise floor → NaN medians; emit
    # null, not bare NaN (invalid strict JSON)
    out = _finite_or_none(out)
    log("FULL_JSON " + json.dumps(out))
    comp = _sig(_compact(out))
    if "error" in out:
        comp["error"] = out["error"]
    line = json.dumps(comp)
    # belt and braces: if future rows grow the compact line past the
    # window, shed optional blocks (least critical first) rather than
    # letting the tail truncate the headline away again
    for drop in ("small", "node", "mc_model", "reduced", "sched_ms"):
        if len(line) <= 1900:
            break
        comp.pop(drop, None)
        comp["dropped"] = comp.get("dropped", []) + [drop]
        line = json.dumps(comp)
    print(line, flush=True)


class _RunWatchdog:
    """Stage-2 guard (the init watchdog covers only the first dispatch —
    2026-08-20 the tunnel's remote end died and would have hung a bench
    mid-run forever): if the TOTAL run exceeds the budget, emit whatever
    rows completed through the normal compact final-line path, flagged with
    an error field, and exit 4.  `partial` is the LIVE result dict main()
    fills stage by stage; `last_stage` names the stage that wedged.

    Advisor-r4 hardening: fire() snapshots the live dict (main() may still
    be mutating it — a concurrent update could raise inside json.dumps and
    kill the emission), guards its whole body so a failure still prints a
    minimal parseable line, and exits in a finally.  `extend()` lets main()
    grow the budget after a measured cold-compile-scale first stage (a cold
    Mosaic cache is ~4 min per (bp, EP, K, grid) config × ~8 configs — a
    HEALTHY first run after a cache flush can exceed the default)."""

    def __init__(self, seconds: float, partial: dict):
        global _EMITTED
        self.seconds = seconds
        self.partial = partial
        self._t0 = time.monotonic()
        self._deadline = self._t0 + seconds
        self._lock = threading.Lock()
        self._cancelled = False
        self.function = self._fire      # Timer-compatible handle (tests)
        # arming the run watchdog marks the start of a fresh run: reset the
        # exactly-once emission flag so this run gets its one final line
        with _EMIT_LOCK:
            _EMITTED = False
        self._arm(seconds)

    def _arm(self, s: float):
        t = threading.Timer(s, self._fire)
        t.daemon = True
        t.start()
        self._t = t

    def cancel(self):
        with self._lock:
            self._cancelled = True
            self._t.cancel()

    def extend(self, extra_s: float):
        """Grow the budget to AT LEAST extra_s seconds from now — never
        shrink it: when the original deadline is already further out than
        now+extra_s, keep it (re-arming unconditionally would MOVE THE
        DEADLINE EARLIER for first stages in the 400-900 s range, killing a
        healthy cold run the un-extended timer would have allowed)."""
        with self._lock:
            if self._cancelled:
                return
            new_deadline = max(self._deadline, time.monotonic() + extra_s)
            if new_deadline <= self._deadline:
                return
            self._t.cancel()
            self._deadline = new_deadline
            self.seconds = new_deadline - self._t0
            self._arm(new_deadline - time.monotonic())

    def _fire(self):
        try:
            snap = None
            for _ in range(3):      # live-dict snapshot; retry on races
                try:
                    snap = json.loads(json.dumps(self.partial, default=str))
                    break
                except Exception:
                    time.sleep(0.05)
            if snap is None:
                snap = {"last_stage": self.partial.get("last_stage", "?")}
            snap.setdefault("metric", "faces_per_sec_per_chip")
            snap.setdefault("value", None)
            snap.setdefault("unit", "faces/s")
            snap.setdefault("vs_baseline", None)
            snap["error"] = (
                f"benchmark exceeded {self.seconds:.0f}s wall in stage "
                f"{snap.get('last_stage', '?')!r} — axon tunnel wedged "
                f"mid-run, OR a cold Mosaic compile cache (~4 min/config; "
                f"re-run warm to distinguish); partial rows emitted")
            _emit_final(snap)
        except Exception as e:
            try:
                print(json.dumps({
                    "metric": "faces_per_sec_per_chip", "value": None,
                    "unit": "faces/s", "vs_baseline": None,
                    "error": f"run watchdog fired and emission failed "
                             f"({type(e).__name__}); stage "
                             f"{self.partial.get('last_stage', '?')!r}",
                }), flush=True)
            except Exception:
                pass
        finally:
            os._exit(4)


def _run_watchdog(seconds: float, partial: dict):
    return _RunWatchdog(seconds, partial)


def main() -> int:
    # 900 s: 2026-08-20 a healthy-but-congested tunnel took 374 s for the
    # trivial first dispatch — 420 s was marginal against mere slowness; the
    # watchdog is for WEDGES, so give slowness headroom
    wd = _init_watchdog(float(os.environ.get("BENCH_INIT_TIMEOUT_S", "900")))
    import jax

    platform = jax.default_backend()
    on_tpu = platform == "tpu"
    nx = int(os.environ.get("BENCH_NX", "96" if on_tpu else "16"))
    iters = int(os.environ.get("BENCH_ITERS", "300"))
    # on TPU, time every schedule (incl. the fused-RDMA overlap via the P=1
    # self-send phase) so the flagship path shows up in BENCH_r*.json; the
    # headline metric stays the bulk sweep
    schedule = os.environ.get("BENCH_SCHEDULE", "all" if on_tpu else "bulk")
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    kernel = os.environ.get("BENCH_KERNEL", "packed")
    # BENCH_BP unset = the model's AUTO rule (4096 at the headline size;
    # 1024 on the small-mesh row's ~125k-point shard, where the paired
    # small-shard scan measured 4096 a 1.27-1.43x loss — BASELINE.md)
    bp_env = os.environ.get("BENCH_BP", "")
    bp = int(bp_env) if bp_env else None
    log(f"platform={platform} devices={jax.devices()} nx={nx} iters={iters} "
        f"backend={backend} kernel={kernel} bp={bp}")
    # prove the device actually executes (a claim can succeed and the first
    # dispatch still wedge), then stand down the init watchdog
    import jax.numpy as jnp

    float(jax.jit(lambda x: (x + 1.0).sum())(jnp.zeros((8, 128))))
    wd.cancel()
    # stage-2 guard: the first dispatch landing does not mean the tunnel
    # stays up — guard the whole run so a mid-run wedge still produces a
    # parseable artifact carrying every completed row
    out: dict = {"last_stage": "cpu_golden"}
    wd2 = _run_watchdog(
        float(os.environ.get("BENCH_TOTAL_TIMEOUT_S", "3300")), out)

    cpu = measure_cpu_golden(16 if not on_tpu else 32)
    cpu_fps = cpu["numpy_fps"]
    out["last_stage"] = "main_run"

    from cfd_proxy_tpu.solver import SolverConfig, run

    cfg = SolverConfig(
        nx=nx, ny=nx, nz=nx, parts=1, nvar=7, iters=iters, warmup=3,
        schedule=schedule, backend=backend, kernel=kernel, bp=bp,
        dtype="float32", verify=False,
        # the flagship overlap path must actually run the fused RDMA kernel:
        # at P=1 that needs the forced self-send phase, both for schedule=all
        # and for an explicit BENCH_SCHEDULE=overlap
        force_rdma=(schedule in ("all", "overlap")),
    )
    t0 = time.perf_counter()
    results, _stats = run(cfg)
    main_wall = time.perf_counter() - t0
    log(f"run wall {main_wall:.1f}s")
    if main_wall > 400.0:
        # cold-compile-scale first stage (warm is ~60-90 s): the remaining
        # stages compile ~6 more configs at ~4 min each cold — grow the
        # budget so a healthy cold-cache run isn't killed at exit 4
        # (advisor r4 low #2)
        wd2.extend(2400.0)
        log(f"cold-cache scale first stage ({main_wall:.0f}s) — run "
            f"watchdog extended 2400s")

    head = "bulk" if schedule == "all" else schedule
    entry = results["schedules"][head]
    fps = entry["faces_per_sec"]
    # vs_baseline uses the HONEST denominator: the 1-core C golden (the
    # reference's language) when the native lib is present; the NumPy golden
    # overstates the margin by the np.add.at penalty (~24x) and is reported
    # separately as vs_baseline_numpy (VERDICT r1 item 3)
    base_fps = cpu.get("c1_fps", cpu_fps)
    out.update({
        "metric": "faces_per_sec_per_chip",
        "value": float(fps),
        "unit": "faces/s",
        "vs_baseline": float(fps / base_fps),
        "vs_baseline_numpy": float(fps / cpu_fps),
        "platform": platform,
        "backend": backend,
        "kernel": kernel,
        "nface": results["nface"],
        "schedule": head,
        "median_ms": entry["median_s"] * 1e3,
        "cpu_golden_faces_per_sec": float(cpu_fps),
    })
    if schedule == "all":
        out["schedules"] = {
            s: {"faces_per_sec": e["faces_per_sec"],
                "median_ms": e["median_s"] * 1e3,
                **{k: e[k] for k in ("overlap_efficiency",
                                     "overlap_efficiency_note") if k in e}}
            for s, e in results["schedules"].items()
        }
        # the SECONDARY metric (BASELINE.json): overlap efficiency of the
        # flagship fused-RDMA schedule — null with the reason at P=1, where
        # comm cost is unmeasurable (solver.run attaches the note)
        ov = results["schedules"].get("overlap", {})
        out["overlap_efficiency"] = ov.get("overlap_efficiency")
        if out["overlap_efficiency"] is None:
            out["overlap_efficiency_note"] = ov.get(
                "overlap_efficiency_note", "overlap schedule not timed")
    out["last_stage"] = "reduced_precision"
    if (on_tpu and backend == "pallas"
            and os.environ.get("BENCH_BF16_ROW", "1") != "0"):
        # secondary row: the full reduced-precision mode (--src-dtype
        # bfloat16 --meta-dtype bfloat16 — delta-packed bf16 slot sources +
        # bf16 slot weights; ~1e-3 rel bound, BASELINE.md).  The HEADLINE
        # stays f32 — the reduced-precision speedup is reported, not claimed
        # as the metric.  Always the packed kernel (bf16 sources require it)
        # on the bulk schedule; the speedup denominator is the f32 BULK rate
        # so precision is the only variable.
        from dataclasses import replace as _replace

        cfg_bf = _replace(cfg, schedule="bulk", kernel="packed",
                          src_dtype="bfloat16", meta_dtype="bfloat16",
                          force_rdma=False)
        res_bf, _ = run(cfg_bf)
        e_bf = res_bf["schedules"]["bulk"]
        out["reduced_precision"] = {
            "src_dtype": "bfloat16", "meta_dtype": "bfloat16",
            "faces_per_sec": e_bf["faces_per_sec"],
            "median_ms": e_bf["median_s"] * 1e3,
        }
        f32_bulk = results["schedules"].get("bulk")
        if f32_bulk is not None and kernel == "packed":
            out["reduced_precision"]["speedup_vs_f32"] = (
                e_bf["faces_per_sec"] / f32_bulk["faces_per_sec"])
        log(f"reduced-precision bulk: {e_bf['faces_per_sec']/1e9:.2f} Gf/s "
            f"({e_bf['median_s']*1e3:.3f} ms)")
        if os.environ.get("BENCH_BF16_GRAD_ROW", "1") != "0":
            # the full bf16 throughput stack adds --grad-dtype bfloat16:
            # the output gradient planes (the largest remaining f32 stream)
            # store in bf16 — a further paired-measured ~5.6% on this
            # kernel (BASELINE.md).  Error bound loosens to ~4e-3
            # field-norm (stores round; accumulation stays f32 in-kernel).
            cfg_bg = _replace(cfg_bf, grad_dtype="bfloat16")
            res_bg, _ = run(cfg_bg)
            e_bg = res_bg["schedules"]["bulk"]
            out["reduced_precision"]["with_bf16_grads"] = {
                "grad_dtype": "bfloat16",
                "faces_per_sec": e_bg["faces_per_sec"],
                "median_ms": e_bg["median_s"] * 1e3,
                "speedup_vs_reduced": (e_bg["faces_per_sec"]
                                       / e_bf["faces_per_sec"]),
                # single run vs single run — subject to the chip's ±8-15%
                # across-run drift; the decided verdicts are PAIRED:
                # kernel-level 1.056 (kbench compact_bso) and model-level
                # 1.058 (tools/mbench.py), BASELINE.md.
                "note": "single-run; paired verdicts 1.056 kernel / "
                        "1.058 model (mbench)",
            }
            log(f"reduced-precision + bf16 grads: "
                f"{e_bg['faces_per_sec']/1e9:.2f} Gf/s "
                f"({e_bg['median_s']*1e3:.3f} ms)")
    out["last_stage"] = "small_mesh"
    if (on_tpu and backend == "pallas" and schedule == "all"
            and os.environ.get("BENCH_SMALL_ROW", "1") != "0"):
        # small-mesh schedule row: the regime where the fused-RDMA overlap
        # schedule measurably BEATS bulk on one chip (at ~171k faces the
        # whole sweep is short enough that the bulk graph's separate
        # pack→self-send→unpack steps cost more than the fused kernel's
        # in-sweep push — BASELINE.md round-2 row).  Committed here so the
        # flagship mechanism's hardware win is in the BENCH artifact, not
        # prose (VERDICT r2 item 4b).
        from dataclasses import replace as _replace

        nx_s = int(os.environ.get("BENCH_SMALL_NX", "50"))
        # a ~0.05 ms iteration needs far more chained iterations than the
        # big mesh for the two-point difference to dominate noise (the first
        # attempt at 300 iters recorded an unphysical 38 Gf/s bulk median)
        it_s = int(os.environ.get("BENCH_SMALL_ITERS", "3000"))
        res_s, _ = run(_replace(cfg, nx=nx_s, ny=nx_s, nz=nx_s,
                                schedule="all", force_rdma=True,
                                iters=it_s))
        sch = {s: {"faces_per_sec": e["faces_per_sec"],
                   "median_ms": e["median_s"] * 1e3}
               for s, e in res_s["schedules"].items()}
        row = {"nx": nx_s, "nface": res_s["nface"], "schedules": sch}
        if "overlap" in sch and "bulk" in sch:
            row["overlap_speedup_vs_bulk"] = (
                sch["overlap"]["faces_per_sec"] / sch["bulk"]["faces_per_sec"])
        out["small_mesh"] = row
        log(f"small mesh nx={nx_s}: " + " ".join(
            f"{s}={e['faces_per_sec']/1e9:.2f}G" for s, e in sch.items()))
    out["last_stage"] = "flux"
    if (on_tpu and backend == "pallas"
            and os.environ.get("BENCH_FLUX_ROW", "1") != "0"):
        # secondary-kernel row: the PSD upwind flux model (ops/flux.py,
        # SURVEY §3 "secondary flux kernel") on the same mesh — committed
        # so the second model family's hardware rate is in the BENCH
        # artifact, not just BASELINE.md prose.  Bulk schedule, packed
        # kernel (its paired verdicts: compact 1.243, reduced 1.078).
        from dataclasses import replace as _replace

        res_fx, _ = run(_replace(cfg, model="flux", schedule="bulk",
                                 kernel="packed", force_rdma=False))
        e_fx = res_fx["schedules"]["bulk"]
        out["flux"] = {
            "model": "flux", "faces_per_sec": e_fx["faces_per_sec"],
            "median_ms": e_fx["median_s"] * 1e3,
        }
        log(f"flux bulk: {e_fx['faces_per_sec']/1e9:.2f} Gf/s "
            f"({e_fx['median_s']*1e3:.3f} ms)")
    out["last_stage"] = "solver_mode"
    if (on_tpu and backend == "pallas"
            and os.environ.get("BENCH_SOLVER_MODE_ROW", "1") != "0"):
        # solver-mode row: the FULL per-time-step dataflow (sweep + state
        # update + var halo exchange + source-table rebuild) a real solver
        # would pay, honestly separate from the headline (the proxy's timed
        # loop exchanges gradients over static state — SURVEY §4.2).  Uses
        # the decided solver-mode optimum (gather kernel, bp 512; mbench
        # paired 1.509 over packed — BASELINE.md) so the artifact records
        # the per-step cost, not just BASELINE prose.
        from dataclasses import replace as _replace

        res_sm, _ = run(_replace(cfg, schedule="bulk", kernel="gather",
                                 bp=512, force_rdma=False, solver_mode=True,
                                 iters=max(50, iters // 6)))
        e_sm = res_sm["schedules"]["bulk"]
        out["solver_mode"] = {
            "kernel": "gather", "bp": 512,
            "ms_per_step": e_sm["median_s"] * 1e3,
            "effective_faces_per_sec": e_sm["faces_per_sec"],
            "note": "full per-time-step dataflow (sweep + update + var "
                    "exchange + table rebuild); rebuild-bound "
                    "(tools/solver_attrib.py), separate from the headline "
                    "by design (the proxy's timed loop never re-packs)",
        }
        log(f"solver-mode (gather/bp512): {e_sm['median_s']*1e3:.2f} ms/step "
            f"({e_sm['faces_per_sec']/1e9:.3f} Gf/s effective)")
        sweeps_env = os.environ.get("BENCH_SOLVER_SWEEPS", "2,4")
        if sweeps_env:
            # multi-stage amortization axis (VERDICT r4 item 5): gradient
            # evaluations per table rebuild.  The rebuild (~4.3 ms at 2.8M,
            # both gather mechanisms measured at their walls) amortizes
            # over N sweeps; ms_per_sweep is the per-gradient-evaluation
            # cost a multi-stage solver would actually pay.  Each N runs
            # its DECIDED kernel config (round-5 paired verdicts: gather/
            # 512 wins at N<=2, packed/auto from N=4 — the rebuild/sweep
            # trade re-weights as the rebuild amortizes).
            from cfd_proxy_tpu.solver import solver_mode_defaults

            tbl = {}
            for n_sw in [int(s) for s in sweeps_env.split(",") if s]:
                kern, bp_n = solver_mode_defaults(n_sw)
                res_n, _ = run(_replace(
                    cfg, schedule="bulk", kernel=kern, bp=bp_n,
                    force_rdma=False, solver_mode=True,
                    sweeps_per_step=n_sw, iters=max(50, iters // 6)))
                e_n = res_n["schedules"]["bulk"]
                tbl[str(n_sw)] = {
                    "kernel": kern,
                    "ms_per_step": e_n["median_s"] * 1e3,
                    "ms_per_sweep": e_n["median_s"] * 1e3 / n_sw,
                    "effective_faces_per_sec": e_n["faces_per_sec"],
                }
                log(f"solver-mode sweeps={n_sw} ({kern}): "
                    f"{e_n['median_s']*1e3:.2f} ms/step "
                    f"({e_n['median_s']*1e3/n_sw:.2f} ms/sweep, "
                    f"{e_n['faces_per_sec']/1e9:.3f} Gf/s effective)")
            out["solver_mode"]["sweeps_per_step"] = tbl
    out["last_stage"] = "multichip_model"
    # BENCH_MODEL_BLOCK=force runs the (host-side, hardware-independent)
    # model block on CPU too — used by tests to cover the crossing sweep
    if ((on_tpu or os.environ.get("BENCH_MODEL_BLOCK") == "force")
            and os.environ.get("BENCH_MODEL_BLOCK", "1") != "0"):
        # multichip prediction block — MODEL, NOT MEASUREMENT (this sandbox
        # has one chip).  All sweep-side inputs are measured (the size-
        # dependent rate table + the 70 us fixed costs); the ICI GB/s are
        # wire specs, bracketed from above by icibench's measured 371-648
        # GB/s self-send DMA rate.  Two overlap-efficiency definitions per
        # row (tools/scaling_model.py::eval_geometry): eff_hide (pure hide
        # ratio, the historic number) and eff_solverdef (what solver.run
        # would measure: 1-(over-nocomm)/(bulk-nocomm) — the honest gate
        # metric, charging both schedules' fixed costs).
        try:
            from cfd_proxy_tpu.mesh.generator import generate_mesh
            from cfd_proxy_tpu.tools.scaling_model import (
                RATE_TABLES, V5E_HBM_GBPS, V5E_ICI_GBPS, V5P_HBM_GBPS,
                V5P_ICI_GBPS, eval_geometry, scale_rate_table,
                shard_geometry)

            rt = RATE_TABLES["f32"]
            # round-4 MEASURED decomposition (BASELINE.md fake-phase rungs,
            # P8-shaped payloads on the real chip): the pack/unpack chain is
            # ~5 us base + 1.7 ns per GATHERED column for BOTH schedules
            # (exposed everywhere — one compute core), and the fused RDMA
            # machinery adds ~3 us over ppermute (barrier + DMAs + scatter
            # measured +7 us total vs sweep-only, −small ppermute base).
            # The segmented pack (signature-grouped send lanes, round 4)
            # makes slice lanes FREE — measured paired 1.675 over the
            # gather, chain 28 → 5.1 us — so shard_geometry's pack_cols
            # charges only the small-group tail + legacy phases.
            # Replaces round 3's flat 70/70 which conflated chain and
            # transport.
            kw = dict(overlap_fixed_us=8.0, bulk_fixed_us=5.0,
                      pack_ns_per_col=1.7, halo_bytes=4)

            def row(geo, ici, table, **over):
                r = eval_geometry(geo, None, ici, 24, rate_table=table,
                                  **{**kw, **over})
                return {
                    "nface": r["nface"],
                    "bulk_gfps": r["nface"] / r["t_bulk"] / 1e9,
                    "overlap_gfps": r["nface"] / r["t_over"] / 1e9,
                    "eff_hide": r["eff_hide"],
                    "eff_solverdef": r["eff_solverdef"],
                    # ABSOLUTE companions to the gate metric (VERDICT r4
                    # weak #2: eff_solverdef's value degrades when a SHARED
                    # cost shrinks — improvements that speed up both
                    # schedules narrow bulk's comm slack; these two move
                    # monotonically with real improvement):
                    # exposed_comm_us = what the overlap schedule fails to
                    # hide per step; ovl_x_bulk = overlap-vs-bulk speedup
                    "exposed_comm_us": (r["t_over"] - r["t_nocomm"]) * 1e6,
                    "ovl_x_bulk": r["t_bulk"] / r["t_over"],
                }

            gm = generate_mesh(nx, nx, nx, jitter=0.05, diag_frac=0.2,
                               seed=0)
            geo8 = shard_geometry(gm, 8)
            # strong P8 is comm-bound at f32 payloads (33 us wire vs 20 us
            # interior sweep); the bf16-halo row shows the built
            # --halo-dtype lever restoring full hide there
            rows = {"strong_P8": row(geo8, V5E_ICI_GBPS, rt),
                    "strong_P8_bf16halo": row(geo8, V5E_ICI_GBPS, rt,
                                              halo_bytes=2),
                    "strong_P64": row(shard_geometry(gm, 64),
                                      V5E_ICI_GBPS, rt)}
            # gate sensitivity to the pack rate — the term that stood
            # between the model and the >=85% eff_solverdef gate before the
            # segmented pack (VERDICT r3 item 2c).  pack_cols now counts
            # only tail+legacy gather columns, so the sweep shows how much
            # of the gate margin the REMAINING gathered tail costs
            sens = {}
            for pn in (0.0, 0.85, 1.7, 3.4):
                r = eval_geometry(geo8, None, V5E_ICI_GBPS, 24,
                                  rate_table=rt, overlap_fixed_us=8.0,
                                  bulk_fixed_us=5.0, pack_ns_per_col=pn)
                sens[str(pn)] = r["eff_solverdef"]
            block = {
                "note": "MODEL not measurement (single-chip sandbox); "
                        "rate table measured; chain = 5us + 1.7ns/col and "
                        "overlap extra +3us MEASURED via fake-phase rungs "
                        "(BASELINE.md round 4); ICI 45 (v5e) / 90 (v5p) "
                        "GB/s wire specs, icibench brackets from above. "
                        "eff_solverdef = what solver.run would measure "
                        "(gate metric); eff_hide = pure hide ratio",
                **rows,
                "strong_P8_eff_solverdef_vs_pack_ns_per_col": sens,
            }
            if os.environ.get("BENCH_NORTHSTAR", "1") != "0":
                # the BASELINE.json target config (VERDICT r3 item 2a): a
                # v5p-8 slice on weak-scaled F6-class shards — 2.8M faces
                # PER SHARD at P=8 (nx=192 -> 22.5M global).  The v5p row
                # scales the measured rate table by the HBM ratio (the f32
                # kernel is measured AT its memory floor, so plateau-size
                # ns/face transfers across HBM generations) and uses the
                # v5p ICI spec; fixed costs stay at the v5e-measured 70us
                # (conservative — v5p dispatch is not slower).  Host cost
                # ~2.5 min (22.5M-face mesh gen + RCB x8); BENCH_NORTHSTAR=0
                # skips.
                nxw = int(os.environ.get("BENCH_NORTHSTAR_NX", "192"))
                gmw = generate_mesh(nxw, nxw, nxw, jitter=0.05,
                                    diag_frac=0.2, seed=0)
                geo_cache = {nxw: shard_geometry(gmw, 8)}
                geow = geo_cache[nxw]
                block["weak_F6class_P8_v5e"] = row(geow, V5E_ICI_GBPS, rt)
                block["northstar_weak_F6class_P8_v5p"] = {
                    **row(geow, V5P_ICI_GBPS,
                          scale_rate_table(rt, V5E_HBM_GBPS / V5P_HBM_GBPS)),
                    "note": "BASELINE.json target config (v5p-8, weak-"
                            "scaled F6-class shards); gate metric is "
                            "eff_solverdef",
                }
            else:
                geo_cache = {}
            if os.environ.get("BENCH_CROSSING", "1") != "0":
                # the strong-scaling CROSSING story (VERDICT r4 item 2):
                # eff_solverdef vs shard size at P=8 for {v5e, v5p} ×
                # {f32, bf16 halos}, and the smallest shard size where the
                # ≥85% gate holds.  The v5p rows reuse the HBM-scaled rate
                # table (valid at plateau sizes; at small shards the
                # dispatch-floor-dominated rate does NOT scale, making the
                # v5p sweep optimistically fast there — a faster sweep
                # hides LESS, so the reported crossing is conservative).
                geo_cache[nx] = geo8
                nxs = [int(s) for s in os.environ.get(
                    "BENCH_CROSSING_NX", "48,64,96,128,160,192").split(",")]
                rt_p = scale_rate_table(rt, V5E_HBM_GBPS / V5P_HBM_GBPS)
                cfgs = {"v5e_f32": (V5E_ICI_GBPS, rt, 4),
                        "v5e_bf16halo": (V5E_ICI_GBPS, rt, 2),
                        "v5p_f32": (V5P_ICI_GBPS, rt_p, 4),
                        "v5p_bf16halo": (V5P_ICI_GBPS, rt_p, 2)}
                curves = {k: [] for k in cfgs}
                for nx_c in nxs:
                    if nx_c not in geo_cache:
                        gm_c = generate_mesh(nx_c, nx_c, nx_c, jitter=0.05,
                                             diag_frac=0.2, seed=0)
                        geo_cache[nx_c] = shard_geometry(gm_c, 8)
                    geo_c = geo_cache[nx_c]
                    sf = geo_c["nface_total"] // 8
                    for ck, (ici, tab, hb) in cfgs.items():
                        r = row(geo_c, ici, tab, halo_bytes=hb)
                        curves[ck].append({
                            "shard_faces": sf,
                            "eff_solverdef": r["eff_solverdef"],
                            "exposed_comm_us": r["exposed_comm_us"],
                            "ovl_x_bulk": r["ovl_x_bulk"],
                        })
                crossing = {}
                for ck, cv in curves.items():
                    # smallest measured size meeting the gate, plus a
                    # log-size interpolated estimate when bracketed
                    cross = None
                    for i, e in enumerate(cv):
                        eff = e["eff_solverdef"]
                        if eff is not None and eff >= 0.85:
                            cross = e["shard_faces"]
                            if i > 0 and cv[i - 1]["eff_solverdef"] is not None:
                                e0, e1 = cv[i - 1], e
                                f = ((0.85 - e0["eff_solverdef"])
                                     / (eff - e0["eff_solverdef"]))
                                cross = int(np.exp(
                                    np.log(e0["shard_faces"]) * (1 - f)
                                    + np.log(e1["shard_faces"]) * f))
                            break
                    crossing[ck] = cross
                block["eff_vs_shard_faces_P8"] = curves
                block["crossing_ge85_shard_faces_P8"] = {
                    **crossing,
                    "note": "smallest P=8 shard size (faces) where "
                            "eff_solverdef >= 0.85 (log-interpolated "
                            "between table sizes); null = gate not met "
                            "at any tabled size",
                }
                log("crossing (gate >= 0.85, shard faces): " + " ".join(
                    f"{k}={v}" for k, v in crossing.items()))
            out["multichip_model"] = block
            log("multichip MODEL: " + " ".join(
                f"{k}: bulk={v['bulk_gfps']:.1f}G ovl={v['overlap_gfps']:.1f}G"
                f" effS={v['eff_solverdef']}"
                for k, v in block.items() if isinstance(v, dict)
                and "bulk_gfps" in v))
        except Exception as e:  # model block must never sink the benchmark
            log(f"multichip model block skipped: {e}")
    out["last_stage"] = "node_margins"
    if "c1_fps" in cpu:
        # honest denominators: the C loop is the reference's language;
        # NumPy overstates vs_baseline by the np.add.at penalty (~24x here)
        out["cpu_golden_c_faces_per_sec"] = float(cpu["c1_fps"])
        out["vs_baseline_c"] = float(fps / cpu["c1_fps"])
        # 2-socket-node estimate from two mechanisms:
        #  (a) 64 cores x the DRAM-bound 1-core rate, linear scaling;
        #  (b) the node bandwidth wall: the C loop moves ~816 B/face of
        #      DRAM traffic (faces 8 + normals 24 + 2 var rows 112 + grad
        #      read+write 672), so a BENCH_NODE_GBPS-class node (default
        #      500 GB/s, 2-socket server DDR) caps at BW/816 faces/s
        #      regardless of core count.
        # PHYSICAL combination = min(a, b): the loop is measured
        # memory-bound, so node throughput cannot exceed the node's DRAM
        # bus no matter the core count — linear-64 applies only below the
        # wall.  Round 3 took max(a, b) as "CPU-generous", which was
        # harmless while a loaded host read c1_dram = 5.3 Mf/s (a < b); an
        # IDLE host (round 4) reads 14.9 Mf/s, making linear-64 imply
        # 778 GB/s of traffic on the assumed 500 GB/s bus — impossible, and
        # it silently collapsed the bandwidth-sensitivity row too.  The
        # uncapped max() margin is still recorded (vs_2socket_node_maxest)
        # for round-3 continuity.
        # The round-2 single-number estimate (64 x cache-resident c1) mixed
        # an L3-resident rate with a DRAM-bound workload; every input is
        # recorded so the margin can be re-derived.
        c1d = cpu.get("c1_dram_fps", cpu["c1_fps"])
        node, node_lin, node_bw = _node_estimate(
            c1d, float(os.environ.get("BENCH_NODE_GBPS", "500")))
        out["cpu_golden_c_dram_faces_per_sec"] = float(c1d)
        out["cpu_c_thread_fps"] = cpu.get("c_thread_fps")
        out["host_cores"] = cpu["host_cores"]
        out["node_est_faces_per_sec"] = float(node)
        out["node_est_linear64_faces_per_sec"] = float(node_lin)
        out["node_est_bw_capped_faces_per_sec"] = float(node_bw)
        out["vs_2socket_node_est"] = float(fps / node)
        # the one free parameter left in the node estimate is the assumed
        # node DRAM bandwidth (this host is SINGLE-CORE — nproc=1, so the
        # multi-core saturation curve that would anchor it is
        # environmentally unmeasurable; c_thread_fps records the 1-core
        # host's oversubscription smoke).  Report the margin's sensitivity
        # so the gate verdict's dependence on the assumption is explicit:
        # 300 GB/s ~ an older 2-socket DDR4 node, 500 the default (modern
        # DDR5 2-socket), 800 an aggressive HBM-less upper bound.
        out["node_est_note"] = (
            "single-core host: node scaling unmeasurable in-sandbox; est = "
            "min(64 x measured DRAM-bound core rate, node-BW wall at "
            "measured 816 B/face) — memory-bound loop, so the bus wall "
            "binds; round-3 max() key kept as vs_2socket_node_maxest. "
            "The wall assumes NO cache reuse on the node (all 816 B/face "
            "from DRAM every sweep); shared-L3 reuse on a real 64-core "
            "node would raise the wall and shrink this margin — the gate "
            "verdict should be read against BOTH est and maxest keys")
        out["vs_node_at_gbps"] = {
            str(g): float(fps / _node_estimate(c1d, g)[0])
            for g in (300, 500, 800)
        }
        # round-3 continuity: the max() combination (unphysical when
        # linear-64 exceeds the bus wall, as on an idle host)
        out["vs_2socket_node_maxest"] = float(fps / max(node_lin, node_bw))
        # legacy key (round-1/2 continuity): 64 x the small-mesh c1 —
        # cache-resident, so on an idle host it overstates the node
        out["vs_2socket_node_64c_est"] = float(fps / (64 * cpu["c1_fps"]))
        if "reduced_precision" in out:
            rp_fps = out["reduced_precision"]["faces_per_sec"]
            out["reduced_precision"]["vs_2socket_node_est"] = float(
                rp_fps / node)
            # maxest companion (advisor r4 low #3): the gate claim should
            # not ride on the round-4 min() methodology switch alone
            out["reduced_precision"]["vs_2socket_node_maxest"] = float(
                rp_fps / max(node_lin, node_bw))
    wd2.cancel()
    out.pop("last_stage", None)
    _emit_final(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
