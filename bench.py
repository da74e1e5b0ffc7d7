"""Benchmark: render FPS of the flagship 480p/100k-Gaussian scene.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is relative to the reference's 149 FPS 480p render rate
(`/root/reference/README.md:22`, BASELINE.md).

The TPU sits behind a relay that occasionally drops compile requests, so
every phase runs under a SIGALRM watchdog and falls back to smaller
configurations rather than hanging the driver. The persistent compilation
cache makes retries monotonic.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 149.0

# One global wall-clock deadline for the whole bench (probe + all configs),
# chosen to sit comfortably under any plausible driver timeout. Every
# per-phase SIGALRM watchdog is clipped to the remaining global budget, so
# a dead relay can never leave the driver with rc=124 and no JSON
# (the BENCH_r02 failure mode: 4 configs x 900 s compile watchdogs).
GLOBAL_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
_T_START = time.time()


def _remaining():
    return GLOBAL_BUDGET_S - (time.time() - _T_START)


class Timeout(Exception):
    pass


def _alarm(sec):
    def handler(signum, frame):
        raise Timeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(sec)


def _clear():
    signal.alarm(0)


def _alarm_budgeted(sec):
    """SIGALRM clipped to the remaining global budget (min 1 s so the
    Timeout fires immediately rather than hanging when budget is gone)."""
    _alarm(max(1, min(int(sec), int(_remaining()))))


def probe_backend(timeout_s=60, reserve_s=300.0):
    """Fast proof the device answers before any expensive compile.

    A trivial jit on a dead axon relay hangs in compile; 60 s is ~2x the
    worst observed healthy first-compile of this one-matmul program.
    Single probes can time out transiently on a healthy relay (observed
    2026-08-19: probe timeout one minute after a clean e2e run, next probe
    1.6 s), and relay outages come in few-minute windows (BENCH_r03 was
    voided by one while the same session validated fine an hour earlier) —
    so instead of a fixed attempt count, KEEP probing every ~30 s until
    only `reserve_s` of the global budget remains: enough for one
    warm-cache flagship config run. The relay coming back 10 minutes in
    still yields a real number instead of a {value: 0.0} record."""
    import jax
    import jax.numpy as jnp

    last = None
    attempt = 0
    while True:
        attempt += 1
        _alarm_budgeted(timeout_s)
        try:
            v = float(jax.jit(lambda x: (x @ x.T).sum())(jnp.ones((777, 333))))
            dev = str(jax.devices()[0])
            _clear()
            print(f"# probe ok ({dev}) on attempt {attempt}: {v}",
                  file=sys.stderr)
            return
        except (Timeout, Exception) as e:  # noqa: BLE001
            last = e
            print(
                f"# probe attempt {attempt} failed ({type(e).__name__}); "
                f"{_remaining():.0f}s of budget left", file=sys.stderr)
        finally:
            _clear()
        if _remaining() < reserve_s + timeout_s:
            raise last
        time.sleep(min(30.0, max(5.0, _remaining() / 20.0)))


def bench_render(W, H, N, max_int, compile_timeout=900, reps=20, batch=10):
    """Video-render throughput: batched frames per dispatch (lax.map), the
    `render_video(batched=True)` production path. Per-frame trajectory
    evaluation is modeled by a degree-1 position drift so XLA cannot CSE
    frames. The slot budget is sized to the scene's true intersection
    count (probed, then asserted un-saturated — truncation would make the
    bench dishonest). Single-dispatch FPS goes to stderr for reference;
    the axon relay adds ~0.5 ms RPC per dispatch that real TPU hosts
    don't pay."""
    import jax
    import jax.numpy as jnp

    from splatter_a_video_tpu.models import camera, gaussians
    from splatter_a_video_tpu.ops import rasterize

    rng_key = jax.random.PRNGKey(0)
    k = jax.random.split(rng_key, 6)
    xyz = jnp.concatenate(
        [
            jax.random.uniform(k[0], (N, 2), minval=-1.0, maxval=1.0),
            jax.random.uniform(k[1], (N, 1), minval=0.5, maxval=2.0),
        ],
        axis=1,
    )
    scale = jnp.exp(jax.random.uniform(k[2], (N, 3), minval=-5.5, maxval=-4.0))
    from splatter_a_video_tpu.ops.quaternion import quat_normalize

    quat = quat_normalize(jax.random.normal(k[3], (N, 4)))
    opacity = jax.random.uniform(k[4], (N,), minval=0.3, maxval=0.95)
    shs = jax.random.normal(k[5], (N, 16, 3)) * 0.3
    cam = camera.canonical_camera(W, H)
    extr = jnp.asarray(cam.extrinsic)
    drift = jnp.array([1e-4, 0.0, 0.0])  # per-frame motion (degree-1 poly)

    def make_cfg(mi):
        # 32x16 tiles + tight rects measured fastest (sweep_render.py);
        # max_tiles_per_gaussian=32 halves the fill-forward passes and is
        # un-truncating for this scene (verified: render checksum is
        # bit-identical to the 64-cap image)
        # chunk=256 + MXU coverage edges: ~0.1 ms render win after the
        # masking/pack-gather trims (neutral before them); the TRAIN step
        # keeps chunk=128 (its backward runs 3 chunk^2 MXU scans per visit)
        return rasterize.RasterizeConfig(
            width=W, height=H, max_intersections=mi, block_x=32, block_y=16,
            max_tiles_per_gaussian=32, chunk=256, edges_mode="matmul",
            expand_mode=os.environ.get("BENCH_EXPAND", "auto"),
        )

    # ---- probe the true intersection count, then size the budget --------
    rcfg_probe = make_cfg(max_int)

    @jax.jit
    def probe(xyz):
        out = rasterize.render_gaussians(
            xyz, scale, quat, opacity, shs, extr, rcfg_probe
        )
        return out.features["rgb"], out.num_intersections

    _alarm_budgeted(compile_timeout)
    try:
        rgb, n_int = probe(xyz)
        rgb.block_until_ready()
    finally:
        _clear()
    n_int = int(n_int)
    tight = min(max_int, -(-int(n_int * 1.03) // 256) * 256)
    print(f"# intersections {n_int} -> budget {tight}", file=sys.stderr)
    if n_int > max_int:
        raise RuntimeError(f"saturated: {n_int} > {max_int}")
    rcfg = make_cfg(tight)

    @jax.jit
    def render(xyz, scale, quat, opacity, shs):
        out = rasterize.render_gaussians(xyz, scale, quat, opacity, shs, extr, rcfg)
        return out.features["rgb"], out.num_intersections

    @jax.jit
    def render_clip(xyz, scale, quat, opacity, shs):
        def frame(t):
            out = rasterize.render_gaussians(
                xyz + drift * t, scale, quat, opacity, shs, extr, rcfg
            )
            return out.features["rgb"], out.num_intersections

        return jax.lax.map(
            frame, jnp.arange(batch, dtype=jnp.float32)
        )

    _alarm_budgeted(compile_timeout)
    try:
        rgb, n1 = render(xyz, scale, quat, opacity, shs)
        rgb.block_until_ready()
        clip, n_all = render_clip(xyz, scale, quat, opacity, shs)
        clip.block_until_ready()
    finally:
        _clear()
    n_max = max(int(n1), int(jnp.max(n_all)))
    if n_max > tight:  # drifted frames must fit the tight budget too
        raise RuntimeError(f"saturated: {n_max} > {tight}")

    # single-dispatch reference number: the interactive time-scrub form
    # (scene resident on device, one scalar t per frame — the
    # `inference.render_frame` production shape); best-of-windows so one
    # relay hiccup doesn't taint the measurement. NOTE: the axon relay adds
    # a per-dispatch gap that varies ~±0.5 ms between processes; the
    # batched headline is the stable number.
    @jax.jit
    def render_t(t):
        out = rasterize.render_gaussians(
            xyz + drift * t, scale, quat, opacity, shs, extr, rcfg
        )
        return out.features["rgb"]

    ts = [jnp.float32(i % batch) for i in range(reps)]
    for _ in range(5):
        rgb = render_t(ts[0])
    rgb.block_until_ready()
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        for t in ts:
            rgb = render_t(t)
        rgb.block_until_ready()
        best = min(best, (time.time() - t0) / reps)
    fps_single = 1.0 / best
    print(f"# single-dispatch: {fps_single:.1f} FPS", file=sys.stderr)
    dev_ms = None

    # relay-independent ground truth: per-frame device-executable time from
    # a profiler trace (the axon relay adds 0.5-1.2 ms RPC per dispatch that
    # varies per process and that a directly-attached TPU host doesn't pay)
    try:
        import glob as _glob
        import gzip as _gzip
        import shutil as _shutil

        trace_dir = "/tmp/sav_bench_trace"
        _shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            for t in ts[:3]:
                rgb = render_t(t)
            rgb.block_until_ready()
        files = _glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
        with _gzip.open(files[0], "rt") as f:
            trace = json.load(f)
        pid_names = {
            e["pid"]: e["args"].get("name", "")
            for e in trace.get("traceEvents", [])
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        # interval-UNION, not a plain sum: device tracks nest a parent
        # module event ("jit_render_t") over its per-op children, so a sum
        # double-counts (~2x) — observed 11.85 ms "device" under a 7.3 ms
        # wall. Busy time = union of [ts, ts+dur) PER DEVICE PID, summed
        # across pids (a global union would collapse concurrent work on
        # different chips; harmless on this single-v5e setup, correct on
        # a multi-device trace).
        by_pid = {}
        for e in trace.get("traceEvents", []):
            if (
                e.get("ph") == "X" and e.get("dur", 0) > 0
                and ("TPU" in pid_names.get(e["pid"], "")
                     or "/device" in pid_names.get(e["pid"], "").lower())
            ):
                by_pid.setdefault(e["pid"], []).append(
                    (e["ts"], e["ts"] + e["dur"])
                )
        dev_us = 0.0
        for spans in by_pid.values():
            spans.sort()
            cur_s, cur_e = None, None
            for s, t in spans:
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        dev_us += cur_e - cur_s
                    cur_s, cur_e = s, t
                else:
                    cur_e = max(cur_e, t)
            if cur_e is not None:
                dev_us += cur_e - cur_s
        dev_ms = dev_us / 1e3 / len(ts[:3])
        print(
            f"# single-dispatch device time: {dev_ms:.2f} ms/frame "
            f"(= {1e3 / dev_ms:.1f} FPS net of relay RPC)",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001 - diagnostics only
        print(f"# device-time trace unavailable: {e}", file=sys.stderr)

    # headline: batched video rendering (one dispatch per `batch` frames)
    for _ in range(2):
        clip, _ = render_clip(xyz, scale, quat, opacity, shs)
    clip.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        clip, _ = render_clip(xyz, scale, quat, opacity, shs)
    clip.block_until_ready()
    fps_batched = reps * batch / (time.time() - t0)
    return {
        "fps": fps_batched,
        "single_dispatch_fps": round(fps_single, 1),
        "device_ms_per_frame": round(dev_ms, 2) if dev_ms is not None else None,
    }


def run():
    """Returns the result dict to print; raises only on programmer error."""
    from splatter_a_video_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    # Fail fast if the backend is dead: a 60 s probe instead of hours of
    # hung compiles (the 2026-08-17 relay outage burned the round-2 bench
    # slot exactly this way).
    try:
        probe_backend()
    except Timeout:
        return {
            "metric": "render_fps_480p_100k",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": "backend probe timed out (relay down?)",
        }
    except Exception as e:  # noqa: BLE001
        return {
            "metric": "render_fps_480p_100k",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"backend probe failed: {type(e).__name__}: {e}",
        }

    configs = [
        # (W, H, N, max_intersections, label); the flagship config is
        # retried at the end — relay compile-request drops are transient
        (854, 480, 100_000, 3 << 17, "480p_100k"),
        (640, 360, 50_000, 1 << 20, "360p_50k"),
        (320, 240, 20_000, 1 << 18, "240p_20k"),
        (854, 480, 100_000, 3 << 17, "480p_100k"),
    ]
    errors = []
    for W, H, N, mi, label in configs:
        if _remaining() < 60:
            errors.append("global budget exhausted")
            break
        try:
            stats = bench_render(W, H, N, mi)
            return {
                "metric": f"render_fps_{label}",
                "value": round(stats["fps"], 1),
                "unit": "frames/s (854x480 rgb+depth render, 100k gaussians)"
                if label == "480p_100k"
                else f"frames/s ({label} fallback config)",
                "vs_baseline": round(stats["fps"] / BASELINE_FPS, 3),
                "single_dispatch_fps": stats["single_dispatch_fps"],
                "device_ms_per_frame": stats["device_ms_per_frame"],
            }
        except Timeout:
            errors.append(f"{label}: watchdog")
            print(f"# {label}: compile watchdog fired, falling back", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            errors.append(f"{label}: {type(e).__name__}: {e}")
            print(f"# {label}: {type(e).__name__}: {e}", file=sys.stderr)
    return {
        "metric": "render_fps_480p_100k",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "error": "; ".join(errors) or "no config completed",
    }


HISTORY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_history.jsonl")


def _read_last_good():
    """Latest committed on-chip measurement, for provenance when the relay
    is down: a {value: 0.0} capture then still documents when >=baseline
    was last measured for real instead of erasing the record."""
    try:
        last = None
        with open(HISTORY_PATH) as f:
            for line in f:
                line = line.strip()
                if line:
                    last = json.loads(line)
        return last
    except (OSError, ValueError):
        return None


def _append_history(result):
    try:
        entry = dict(result)
        entry["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(HISTORY_PATH, "a") as f:
            f.write(json.dumps(entry) + "\n")
    except OSError as e:
        print(f"# could not append bench history: {e}", file=sys.stderr)


def main():
    # The one invariant: this process always prints exactly one JSON line,
    # whatever happens above it.
    try:
        result = run()
    except BaseException as e:  # noqa: BLE001 - incl. KeyboardInterrupt from drivers
        result = {
            "metric": "render_fps_480p_100k",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"unhandled: {type(e).__name__}: {e}",
        }
    if result.get("value", 0.0) > 0.0:
        _append_history(result)
    last_good = _read_last_good()
    if last_good is not None:
        result["last_good"] = last_good
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
