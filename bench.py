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


class Timeout(Exception):
    pass


def _alarm(sec):
    def handler(signum, frame):
        raise Timeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(sec)


def _clear():
    signal.alarm(0)


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
        )

    # ---- probe the true intersection count, then size the budget --------
    rcfg_probe = make_cfg(max_int)

    @jax.jit
    def probe(xyz):
        out = rasterize.render_gaussians(
            xyz, scale, quat, opacity, shs, extr, rcfg_probe
        )
        return out.features["rgb"], out.num_intersections

    _alarm(compile_timeout)
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

    _alarm(compile_timeout)
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
        dev_us = sum(
            e["dur"]
            for e in trace.get("traceEvents", [])
            if e.get("ph") == "X" and e.get("dur", 0) > 0
            and ("TPU" in pid_names.get(e["pid"], "")
                 or "/device" in pid_names.get(e["pid"], "").lower())
        )
        dev_ms = dev_us / 1e3 / 3
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
    return reps * batch / (time.time() - t0)


def main():
    from splatter_a_video_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    configs = [
        # (W, H, N, max_intersections, label); the flagship config is
        # retried at the end — relay compile-request drops are transient
        (854, 480, 100_000, 3 << 17, "480p_100k"),
        (640, 360, 50_000, 1 << 20, "360p_50k"),
        (320, 240, 20_000, 1 << 18, "240p_20k"),
        (854, 480, 100_000, 3 << 17, "480p_100k"),
    ]
    for W, H, N, mi, label in configs:
        try:
            fps = bench_render(W, H, N, mi)
            print(
                json.dumps(
                    {
                        "metric": f"render_fps_{label}",
                        "value": round(fps, 1),
                        "unit": "frames/s (854x480 rgb+depth render, 100k gaussians)"
                        if label == "480p_100k"
                        else f"frames/s ({label} fallback config)",
                        "vs_baseline": round(fps / BASELINE_FPS, 3),
                    }
                )
            )
            return
        except Timeout:
            print(f"# {label}: compile watchdog fired, falling back", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# {label}: {type(e).__name__}: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "render_fps_480p_100k",
                "value": 0.0,
                "unit": "frames/s",
                "vs_baseline": 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
