"""Kernel-float-math regression gate (PARITY.md deviation #12).

The tracking metric is extremely sensitive to the rasterizer's float math:
a ~1-ulp Horner reassociation in the blend kernel once left PSNR unchanged
(30.67) while moving synthetic TAP-Vid AJ 48.41 -> 39.93 over a 3k-step
run. Correctness tests with tolerances cannot catch that class of change,
so this gate pins an md5 digest of the CPU-f32 rendered image *and its
gradients* on a fixed scene, with zero tolerance.

If this test fails after an intentional kernel change: re-run the e2e
quality harness (`scripts/e2e_tpu.py`) and confirm the goldens in the
`scripts/validate_tpu.sh` header still hold (recon PSNR ~31.05, tapvid
AJ ~69.6 as of the 2026-08-19 size-prune gating fix), then refresh the
digests with `UPDATE_GOLDEN=1 python -m pytest tests/test_golden_digest.py -s`.

Digests are only expected to be stable for a fixed jax/XLA version on the
CPU backend (bit-deterministic per executable); a jax upgrade may refresh
them, which is itself a signal to re-validate e2e quality.
"""

import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatter_a_video_tpu.models import camera
from splatter_a_video_tpu.ops import quaternion, rasterize

W, H = 64, 48

# (sort_mode, scan_impl, edges_mode) -> md5 of image+grads bytes.
# Covers both sort modes, both transmittance-scan implementations, and both
# per-tile range derivations (the backward reduction runs in every case).
GOLDEN = {
    ("packed", "matmul", "search"): "ebf9bb378021dc971786304415e8ac88",  # loss=3.662681
    ("exact", "roll", "search"): "6b50ad5802d74b9771753537a4e73d72",  # loss=3.662678
    ("packed", "matmul", "matmul"): "ebf9bb378021dc971786304415e8ac88",  # loss=3.662681
}


def _scene():
    key = jax.random.PRNGKey(1234)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    n = 160
    xyz = jnp.concatenate(
        [
            jax.random.uniform(k1, (n, 2), minval=-0.9, maxval=0.9),
            jax.random.uniform(k2, (n, 1), minval=0.5, maxval=2.0),
        ],
        axis=1,
    )
    scale = jnp.exp(jax.random.uniform(k3, (n, 3), minval=-3.3, maxval=-2.0))
    quat = quaternion.quat_normalize(jax.random.normal(k4, (n, 4)))
    opacity = jax.random.uniform(k5, (n,), minval=0.2, maxval=0.95)
    shs = jax.random.normal(k6, (n, 16, 3)) * 0.3
    return xyz, scale, quat, opacity, shs


def _digest(sort_mode, scan_impl, edges_mode):
    xyz, scale, quat, opacity, shs = _scene()
    cam = camera.canonical_camera(W, H)
    extr = jnp.asarray(cam.extrinsic)
    cfg = rasterize.RasterizeConfig(
        width=W, height=H, max_intersections=1 << 13,
        sort_mode=sort_mode, scan_impl=scan_impl, edges_mode=edges_mode,
    )
    # Per-pixel weights break symmetry so reassociations can't cancel in
    # the reduction; extra track-style channel exercises the detached-
    # opacity blend path the tracking loss depends on.
    wr = jnp.cos(jnp.arange(H * W * 3, dtype=jnp.float32)).reshape(H, W, 3)
    wd = jnp.sin(jnp.arange(H * W, dtype=jnp.float32)).reshape(H, W)
    track_feat = xyz * jnp.array([1.0, -1.0, 0.5])

    def loss_fn(xyz, scale, quat, opacity, shs):
        out = rasterize.render_gaussians(
            xyz, scale, quat, opacity, shs, extr, cfg,
            extra_features={"track": track_feat},
        )
        loss = (
            jnp.sum(out.features["rgb"] * wr)
            + jnp.sum(out.features["depth"][..., 0] * wd)
            + jnp.sum(out.features["track"] * wr)
            + jnp.sum(out.final_T * wd)
        )
        # hash the kernel's raw outputs, NOT the loss scalar: the scalar's
        # bits depend on the order XLA reduces the test's own sums (it
        # shifted 1.7e-6 from a pure output-layout change with bit-exact
        # images and gradients), which is not kernel math
        fwd = (out.features["rgb"], out.features["depth"],
               out.features["track"], out.final_T,
               out.ncontrib.astype(jnp.int32))
        return loss, fwd

    (loss, fwd), grads = jax.jit(
        jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)
    )(xyz, scale, quat, opacity, shs)
    parts = [np.asarray(x) for x in fwd]
    parts += [np.asarray(g, np.float32) for g in grads]
    h = hashlib.md5()
    for p in parts:
        h.update(np.ascontiguousarray(p).tobytes())
    return h.hexdigest(), float(loss)


@pytest.mark.parametrize("mode", sorted(GOLDEN), ids=lambda m: "-".join(m))
def test_golden_digest(mode):
    assert jax.default_backend() == "cpu", "digest gate is CPU-f32 only"
    digest, loss = _digest(*mode)
    if os.environ.get("UPDATE_GOLDEN"):
        print(f"\n    {mode}: \"{digest}\",  # loss={loss:.6f}")
        return
    assert digest == GOLDEN[mode], (
        f"bit-level float-math change in the rasterizer ({mode}): digest "
        f"{digest} != pinned {GOLDEN[mode]} (loss={loss:.6f}). If the "
        "change is intentional, re-validate e2e quality (PSNR/AJ) before "
        "refreshing the golden — see module docstring."
    )
