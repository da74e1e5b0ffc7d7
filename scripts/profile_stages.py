"""Stage-by-stage timing of the production render at the bench shape."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from splatter_a_video_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp

from splatter_a_video_tpu.ops import binning, projection, quaternion, rasterize, sh
from splatter_a_video_tpu.ops import rasterize_tpu as rtpu

W, H, N = 854, 480, 100_000
MI = 1 << 19
BLOCK = (16, 16)
RECT = "tight"

key = jax.random.PRNGKey(0)
k = jax.random.split(key, 6)
xyz = jnp.concatenate(
    [
        jax.random.uniform(k[0], (N, 2), minval=-1, maxval=1),
        jax.random.uniform(k[1], (N, 1), minval=0.5, maxval=2),
    ],
    axis=1,
)
scale = jnp.exp(jax.random.uniform(k[2], (N, 3), minval=-5.5, maxval=-4.0))
quat = quaternion.quat_normalize(jax.random.normal(k[3], (N, 4)))
opacity = jax.random.uniform(k[4], (N,), minval=0.3, maxval=0.95)
shs = jax.random.normal(k[5], (N, 16, 3)) * 0.3
extr = jnp.eye(3, 4)


def timeit(name, f, *args, reps=30):
    f = jax.jit(f)
    out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    print(f"{name:32s} {(time.time()-t0)/reps*1e3:7.3f} ms", flush=True)
    return out


def stage_project(xyz, scale, quat, opacity, shs):
    nvis = xyz.shape[0]
    dirs = jnp.concatenate(
        [jnp.zeros((nvis, 2), xyz.dtype), jnp.ones((nvis, 1), xyz.dtype)], axis=1
    )
    uv, depth = projection.project_ortho(xyz, extr, W, H, 0.01, 1.3)
    visible = depth != 0
    rgb = sh.eval_sh(3, shs, dirs, visible)
    cov3d = quaternion.build_cov3d(scale, quat, visible)
    max_r = projection.max_radius_for_tile_cap(64, BLOCK)
    conic, radius, tiles, rect_min, rect_max = projection.ewa_ortho(
        cov3d, extr, uv, W, H, visible, BLOCK, max_r, RECT
    )
    return uv, depth, rgb, conic, radius, tiles, rect_min, rect_max, opacity


proj = timeit("projection+SH+cov3d+EWA", stage_project, xyz, scale, quat, opacity, shs)
uv, depth, rgb, conic, radius, tiles, rect_min, rect_max, op = proj
feats = jnp.concatenate([rgb, depth[:, None]], axis=1)
C = feats.shape[1]


def stage_bin(uv, conic, op, feats, depth, tiles, rect_min, rect_max):
    channels = jnp.concatenate([uv, conic, op[:, None], feats], axis=1)
    return binning.bin_sort_pack(
        depth, tiles, rect_min, rect_max, channels, W, H,
        max_intersections=MI, max_tiles_per_gaussian=64,
        chunk=128, block=BLOCK, sort_mode="packed",
    )


b = timeit("bin_sort_pack", stage_bin, uv, conic, op, feats, depth, tiles,
           rect_min, rect_max)


def stage_full(xyz, scale, quat, opacity, shs):
    cfg = rasterize.RasterizeConfig(
        width=W, height=H, max_intersections=MI,
        block_x=BLOCK[0], block_y=BLOCK[1], rect_mode=RECT,
    )
    out = rasterize.render_gaussians(xyz, scale, quat, opacity, shs, extr, cfg)
    return out.features["rgb"], out.features["depth"]


timeit("FULL render", stage_full, xyz, scale, quat, opacity, shs)

# forward pallas only, on a prebuilt binning (device-resident)
fn = rtpu.splat_scene  # compile path check only


def stage_blend(packed, gid, edges, chunk_base, nint, offs, tiles_):
    bb = binning.Binning(
        packed=packed, gid=gid, edges=edges, chunk_base=chunk_base,
        num_intersections=nint, offs=offs, tiles=tiles_,
        num_tiles_x=b.num_tiles_x, num_tiles_y=b.num_tiles_y, chunk=128,
    )
    # rebuild the fwd-only pallas call via the private builder
    splat = rtpu._build_splat(
        C, W, H, (1.0, 1.0, 1.0, 1.0), (1.0,) * C, 0, 128, MI, 64,
        "packed", BLOCK, False,
    )
    # bypass binning: call the inner fwd directly is not exposed; skip.
    return packed.sum()


print("nint =", int(b.num_intersections), flush=True)
