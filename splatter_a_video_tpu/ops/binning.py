"""Tile binning + depth sorting + channel packing (pure jnp/XLA, TPU-fast).

TPU-native re-design of the reference sort stage (`sort_gaussian.py` +
`sort_gaussian.cu` in `/root/reference/src/submodules/dptr/dptr/gs/`):

  reference (CUDA): dynamic duplicate-per-tile expansion -> 64-bit
      `tile_id<<32|float_depth_bits` keys -> torch radix sort -> per-tile
      [start, end) ranges; per-gaussian attributes are fetched through
      shared memory inside the blend kernel (GPUs gather well).

  here (XLA, static shapes): TPUs have no hardware gather — device traces
      (memory: tpu-perf-model) measured XLA gathers/scatters at ~100 M
      indices/s while `lax.sort` permutes 16 carried operands at ~130 M
      slots/ms-equivalent. So the pipeline uses only scans and ONE sort:

      1. ragged expansion by marks: scatter one marker per gaussian at its
         (monotone) start offset, recover the owner index by `cumsum` and
         the start position by `cummax`;
      2. broadcast per-gaussian channels to their slots with a segmented
         fill-forward implemented as a log-shift loop (bandwidth-bound;
         `lax.associative_scan` on tuples compiles pathologically here);
      3. ONE variadic `lax.sort` on the packed `tile<<20 | depth_bits>>11`
         int32 key *carrying every per-intersection channel* into
         tile-major depth order (positive-float bit patterns are
         order-monotone; the >>11 truncation only reorders sub-20-bit
         depth ties — "exact" mode keeps full bits + stable order for
         parity tests);
      4. per-tile [start, end) ranges by a T+1-point searchsorted (tiny).

  The blend kernel (rasterize_tpu.py) consumes the ranges directly with
  tail-lane masking — there is no chunk-aligned re-placement pass.

Channel layout of `packed` matches `rasterize_tpu.packed_rows`:
  rows 0..5 = uv_x, uv_y, conic_a, conic_b, conic_c, opacity;
  rows 6..6+C = features; then 2 abs-sink rows; zero-padded to 8k rows.
One extra `chunk` of zero columns guards unaligned tail DMAs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .projection import tile_grid


class Binning(NamedTuple):
    """Sorted, packed intersection stream for one camera view."""

    packed: jnp.ndarray      # [D, M + chunk] sorted per-intersection channels
    gid: jnp.ndarray         # [M + chunk] int32 gaussian ids (-1 = padding)
    edges: jnp.ndarray       # [T + 1] int32 per-tile [start, end) into packed
    chunk_base: jnp.ndarray  # [T + 1] int32 cumulative per-tile chunk counts
    #                          (backward writes tile t's chunk i at column
    #                           (chunk_base[t] + i) * chunk — disjoint+aligned)
    num_intersections: jnp.ndarray  # [] int32 true count (overflow diagnostic)
    offs: jnp.ndarray        # [N] int32 per-gaussian exclusive prefix of tiles
    tiles: jnp.ndarray       # [N] int32 clamped per-gaussian tile counts
    num_tiles_x: int
    num_tiles_y: int
    chunk: int

    @property
    def num_tiles(self) -> int:
        return self.num_tiles_x * self.num_tiles_y


def _fill_forward(
    mark: jnp.ndarray, vals: jnp.ndarray, max_dist: int
) -> jnp.ndarray:
    """Segmented fill-forward via a log-shift loop, channel-major layout.

    mark: [M] bool — positions holding fresh values. vals: [C, M] with
    columns defined at marks. Returns vals with every column replaced by
    the nearest marked column at or before it, which is never farther than
    `max_dist` columns back: segments are one Gaussian's tile slots, and
    per-Gaussian tile counts are clamped to `max_tiles_per_gaussian` — so
    only ceil(log2(max_dist)) bandwidth passes are needed (7 at the default
    cap of 64, vs 19 for a full-length scan; measured ~3x cheaper).
    Compiles to plain pad/slice/select (no associative_scan tuple
    machinery, which stalls the TPU compiler at this size). Channel-major
    [C, M] keeps M on the 128-lane axis — an [M, C] layout would pad C up
    to 128 lanes and waste ~32x bandwidth.
    """
    m = mark
    v = vals
    shift = 1
    while shift < max_dist:
        vs = jnp.concatenate([v[:, :shift], v[:, :-shift]], axis=1)
        ms = jnp.concatenate([jnp.zeros((shift,), bool), m[:-shift]])
        v = jnp.where(m[None, :], v, vs)
        m = m | ms
        shift *= 2
    return v


def _local_cummax(x: jnp.ndarray, max_dist: int) -> jnp.ndarray:
    """Running max whose true propagation distance is bounded by `max_dist`.

    Equivalent to `lax.cummax` whenever no element needs to look farther
    than `max_dist` positions back (here: marks are at most one clamped
    tile footprint apart). log2(max_dist) shifted-max passes instead of a
    full-length scan.
    """
    shift = 1
    while shift < max_dist:
        xs = jnp.concatenate([x[:shift], x[:-shift]])
        x = jnp.maximum(x, xs)
        shift *= 2
    return x


@partial(
    jax.jit,
    static_argnames=(
        "W", "H", "max_intersections", "max_tiles_per_gaussian", "chunk",
        "block", "sort_mode",
    ),
)
def bin_sort_pack(
    depth: jnp.ndarray,
    tiles: jnp.ndarray,
    rect_min: jnp.ndarray,
    rect_max: jnp.ndarray,
    channels: jnp.ndarray,
    W: int,
    H: int,
    max_intersections: int,
    max_tiles_per_gaussian: int = 64,
    chunk: int = 128,
    block: int = 16,
    sort_mode: str = "packed",
) -> Binning:
    """Build the sorted packed intersection stream.

    Args:
      depth: [N] camera depths (0 = culled).
      tiles/rect_min/rect_max: EWA tile footprints.
      channels: [N, Dc] per-gaussian values to materialize per intersection
        (uv, conic, opacity, features, abs sinks — layout documented above).
      max_intersections: static slot budget; overflow truncates (true count
        reported in `num_intersections` — log saturation, don't hide it).
      sort_mode: "packed" (fast single int32 key) | "exact" (full depth
        bits, stable — parity tests). Auto-falls back to exact when the
        tile grid exceeds the 11-bit packing budget.
    """
    N = depth.shape[0]
    tgx, tgy = tile_grid(W, H, block)
    T = tgx * tgy
    M = max_intersections
    Dc = channels.shape[1]

    tiles = jnp.minimum(tiles.astype(jnp.int32), max_tiles_per_gaussian)
    offs = (jnp.cumsum(tiles) - tiles).astype(jnp.int32)
    total = offs[-1] + tiles[-1]

    # --- 1 + 2. ragged expansion: three 1-channel start scatters + scans ----
    # Each *non-empty* gaussian scatters (owner id, depth bits, packed rect)
    # to its start slot; empty gaussians go to the dropped sentinel, so the
    # owner of any slot is the cummax of scattered ids (largest g with
    # offs[g] <= s). 1-channel scatters are the fast shape here: XLA's TPU
    # emitter vectorizes scalar updates (~0.6 ms each) while a multi-channel
    # row scatter serializes at ~25M rows/s (5.2 ms).
    s = jnp.arange(M, dtype=jnp.int32)
    rect_w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1).astype(jnp.int32)
    # fill channels: IEEE depth bits (positive depths sort correctly as int)
    # and the rect packed into one s32 (tile coords are < 2^11 up to
    # 32k-pixel images; rect width <= max_tiles_per_gaussian < 2^10)
    depth_bits_g = jax.lax.bitcast_convert_type(
        depth.astype(jnp.float32), jnp.int32
    )
    rect_packed = (
        rect_min[:, 0].astype(jnp.int32)
        | (rect_min[:, 1].astype(jnp.int32) << 11)
        | (rect_w << 22)
    )
    row_idx = jnp.where(tiles > 0, offs, M)
    g_scat = (
        jnp.full((M,), -1, jnp.int32)
        .at[row_idx]
        .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    )
    has_mark = g_scat >= 0
    # scan/fill propagation distance is bounded by the clamped footprint
    cap = max(int(max_tiles_per_gaussian), 2)
    g = jnp.clip(_local_cummax(g_scat, cap), 0, N - 1)  # owner gaussian index
    start_pos = _local_cummax(jnp.where(has_mark, s, -1), cap)
    j = s - start_pos
    valid = s < total

    # only what the sort key needs rides the fill; the full channel block is
    # fetched AFTER the sort by one gather — measured cheaper than carrying
    # 16 channels through the sort network
    start_vals = jnp.stack(
        [
            jnp.zeros((M,), jnp.int32).at[row_idx].set(v, mode="drop")
            for v in (depth_bits_g, rect_packed)
        ]
    )
    slot_vals = _fill_forward(has_mark, start_vals, cap)  # [2, M] int32

    rect_s = slot_vals[1]
    rmx = rect_s & 0x7FF
    rmy = (rect_s >> 11) & 0x7FF
    rw = jnp.maximum(rect_s >> 22, 1)
    tx = rmx + j % rw
    ty = rmy + j // rw
    tile_id = jnp.where(valid, ty * tgx + tx, T)

    # --- 3. (key, gid) sort + one post-sort channel gather -------------------
    inf_bits = np.float32(np.inf).view(np.int32).item()
    depth_bits = jnp.where(valid, slot_vals[0], inf_bits)
    gid_slot = jnp.where(valid, g, -1)
    if sort_mode == "packed" and T < (1 << 11):
        key = (tile_id << 20) | jax.lax.shift_right_logical(depth_bits, 11)
        sorted_key, sorted_gid = jax.lax.sort((key, gid_slot), num_keys=1)
        sorted_tile = jax.lax.shift_right_logical(sorted_key, 20)
    else:
        sorted_tile, _, sorted_gid = jax.lax.sort(
            (tile_id, depth_bits, gid_slot), num_keys=2, is_stable=True
        )

    pad_ok = sorted_gid >= 0
    safe_gid = jnp.where(pad_ok, sorted_gid, 0)
    # the one gather, channel-major: channels pre-transposed to [Dc, N] so
    # the output [Dc, M] keeps M on the lane axis (an [M, Dc] gather would
    # pad Dc to 128 lanes and waste ~8-32x bandwidth)
    packed = jnp.where(
        pad_ok[None, :],
        jnp.take(channels.astype(jnp.float32).T, safe_gid, axis=1),
        0.0,
    )  # [Dc, M]
    D_target = -(-Dc // 8) * 8
    # one fused pad: row padding to the 8-sublane multiple + guard columns
    # for unaligned tail DMAs (two concatenates would cost two copies)
    packed = jnp.pad(packed, ((0, D_target - Dc), (0, chunk)))
    gid_out = jnp.concatenate(
        [jnp.where(pad_ok, sorted_gid, -1), jnp.full((chunk,), -1, jnp.int32)]
    )

    # --- 4. per-tile ranges ---------------------------------------------------
    edges = jnp.searchsorted(
        sorted_tile, jnp.arange(T + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = edges[1:] - edges[:-1]
    # EXACT per-tile chunk counts as the kernel walks them (aligned-down
    # start): the backward writes exactly these chunk slots, so the grad
    # buffer has no stale columns below chunk_base[-1]
    astart = (edges[:-1] // chunk) * chunk
    nchunks = jnp.where(counts > 0, -(-(edges[1:] - astart) // chunk), 0)
    chunk_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)]
    )

    return Binning(
        packed=packed,
        gid=gid_out,
        edges=edges,
        chunk_base=chunk_base,
        num_intersections=total,
        offs=offs,
        tiles=tiles,
        num_tiles_x=tgx,
        num_tiles_y=tgy,
        chunk=chunk,
    )


def grad_buffer_size(max_intersections: int, num_tiles: int, chunk: int) -> int:
    """Static size of the backward's chunk-slot grad buffer: every tile can
    waste up to two partial chunks (tail rounding + aligned-down start)."""
    return -(-(max_intersections + 2 * num_tiles * chunk) // chunk) * chunk
