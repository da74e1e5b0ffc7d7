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

      1. ragged expansion by marks: each non-empty gaussian scatters its
         start-slot record at its (monotone) start offset — in packed mode
         the owner id, depth-key bits, and rect fields are squeezed into
         TWO int32 scatter words (scatters cost ~0.5 ms each at 384k slots
         in-graph, so fewer is the lever; see the A/B layout in
         `bin_sort_pack`);
      2. broadcast the records to their slots with a segmented fill-forward
         (log-shift loop bounded by `max_tiles_per_gaussian` — segments are
         one gaussian's slots, so 7 passes, not log2(M);
         `lax.associative_scan` on tuples compiles pathologically here) and
         recover the in-rect position from a bounded cummax of mark
         positions;
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
    # presorted mode only: gid values index DEPTH-SORTED gaussians and
    # perm[sgid] = original index (None = gid is the original index)
    perm: jnp.ndarray | None = None
    # carry_prepos only: [M] pre-sort (gaussian-major expansion) position of
    # each post-sort slot — the backward's segmented grad reduction sorts
    # slot grads back into per-gaussian runs with it
    prepos: jnp.ndarray | None = None

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


def _monotone_expand_pallas(
    offs: jnp.ndarray, word_g: jnp.ndarray, M: int, total, *,
    interpret: bool, row: int = 128, rows_per_step: int = 128,
):
    """Pallas replacement for the scatter + fill-forward ragged expansion.

    For every slot s the expansion needs g(s) = the unique gaussian whose
    slot run covers s, i.e. the largest g with offs[g] <= s (offs is the
    exclusive prefix-sum of per-gaussian tile counts). The XLA form —
    scatter one mark per gaussian, segmented fill-forward — pays an
    M-scale scatter (~0.59 ms at M=2^19 on v5e) plus the fill passes.
    This kernel exploits monotonicity instead: a ROW of `row` consecutive
    slots can only be covered by a CONTIGUOUS window of <= row+1 gaussians
    starting at g_lo(row) (PRECONDITION: gaussians with tiles == 0 sort
    LAST, so offs is strictly increasing over the live prefix — see the
    dead-last depth key in `_bin_sort_pack_presorted`). The windows are
    gathered once in XLA (sequential indices, cheap), and the kernel
    resolves slots against them with masked-max reductions — no scatter,
    no multi-pass fill:

      mask[r, w] = win_offs[r, w] <= s(r, c)        (r: row, w: window)
      P1/P2      = max over w of (w << 16) | half16(win_word[r, w]) masked
                   — the window-local index w dominates, so both planes
                   select the SAME argmax w* = g(s)-g_lo and carry one
                   16-bit half of its record word each
      P3         = max over w of win_offs[r, w] masked = offs[g(s))

      word(s) = (hi16 << 16) | lo16,   j(s) = s - P3.

    Slots >= total resolve against tail windows whose entries are all
    dead (offs == total): their outputs are garbage-but-deterministic and
    every consumer masks them with `s < total`, exactly as the XLA path's
    unscattered slots. Returns (word_f [M] int32, j [M] int32).

    Layout (shaped by two Mosaic lowering rules: the last two block dims
    must be multiples of (8, 128) or span the array; dynamic LANE indexing
    does not lower): rows ride the SUBLANE axis, each row's window rides
    the LANE axis (padded to 256 with a +inf sentinel), and the kernel
    iterates over the `row` SLOT OFFSETS c with a STATIC Python loop —
    with A[r, w] = win_offs[r, w] - s(r, 0), the slot-c mask of every row
    in the block is just `A <= c`, reductions run over lanes, and each
    iteration stores one (G, 1) output column at a static lane offset.
    No relayouts, no dynamic slicing, no per-row extraction.
    """
    from jax.experimental import pallas as pl

    N = offs.shape[0]
    Wn = 256                          # >= row+1 window, one padding tile
    Mp = _round_up_int(M, row * rows_per_step)
    R = Mp // row
    G = rows_per_step

    row_starts = jnp.arange(R, dtype=jnp.int32) * row
    # largest g with offs[g] <= row_start  (== searchsorted_right - 1)
    g_lo = jnp.maximum(_searchsorted_left(offs, row_starts + 1) - 1, 0)
    w_iota = jnp.arange(Wn, dtype=jnp.int32)
    idx = g_lo[:, None] + w_iota[None, :]            # [R, Wn]
    # entries beyond row+1 / beyond N can never own a slot of this row:
    # give them a +inf offs sentinel so the mask is always false there
    # (within-range clipped duplicates of gaussian N-1 would be harmless
    # anyway — identical records — but the sentinel also covers the
    # w > row window tail, where a duplicate would NOT be)
    oob = (idx >= N) | (w_iota[None, :] > row)
    idx = jnp.minimum(idx, N - 1)
    win_offs = jnp.where(oob, jnp.int32(1 << 30), jnp.take(offs, idx))
    win_word = jnp.take(word_g, idx)

    def kernel(wo_ref, ww_ref, word_ref, j_ref):
        b = pl.program_id(0)
        wo_blk = wo_ref[...]                         # [G, Wn]
        ww_blk = ww_ref[...]                         # [G, Wn]
        r_sub = jax.lax.broadcasted_iota(jnp.int32, (G, Wn), 0)
        s0 = (b * G + r_sub) * row                   # s(r, 0) per sublane
        A = wo_blk - s0                              # [G, Wn]
        gl = jax.lax.broadcasted_iota(jnp.int32, (G, Wn), 1)
        key = jax.lax.shift_left(gl, 16)
        k_lo = key | jnp.bitwise_and(ww_blk, 0xFFFF)
        k_hi = key | jax.lax.shift_right_logical(ww_blk, 16)
        s0_col = (b * G + jax.lax.broadcasted_iota(
            jnp.int32, (G, 1), 0)) * row             # [G, 1]
        for c in range(row):
            mask = A <= c                            # [G, Wn]
            p1 = jnp.max(jnp.where(mask, k_lo, -1), axis=1,
                         keepdims=True)              # [G, 1]
            p2 = jnp.max(jnp.where(mask, k_hi, -1), axis=1,
                         keepdims=True)
            p3 = jnp.max(jnp.where(mask, wo_blk, -1), axis=1,
                         keepdims=True)
            word = jax.lax.shift_left(
                jnp.bitwise_and(p2, 0xFFFF), 16
            ) | jnp.bitwise_and(p1, 0xFFFF)
            word_ref[:, c : c + 1] = word
            j_ref[:, c : c + 1] = s0_col + c - p3

    word_f, j = pl.pallas_call(
        kernel,
        grid=(R // G,),
        in_specs=[
            pl.BlockSpec((G, Wn), lambda b: (b, 0)),
            pl.BlockSpec((G, Wn), lambda b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, row), lambda b: (b, 0)),
            pl.BlockSpec((G, row), lambda b: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, row), jnp.int32),
            jax.ShapeDtypeStruct((R, row), jnp.int32),
        ],
        interpret=interpret,
    )(win_offs, win_word)
    return word_f.reshape(-1)[:M], j.reshape(-1)[:M]


def _round_up_int(x: int, m: int) -> int:
    return -(-x // m) * m


def _edges_matmul(rmx, rmy, rw, tiles, tgx, tgy):
    """Per-tile [start, end) edges as TWO rank-1 coverage matmuls (MXU).

    Exact replica of the slot placement `(tx, ty) = (rmx + j % rw,
    rmy + j // rw), j < tiles`: full rows contribute rowcov x colcov, the
    clamped partial row contributes its own rank-1 term. ~10x cheaper than
    the T+1-point searchsorted on the sorted stream (which lowers to a
    serial while loop / gather ladder on TPU). PRECONDITION: every placed
    slot lands inside the tile grid — guaranteed by the projection's rect
    clamps (`projection._finish_cov2d`); arbitrary hand-built rects must
    use edges_mode="search"."""
    f32 = jnp.float32
    ty = jnp.arange(tgy, dtype=jnp.int32)[None, :]          # [1, tgy]
    tx = jnp.arange(tgx, dtype=jnp.int32)[None, :]          # [1, tgx]
    nfull = tiles // rw
    part = tiles - nfull * rw
    A = ((ty >= rmy[:, None]) & (ty < (rmy + nfull)[:, None]))  # [N, tgy]
    B = ((tx >= rmx[:, None]) & (tx < (rmx + rw)[:, None]))     # [N, tgx]
    Cm = (ty == (rmy + nfull)[:, None]) & (part > 0)[:, None]
    Dm = (tx >= rmx[:, None]) & (tx < (rmx + part)[:, None])
    dims = (((0,), (0,)), ((), ()))
    counts = jax.lax.dot_general(
        A.astype(jnp.bfloat16), B.astype(jnp.bfloat16), dims,
        preferred_element_type=f32,
    ) + jax.lax.dot_general(
        Cm.astype(jnp.bfloat16), Dm.astype(jnp.bfloat16), dims,
        preferred_element_type=f32,
    )                                                        # [tgy, tgx]
    counts = counts.reshape(-1).astype(jnp.int32)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]
    )


@partial(
    jax.jit,
    static_argnames=(
        "W", "H", "max_intersections", "max_tiles_per_gaussian", "chunk",
        "block", "sort_mode", "presort", "carry_prepos", "edges_mode",
        "expand_mode", "interpret",
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
    presort: bool = False,
    carry_prepos: bool = False,
    edges_mode: str = "search",
    expand_mode: str = "fill",
    interpret: bool = False,
) -> Binning:
    """Build the sorted packed intersection stream.

    Args:
      depth: [N] camera depths (0 = culled). PRECONDITION depth >= 0:
        ordering keys are the raw f32 bit patterns and the packed mark
        sentinel relies on a clear sign bit; negatives are clamped to 0
        internally (sorting first) rather than trusted.
      tiles/rect_min/rect_max: EWA tile footprints.
      channels: [N, Dc] per-gaussian values to materialize per intersection
        (uv, conic, opacity, features, abs sinks — layout documented above).
      max_intersections: static slot budget; overflow truncates (true count
        reported in `num_intersections` — log saturation, don't hide it).
      sort_mode: "packed" (fast single int32 key) | "exact" (full depth
        bits, stable — parity tests). Auto-falls back to exact when the
        tile grid exceeds the 11-bit packing budget.
      presort: allow the depth-presorted ONE-scatter pipeline (fastest,
        measured on TPU): gaussians are first sorted by full f32 depth, so
        the slot sort key is `tile_id << gbits | sorted_gid` — depth order
        per tile IS gid order — and the ragged expansion needs a single
        scatter word `(rect << gbits) | sorted_gid` (nonzero because the
        rect width field is >= 1; sentinel = 0). The returned `gid` then
        indexes depth-sorted gaussians with `perm` mapping back to the
        caller's order. Engages only when the static field widths fit
        32 bits; otherwise falls back to the two-scatter layout. Depth
        ordering is EXACT here (full f32 bits), unlike the 20-bit packed
        key (PARITY.md deviation #1).
    """
    N = depth.shape[0]
    tgx, tgy = tile_grid(W, H, block)
    T = tgx * tgy
    M = max_intersections
    Dc = channels.shape[1]

    tiles = jnp.minimum(tiles.astype(jnp.int32), max_tiles_per_gaussian)

    xb_ = max((tgx - 1).bit_length(), 1)
    yb_ = max((tgy - 1).bit_length(), 1)
    wb_ = max(min(tgx, max_tiles_per_gaussian).bit_length(), 1)
    gb_ = max((N - 1).bit_length(), 1)
    one_scatter = (
        presort
        and sort_mode == "packed"
        and xb_ + yb_ + wb_ + gb_ <= 32
        and (T << gb_) < (1 << 31)          # key + its invalid sentinel fit
    )
    if one_scatter:
        return _bin_sort_pack_presorted(
            depth, tiles, rect_min, rect_max, channels,
            tgx=tgx, tgy=tgy, M=M, chunk=chunk,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            xb=xb_, yb=yb_, wb=wb_, gbits=gb_,
            carry_prepos=carry_prepos, edges_mode=edges_mode,
            expand_mode=expand_mode, interpret=interpret,
        )

    offs = (jnp.cumsum(tiles) - tiles).astype(jnp.int32)
    total = offs[-1] + tiles[-1]

    # --- 1 + 2. ragged expansion: 1-channel start scatters + bounded scans --
    # Each *non-empty* gaussian scatters its start-slot record(s); empty
    # gaussians go to the dropped sentinel, so the owner of any slot is the
    # fill/cummax of scattered records (largest g with offs[g] <= s).
    # 1-channel scatters are the fast shape on TPU, but each still costs
    # ~0.5 ms at M = 384k in-graph, so the packed mode squeezes everything
    # the key needs into TWO scatter words (A, B) instead of three:
    #   A = db[30:23] << gbits | gaussian_id        (sentinel -1 = no mark;
    #       positive-depth IEEE bits have bit31 = 0, so marks are >= 0)
    #   B = rect_packed << 12 | db[22:11]
    # db[30:11] is exactly the 20-bit depth key the packed sort uses, so
    # this loses NO precision vs. the three-scatter layout. Falls back to
    # the generic layout when the fields don't fit ("exact" mode, huge
    # images, or > 2^gbits_max gaussians).
    s = jnp.arange(M, dtype=jnp.int32)
    rect_w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1).astype(jnp.int32)
    # depth must be > 0 for the bitcast-int key order AND for the packed
    # mark sentinel (sign bit must stay clear); force it rather than assume
    depth_bits_g = jax.lax.bitcast_convert_type(
        jnp.maximum(depth.astype(jnp.float32), 0.0), jnp.int32
    )
    row_idx = jnp.where(tiles > 0, offs, M)
    # scan/fill propagation distance is bounded by the clamped footprint
    cap = max(int(max_tiles_per_gaussian), 2)
    valid = s < total

    xb = max((tgx - 1).bit_length(), 1)   # bits for rect x / width fields
    yb = max((tgy - 1).bit_length(), 1)
    wb = max(min(tgx, max_tiles_per_gaussian).bit_length(), 1)
    gbits = max((N - 1).bit_length(), 1)
    # enforce the field-width invariant instead of assuming it: with
    # max_radius=None a caller can pass rects wider than the wb-bit budget,
    # which would silently overflow into adjacent packed fields
    rect_w = jnp.minimum(rect_w, min((1 << wb) - 1, 0x1FF))
    pre_edges = None
    if edges_mode == "matmul":
        pre_edges = _edges_matmul(
            rect_min[:, 0].astype(jnp.int32), rect_min[:, 1].astype(jnp.int32),
            rect_w, tiles, tgx, tgy,
        )
    two_scatter = (
        sort_mode == "packed"
        and T < (1 << 11)
        and gbits + 8 <= 31                 # A: db exp byte + gid, sign clear
        and xb + yb + wb + 12 <= 31         # B: rect fields + db[22:11]
    )

    if two_scatter:
        rect_packed = (
            rect_min[:, 0].astype(jnp.int32)
            | (rect_min[:, 1].astype(jnp.int32) << xb)
            | (rect_w << (xb + yb))
        )
        a_g = (
            jax.lax.shift_right_logical(depth_bits_g, 23) << gbits
        ) | jnp.arange(N, dtype=jnp.int32)
        b_g = (rect_packed << 12) | (
            jax.lax.shift_right_logical(depth_bits_g, 11) & 0xFFF
        )
        start_vals = jnp.stack(
            [
                jnp.full((M,), -1, jnp.int32).at[row_idx].set(a_g, mode="drop"),
                jnp.zeros((M,), jnp.int32).at[row_idx].set(b_g, mode="drop"),
            ]
        )
        has_mark = start_vals[0] >= 0
        slot_vals = _fill_forward(has_mark, start_vals, cap)  # [2, M] int32
        start_pos = _local_cummax(jnp.where(has_mark, s, -1), cap)
        j = s - start_pos
        g = jnp.clip(slot_vals[0] & ((1 << gbits) - 1), 0, N - 1)
        db20 = ((jax.lax.shift_right_logical(slot_vals[0], gbits) & 0xFF) << 12) | (
            slot_vals[1] & 0xFFF
        )
        rect_s = jax.lax.shift_right_logical(slot_vals[1], 12)
    else:
        rect_packed = (
            rect_min[:, 0].astype(jnp.int32)
            | (rect_min[:, 1].astype(jnp.int32) << 11)
            | (rect_w << 22)
        )
        g_scat = (
            jnp.full((M,), -1, jnp.int32)
            .at[row_idx]
            .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
        )
        has_mark = g_scat >= 0
        g = jnp.clip(_local_cummax(g_scat, cap), 0, N - 1)
        start_pos = _local_cummax(jnp.where(has_mark, s, -1), cap)
        j = s - start_pos
        start_vals = jnp.stack(
            [
                jnp.zeros((M,), jnp.int32).at[row_idx].set(v, mode="drop")
                for v in (depth_bits_g, rect_packed)
            ]
        )
        slot_vals = _fill_forward(has_mark, start_vals, cap)  # [2, M] int32
        rect_s = slot_vals[1]

    if two_scatter:
        rmx = rect_s & ((1 << xb) - 1)
        rmy = jax.lax.shift_right_logical(rect_s, xb) & ((1 << yb) - 1)
        rw = jnp.maximum(jax.lax.shift_right_logical(rect_s, xb + yb), 1)
    else:
        rmx = rect_s & 0x7FF
        rmy = (rect_s >> 11) & 0x7FF
        rw = jnp.maximum(rect_s >> 22, 1)
    tx = rmx + j % rw
    ty = rmy + j // rw
    tile_id = jnp.where(valid, ty * tgx + tx, T)

    # --- 3. (key, gid) sort + one post-sort channel gather -------------------
    inf_bits = np.float32(np.inf).view(np.int32).item()
    gid_slot = jnp.where(valid, g, -1)
    pp = (s,) if carry_prepos else ()
    if two_scatter:
        db20 = jnp.where(valid, db20, inf_bits >> 11)
        key = (tile_id << 20) | db20
        # gid as the SECOND KEY (not payload): sub-20-bit depth ties break
        # by gaussian index — the reference's stable radix-sort behavior —
        # deterministically and identically under jit and eager, without
        # the extra iota operand a stable 1-key sort would cost
        sorted_key, sorted_gid, *prepos = jax.lax.sort(
            (key, gid_slot) + pp, num_keys=2, is_stable=False
        )
        sorted_tile = jax.lax.shift_right_logical(sorted_key, 20)
    elif sort_mode == "packed" and T < (1 << 11):
        depth_bits = jnp.where(valid, slot_vals[0], inf_bits)
        key = (tile_id << 20) | jax.lax.shift_right_logical(depth_bits, 11)
        sorted_key, sorted_gid, *prepos = jax.lax.sort(
            (key, gid_slot) + pp, num_keys=2, is_stable=False
        )
        sorted_tile = jax.lax.shift_right_logical(sorted_key, 20)
    else:
        depth_bits = jnp.where(valid, slot_vals[0], inf_bits)
        sorted_tile, _, sorted_gid, *prepos = jax.lax.sort(
            (tile_id, depth_bits, gid_slot) + pp, num_keys=2, is_stable=True
        )

    pad_ok = sorted_gid >= 0
    packed, gid_out, edges, chunk_base = _pack_and_edges(
        sorted_tile, jnp.where(pad_ok, sorted_gid, -1), channels, T, chunk,
        edges=pre_edges,
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
        prepos=prepos[0] if carry_prepos else None,
    )


def _searchsorted_left(a: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Vectorized side='left' searchsorted: first i with a[i] >= q.

    jnp.searchsorted lowers to a vmapped serial while loop on TPU (~0.2 ms
    for the T+1 tile-range queries); this unrolled branchless binary search
    is log2(M) tiny gathers instead (~10x cheaper in-graph)."""
    M = a.shape[0]
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, M, jnp.int32)
    for _ in range(max(int(np.ceil(np.log2(max(M, 2)))), 1) + 1):
        mid = jax.lax.shift_right_logical(lo + hi, 1)
        v = jnp.take(a, jnp.minimum(mid, M - 1))
        right = v < q
        lo = jnp.where(right, mid + 1, lo)
        hi = jnp.where(right, hi, mid)
    return hi


def _pack_and_edges(sorted_tile, sorted_gid, channels, T, chunk, edges=None):
    """Shared tail: one channel gather, sublane/guard padding, tile ranges.

    sorted_gid: [M] int32, -1 = padding; indexes rows of `channels`.
    edges: optional precomputed [T+1] ranges (`_edges_matmul`).
    """
    Dc = channels.shape[1]
    D_target = -(-Dc // 8) * 8
    pad_ok = sorted_gid >= 0
    # the one gather, channel-major: channels pre-transposed to [Dc, N] so
    # the output [Dc, M] keeps M on the lane axis (an [M, Dc] gather would
    # pad Dc to 128 lanes and waste ~8-32x bandwidth). The sublane padding
    # to the 8-multiple, the -1-slot zeroing and the tail guard columns are
    # ALL folded into the gather itself: source column N is a zero column,
    # -1/tail gids map to it, and the source is pre-padded to D_target rows
    # (N-scale pads are ~free; a separate [D, M] pad/where costs a copy).
    src = jnp.pad(
        channels.astype(jnp.float32).T, ((0, D_target - Dc), (0, 1))
    )  # [D_target, N + 1]
    N = channels.shape[0]
    safe_gid = jnp.concatenate(
        [
            jnp.where(pad_ok, sorted_gid, N),
            jnp.full((chunk,), N, jnp.int32),
        ]
    )
    packed = jnp.take(src, safe_gid, axis=1)  # [D_target, M + chunk]
    gid_out = jnp.concatenate(
        [sorted_gid, jnp.full((chunk,), -1, jnp.int32)]
    )

    # per-tile [start, end) ranges
    if edges is None:
        edges = _searchsorted_left(
            sorted_tile, jnp.arange(T + 1, dtype=jnp.int32)
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
    return packed, gid_out, edges, chunk_base


def _bin_sort_pack_presorted(
    depth, tiles, rect_min, rect_max, channels, *,
    tgx, tgy, M, chunk, max_tiles_per_gaussian, xb, yb, wb, gbits,
    carry_prepos=False, edges_mode="search", expand_mode="fill",
    interpret=False,
):
    """Depth-presorted single-scatter binning (see `bin_sort_pack` docs).

    Gaussians are globally sorted by f32 depth bits first, so per-tile
    depth order equals sorted-gid order and the slot sort needs ONE int32
    key and NO payload. The ragged expansion scatters ONE word per
    non-empty gaussian: `(rw << (xb+yb) | rmy << xb | rmx) << gbits | sgid`
    — nonzero because rw >= 1, so 0 is the empty-slot sentinel and the
    sign bit is usable as a data bit (unpacking uses logical shifts).
    """
    N = depth.shape[0]
    T = tgx * tgy

    # ---- global depth presort (full f32 bits: EXACT per-tile order) ------
    # depth > 0 forced: a sign bit would break the bitcast-int sort order
    dk = jax.lax.bitcast_convert_type(
        jnp.maximum(depth.astype(jnp.float32), 0.0), jnp.int32
    )
    # DEAD-LAST: empty gaussians (tiles == 0) sort after every live one
    # (0x7FFFFFFF is the f32-NaN bit pattern — unreachable for finite
    # depths). The image/grads are unaffected (empties own no slots and
    # the live gaussians' relative order is preserved by the stable
    # two-key sort); what it buys is a strictly-increasing `offs` over the
    # live prefix, the window invariant `_monotone_expand_pallas` needs.
    dk = jnp.where(tiles > 0, dk, jnp.int32(0x7FFFFFFF))
    rect_w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1).astype(jnp.int32)
    rect_w = jnp.minimum(rect_w, (1 << wb) - 1)  # field-width invariant
    pre_edges = None
    if edges_mode == "matmul":  # order-independent: use the entry order
        pre_edges = _edges_matmul(
            rect_min[:, 0].astype(jnp.int32), rect_min[:, 1].astype(jnp.int32),
            rect_w, tiles, tgx, tgy,
        )
    rectword = (
        rect_min[:, 0].astype(jnp.int32)
        | (rect_min[:, 1].astype(jnp.int32) << xb)
        | (rect_w << (xb + yb))
    )
    # the original index is the SECOND KEY: equal-depth gaussians keep the
    # caller's order (the reference's stable radix-sort tie behavior) and
    # jit/eager compile to the same image even for all-equal depths
    _, perm, tiles_s, rect_s_g = jax.lax.sort(
        (dk, jnp.arange(N, dtype=jnp.int32), tiles, rectword),
        num_keys=2, is_stable=False,
    )
    # reorder channels once at N scale. Measured alternatives (memory:
    # tpu-perf-model): riding the channel columns as payloads of the sort
    # above = +0.36 ms sort for -0.18 ms gather; composing perm into the
    # M-scale pack gather de-localizes it 0.7 -> 2.8 ms. This is the cheap
    # form.
    channels_s = jax.lax.optimization_barrier(
        jnp.take(channels, jax.lax.optimization_barrier(perm), axis=0)
    )

    offs = (jnp.cumsum(tiles_s) - tiles_s).astype(jnp.int32)
    total = offs[-1] + tiles_s[-1]
    # empty gaussians get DISTINCT out-of-bounds rows so unique_indices
    # holds strictly (lets XLA skip the duplicate-safe scatter path)
    row_idx = jnp.where(
        tiles_s > 0, offs, M + jnp.arange(N, dtype=jnp.int32)
    )
    cap = max(int(max_tiles_per_gaussian), 2)
    s = jnp.arange(M, dtype=jnp.int32)
    valid = s < total

    word_g = (rect_s_g << gbits) | jnp.arange(N, dtype=jnp.int32)
    if expand_mode == "pallas":
        # ---- monotone-window expansion (Pallas; no scatter, no fill) -----
        word_f, j = _monotone_expand_pallas(
            offs, word_g, M, total, interpret=interpret
        )
    else:
        # ---- ONE scatter + bounded fill/cummax ---------------------------
        row_idx_b, word_g_b = jax.lax.optimization_barrier((row_idx, word_g))
        word = jnp.zeros((M,), jnp.int32).at[row_idx_b].set(
            word_g_b, mode="drop", unique_indices=True
        )
        word = jax.lax.optimization_barrier(word)
        has_mark = word != 0
        # one fused fill: the start position rides as a second row under
        # the SAME mask (replaces a separate _local_cummax — same bytes,
        # half the pass count)
        filled = _fill_forward(
            has_mark, jnp.stack([word, s]), cap
        )
        word_f, start_pos = filled[0], filled[1]
        j = s - start_pos

    sgid = word_f & ((1 << gbits) - 1)
    rect_s = jax.lax.shift_right_logical(word_f, gbits)
    rmx = rect_s & ((1 << xb) - 1)
    rmy = jax.lax.shift_right_logical(rect_s, xb) & ((1 << yb) - 1)
    rw = jnp.maximum(
        jax.lax.shift_right_logical(rect_s, xb + yb) & ((1 << wb) - 1), 1
    )
    tx = rmx + j % rw
    ty = rmy + j // rw
    tile_id = ty * tgx + tx

    # ---- single-operand slot sort ----------------------------------------
    key = jnp.where(valid, (tile_id << gbits) | sgid, jnp.int32(T << gbits))
    if carry_prepos:
        sorted_key, prepos = jax.lax.sort((key, s), num_keys=1, is_stable=False)
    else:
        (sorted_key,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        prepos = None
    sorted_tile = jax.lax.shift_right_logical(sorted_key, gbits)
    pad_ok = sorted_tile < T
    sorted_gid = jnp.where(pad_ok, sorted_key & ((1 << gbits) - 1), -1)

    packed, gid_out, edges, chunk_base = _pack_and_edges(
        sorted_tile, sorted_gid, channels_s, T, chunk, edges=pre_edges
    )
    return Binning(
        packed=packed,
        gid=gid_out,
        edges=edges,
        chunk_base=chunk_base,
        num_intersections=total,
        offs=offs,
        tiles=tiles_s,
        num_tiles_x=tgx,
        num_tiles_y=tgy,
        chunk=chunk,
        perm=perm,
        prepos=prepos,
    )


def grad_buffer_size(max_intersections: int, num_tiles: int, chunk: int) -> int:
    """Static size of the backward's chunk-slot grad buffer: every tile can
    waste up to two partial chunks (tail rounding + aligned-down start)."""
    return -(-(max_intersections + 2 * num_tiles * chunk) // chunk) * chunk
