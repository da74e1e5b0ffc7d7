"""Pallas TPU kernels: sorted multi-channel alpha compositing, fwd + bwd.

TPU-native re-architecture of the reference CUDA blenders
(`/root/reference/src/submodules/dptr/dptr/gs/src/alpha_blending.cu`,
`alpha_blending_enhanced.cu`). The CUDA design — one 16x16 thread block per
tile, Gaussians staged through shared memory, a scalar front-to-back loop
per pixel, atomicAdd gradient scatter — maps badly to TPU. This design:

  * grid = (tile_y, tile_x); each kernel instance owns one 16x16 pixel tile
    (256 pixels) and streams its depth-sorted slice `[edges[t], edges[t+1])`
    of the packed intersection stream (binning.py) in chunks of 128 via
    double-buffered DMA; tail-chunk lanes beyond the range are masked into
    alpha = 0 (ranges are *not* chunk aligned — that kept a whole placement
    pass out of the pipeline);
  * compositing is vectorized over (pixels=256, chunk=128): transmittance
    is a cumulative log-sum along the chunk axis computed as a matmul with
    a constant triangular matrix (MXU); feature accumulation is a
    (256x128)x(128xC) matmul (MXU) — no scalar loop anywhere;
  * the CUDA early-termination rule (stop before the Gaussian that would
    push T below 1e-4) is reproduced exactly by a monotone-prefix argument:
    `applied = valid & (cumT >= 1e-4) & ~done` equals the sequential rule
    because cumT is non-increasing;
  * backward is a *forward* re-sweep (no reverse pass): the suffix term of
    dL/dalpha is `total - prefix` with `total = sum_c g*(out - T_fin*bg)`
    known from the saved output. Per-slot gradients land at their TRUE
    slot columns of one [Dg, M+chunk] buffer: the sequential TPU grid
    lets a pending-chunk scratch accumulator merge the boundary chunks
    adjacent tiles share (disjoint lane sets) so every chunk is flushed
    exactly once; the per-Gaussian reduction inverts the slot sort (one
    int scatter of iota at the carried pre-sort positions + one gather)
    so each gaussian's grads form a contiguous run bounded by
    `max_tiles_per_gaussian`, reduced by a log2(cap)-pass segmented
    suffix-sum and extracted at `Binning.offs` — fully deterministic
    fixed-tree summation, no atomics (the reference's atomicAdd backward
    is not), ~3x cheaper than a serialized XLA scatter-add.

Gradient conventions match `alpha_blending_enhanced.cu:136-273`: the 0.99
alpha clamp is ignored in the backward (d alpha/d opacity = exp(power)),
the skip rules gate gradients, and |d uv| magnitudes accumulate into
dedicated "abs" channel rows (replacing the reference's `abs_ndc`
dummy-tensor trick, `dptr_ortho_enhanced.py:331-338`).

Per-channel generalization: the reference issues three CUDA launches per
view (RGB via `alpha_blending_enhanced`, depth with bg=1, detached-opacity
attributes with bg=0, `dptr_ortho_enhanced.py:342-376`); here one launch
blends all channels: `bg` is per-channel and `alpha_grad_mask` marks which
channels propagate into d opacity (0 = the `opacity.detach()` channels).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import binning as _binning

# SAV_PLANAR=1 opts no-grad renders into planar band-store outputs,
# skipping the XLA tiles->image untile copy (~0.28 ms at 480p). DEFAULT
# OFF: the 2026-08 Mosaic toolchain update rejects the [C,H,W] variant's
# lane-splitting shape cast (`(4,512) -> (4,16,32)`: "infer-vector-layout:
# unsupported shape cast"), and the [H,W,C] variant that passes layout
# inference pads the C=4 lane dim to 128 (41 MB scoped VMEM, 32x HBM) —
# any tiled-pixel -> planar relayout needs a lane split somewhere, which
# this toolchain does not support in-kernel. Tile-layout output + the XLA
# copy is ~4% of frame time; revisit when Mosaic grows lane-split casts.
_PLANAR_RENDER = os.environ.get("SAV_PLANAR", "0") == "1"

DEFAULT_TILE = (16, 16)  # (w, h); parity default with BLOCK_X/Y=16
# (config.h:7-10). Wider tiles (32, 16) cut program count + duplicates.
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def packed_rows(C: int, with_bias: bool = False) -> int:
    """Rows of the packed stream: uv(2) conic(3) opacity(1) features(C)
    [+ opacity_bias(1)], padded to a multiple of 8 sublanes. The abs-sink
    values are NOT packed: they are all-zero gradient sinks that no kernel
    reads (the bwd kernel only WRITES |duv| into the grad buffer's abs
    rows). Rows are padded to a multiple of 8 sublanes: Mosaic requires
    dim-0 DMA slices to be 8-aligned ("Slice shape along dimension 0 must
    be aligned to tiling (8)"), so an exact 10-row pack cannot compile —
    measured, not assumed (the CPU interpreter accepts it)."""
    return _round_up(6 + C + (1 if with_bias else 0), 8)


def grad_rows(C: int, with_bias: bool = False) -> int:
    """Rows of the bwd grad buffer: duv(2) dconic(3) dop(1) dfeat(C)
    dabs(2) [+ dbias(1)], padded to a multiple of 8 sublanes (see
    `packed_rows`)."""
    return _round_up(8 + C + (1 if with_bias else 0), 8)


def _tri_incl(K: int, dtype=jnp.float32):
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (r <= c).astype(dtype)


def _tri_excl(K: int, dtype=jnp.float32):
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (r < c).astype(dtype)


def _cumsum_lanes(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _cumsum_lanes_roll(x: jnp.ndarray, exclusive: bool, interpret: bool) -> jnp.ndarray:
    """Cumulative sum along the lane axis via log2(K) shifted adds (VPU).

    Measured 3 ms SLOWER than the triangular matmul at the 480p/100k
    shape: cross-tile lane rolls lower to multi-op shuffles in Mosaic.
    Kept as a documented measurement point; prefer "matmul" or "bf16x2".
    Summation order differs from both the matmul and the strictly
    sequential order only in float rounding.
    """
    K = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    shift = 1
    while shift < K:
        if interpret:
            rolled = jnp.roll(acc, shift, axis=1)
        else:
            rolled = pltpu.roll(acc, shift, axis=1)
        acc = acc + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    if exclusive:
        acc = acc - x
    return acc


def _cumsum_lanes_split(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Triangular-matmul scan with the f32 operand split into hi+lo bf16.

    The MXU runs bf16 x bf16 -> f32 at full rate while f32 x f32 needs a
    multi-pass decomposition; the 0/1 triangular matrix is exact in bf16,
    so x @ tri == bf16(x) @ tri + bf16(x - bf16(x)) @ tri up to ~2^-18
    relative error — two full-rate passes instead of the f32 path.
    """
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    tb = tri.astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        hi, tb, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(lo, tb, dims, preferred_element_type=jnp.float32)


def _scan_lanes(x, tri, scan_impl: str, interpret: bool, exclusive: bool):
    """Dispatch the in-kernel lane scan implementation."""
    if scan_impl == "roll":
        return _cumsum_lanes_roll(x, exclusive, interpret)
    if scan_impl == "bf16x2":
        return _cumsum_lanes_split(x, tri)
    return _cumsum_lanes(x, tri)


_LOG2E = 1.4426950408889634  # the TPU VPU exponentiates in base 2; folding
_LN2 = 0.6931471805599453    # log2(e)/ln(2) into existing multiplies keeps
#                              exp2/log2 single-op (exp/log each hide a mul)


def _chunk_alpha(data, px_x, px_y, lane_ok, bias_row: Optional[int] = None):
    """Shared fwd/bwd screen-space math for one [D, K] chunk.

    `gexp` is exp(power) with power = -0.5(a vx^2 + c vy^2) - b vx vy,
    computed as exp2 of the base-2-scaled quadratic (same value; the
    log2(e) factor folds into the -0.5 constant instead of costing a
    separate multiply inside exp). With `bias_row`, alpha gains the
    per-gaussian opacity bias: alpha = min(0.99, op*G + bias)
    (`alpha_blending_with_bias.cu:89,213`).
    """
    uvx = data[0:1, :]
    uvy = data[1:2, :]
    ca = data[2:3, :]
    cb = data[3:4, :]
    cc = data[4:5, :]
    op = data[5:6, :]
    # the lane-validity mask folds into opacity at (1, chunk) scale (~free:
    # 128 lanes vs the (PIX, chunk) broadcasts), replacing a broadcast
    # `& lane_ok` in the mask chain. The quadratic keeps ITS EXACT original
    # association: reassociating it (Horner with pre-scaled conics) is
    # bit-different per lane and measurably shifts converged e2e tracking
    # metrics (AJ 48.4 -> 39.9 on the synthetic harness) for ~0.02 ms.
    opm = jnp.where(lane_ok, op, 0.0)
    vx = uvx - px_x
    vy = uvy - px_y
    power2 = (-0.5 * _LOG2E) * (ca * vx * vx + cc * vy * vy) - (
        (_LOG2E * cb) * vx
    ) * vy
    # power > 0 lanes are culled (ewa_project.cu's `power > 0` skip): a
    # -126 exponent sentinel makes their alpha ~1e-38 < ALPHA_MIN, so the
    # threshold test below masks them without a separate condition chain
    # (an inf gexp would poison masked gradients with inf * 0 = nan)
    culled = power2 > 0.0
    gexp = jnp.exp2(jnp.where(culled, -126.0, power2))
    raw = opm * gexp
    if bias_row is not None:
        raw = raw + jnp.where(lane_ok, data[bias_row : bias_row + 1, :], 0.0)
    alpha = jnp.minimum(ALPHA_MAX, raw)
    if bias_row is not None:
        # with a bias the culled sentinel no longer implies alpha < MIN
        keep = (alpha >= ALPHA_MIN) & jnp.logical_not(culled)
    else:
        keep = alpha >= ALPHA_MIN
    alpha_eff = jnp.where(keep, alpha, 0.0)
    return alpha_eff, gexp, vx, vy, ca, cb, cc, op


def _pixel_coords(tgx: int, tw: int, th: int):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    p = jax.lax.broadcasted_iota(jnp.int32, (tw * th, 1), 0)
    px_x = (tx * tw + p % tw).astype(jnp.float32)
    px_y = (ty * th + p // tw).astype(jnp.float32)
    return ty, tx, px_x, px_y


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(
    edges_ref,          # scalar prefetch [T+1]
    packed_hbm,
    ids_hbm,            # None unless K_idx
    out_ref,
    finalT_ref,
    ncontrib_ref,
    gsidx_ref,          # None unless K_idx
    buf,
    sem,
    ibuf,
    isem,
    st,
    acc,
    *,
    C: int,
    D: int,
    chunk: int,
    tgx: int,
    tw: int,
    th: int,
    bg: Tuple[float, ...],
    K_idx: int,
    scan_impl: str,
    interpret: bool,
    with_bias: bool = False,
    planar: bool = False,
):
    PIX = tw * th
    ty, tx, px_x, px_y = _pixel_coords(tgx, tw, th)
    t = ty * tgx + tx
    start = edges_ref[t]
    end = edges_ref[t + 1]
    # DMA slices must be lane-tile aligned for Mosaic: walk chunks from the
    # aligned-down start and mask the leading out-of-range lanes too
    astart = (start // chunk) * chunk
    n = pl.cdiv(end - astart, chunk)
    n = jnp.where(end > start, n, 0)
    tri = _tri_excl(chunk)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    st[:] = jnp.concatenate(
        [jnp.ones((PIX, 1), jnp.float32), jnp.zeros((PIX, 2), jnp.float32)],
        axis=1,
    )
    acc[:] = jnp.zeros((PIX, C), jnp.float32)
    if K_idx:
        gsidx_ref[:] = jnp.full((1, PIX, K_idx), -1, jnp.int32)

    def dma(slot, ci):
        off = pl.multiple_of(astart + ci * chunk, chunk)
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(off, chunk)],
            buf.at[slot],
            sem.at[slot],
        )

    def idma(slot, ci):
        off = pl.multiple_of(astart + ci * chunk, chunk)
        return pltpu.make_async_copy(
            ids_hbm.at[:, pl.ds(off, chunk)],
            ibuf.at[slot],
            isem.at[slot],
        )

    @pl.when(n > 0)
    def _():
        dma(0, 0).start()
        if K_idx:
            idma(0, 0).start()

    def cond(carry):
        i, go = carry
        return go

    def body(carry):
        i, go = carry
        slot = jax.lax.rem(i, 2)
        dma(slot, i).wait()
        if K_idx:
            idma(slot, i).wait()

        @pl.when(i + 1 < n)
        def _():
            nslot = jax.lax.rem(i + 1, 2)
            dma(nslot, i + 1).start()
            if K_idx:
                idma(nslot, i + 1).start()

        T = st[:, 0:1]
        done = st[:, 1:2] > 0.0
        cnt = st[:, 2:3]

        data = buf[slot]
        gpos = astart + i * chunk + lane
        lane_ok = (gpos >= start) & (gpos < end)
        alpha_eff, *_ = _chunk_alpha(
            data, px_x, px_y, lane_ok,
            bias_row=(6 + C) if with_bias else None,
        )
        one_m = 1.0 - alpha_eff
        log1m = jnp.log2(one_m)  # base-2 scan: exp2/log2 are the native ops
        # EXCLUSIVE transmittance prefix: w = alpha * T_before needs no
        # divide; the inclusive value (for the termination rule) is one mul
        cs = _scan_lanes(log1m, tri, scan_impl, interpret, True)
        cumT_ex = T * jnp.exp2(cs)
        cumT = cumT_ex * one_m
        applied = (alpha_eff > 0.0) & (cumT >= T_EPS) & jnp.logical_not(done)
        w = jnp.where(applied, alpha_eff * cumT_ex, 0.0)

        feats = data[6 : 6 + C, :]
        acc[:] = acc[:] + jax.lax.dot_general(
            w, feats, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        if K_idx:
            ids = ibuf[slot]
            rank = cnt + _scan_lanes(
                applied.astype(jnp.float32), _tri_excl(chunk),
                scan_impl, interpret, True)
            ranki = rank.astype(jnp.int32)
            for sl in range(K_idx):
                sel = applied & (ranki == sl)
                has = jnp.any(sel, axis=1, keepdims=True)
                val = jnp.max(jnp.where(sel, ids, -1), axis=1, keepdims=True)
                col = gsidx_ref[0, :, sl : sl + 1]
                gsidx_ref[0, :, sl : sl + 1] = jnp.where(has, val, col)

        T_new = jnp.min(jnp.where(applied, cumT, T), axis=1, keepdims=True)
        term = jnp.any((alpha_eff > 0.0) & (cumT < T_EPS), axis=1, keepdims=True)
        done_new = jnp.where(term, 1.0, st[:, 1:2])
        cnt_new = cnt + jnp.sum(applied.astype(jnp.float32), axis=1, keepdims=True)
        st[:] = jnp.concatenate([T_new, done_new, cnt_new], axis=1)

        all_done = jnp.all(done_new > 0.0)
        return (i + 1, (i + 1 < n) & jnp.logical_not(all_done))

    i_f, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), n > 0))

    @pl.when(i_f < n)
    def _():
        dma(jax.lax.rem(i_f, 2), i_f).wait()
        if K_idx:
            idma(jax.lax.rem(i_f, 2), i_f).wait()

    T = st[:, 0:1]
    out_cols = [acc[:, i : i + 1] + T * bg[i] for i in range(C)]
    if planar:
        # direct [H', W', C] output: this tile owns the W-slice
        # [tx*tw, (tx+1)*tw) of its row band; the band block is VMEM-
        # resident across the inner (tx) grid axis and written back to
        # HBM once per row, which removes the tiles->image transpose
        # copy XLA otherwise emits after the kernel (0.28 ms at 480p) —
        # and the result is already in the [H, W, C] API layout, so no
        # logical transpose either. The (PIX, C) -> (th, tw, C) reshape
        # splits only the SUBLANE dim (lane dim C unchanged), which
        # Mosaic supports where the earlier (C, PIX) -> (C, th, tw)
        # lane-splitting shape cast (2026-08 toolchain) does not.
        sl = pl.ds(tx * tw, tw)
        outp = jnp.concatenate(out_cols, axis=1)       # (PIX, C)
        out_ref[:, sl, :] = outp.reshape(th, tw, C)
        finalT_ref[:, sl, :] = T.reshape(th, tw, 1)
        ncontrib_ref[:, sl, :] = st[:, 2:3].astype(jnp.int32).reshape(th, tw, 1)
    else:
        out_ref[:] = jnp.concatenate(out_cols, axis=1).reshape(1, PIX, C)
        finalT_ref[:] = T.reshape(1, PIX, 1)
        ncontrib_ref[:] = st[:, 2:3].astype(jnp.int32).reshape(1, PIX, 1)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------


def _bwd_kernel(
    edges_ref,
    packed_hbm,
    g_ref,
    outimg_ref,
    finalT_ref,
    dgrad_hbm,          # [Dg, M + chunk] per-SLOT gradients (true positions)
    buf,
    sem,
    obuf,
    osem,
    st,
    pend,               # SMEM [4]: pending chunk idx, slot, in-flight flags.
    #                     Grid steps run SEQUENTIALLY on the TPU core and
    #                     scratch persists across them, so a single pending
    #                     [Dg, chunk] accumulator merges the boundary chunks
    #                     that adjacent tiles share (their lane sets are
    #                     disjoint) and each chunk is flushed to its TRUE
    #                     column exactly once — no per-tile chunk-aligned
    #                     padding, no separate per-column gid output (the
    #                     slot gid is just Binning.gid).
    *,
    C: int,
    D: int,
    Dg: int,
    chunk: int,
    tgx: int,
    tw: int,
    th: int,
    bg: Tuple[float, ...],
    alpha_grad_mask: Tuple[float, ...],
    scan_impl: str,
    interpret: bool,
    with_bias: bool = False,
):
    PIX = tw * th
    ty, tx, px_x, px_y = _pixel_coords(tgx, tw, th)
    t = ty * tgx + tx
    start = edges_ref[t]
    end = edges_ref[t + 1]
    astart = (start // chunk) * chunk
    n = pl.cdiv(end - astart, chunk)
    n = jnp.where(end > start, n, 0)
    tri = _tri_excl(chunk)       # exclusive: per-lane transmittance prefix
    tri_in = _tri_incl(chunk)    # inclusive: dL/dalpha suffix accumulators
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    @pl.when(t == 0)
    def _():
        pend[0] = -1             # no pending chunk yet
        pend[1] = 0              # current accumulator slot
        pend[2] = 0              # slot 0 flush in flight
        pend[3] = 0              # slot 1 flush in flight

    g = g_ref[:].reshape(PIX, C)
    gm = jnp.concatenate(
        [g[:, i : i + 1] * alpha_grad_mask[i] for i in range(C)], axis=1
    )
    out = outimg_ref[:].reshape(PIX, C)
    Tfin = finalT_ref[:].reshape(PIX, 1)

    def _col_dot(x, coeffs):
        acc_ = None
        for i in range(C):
            term = x[:, i : i + 1] * coeffs[i]
            acc_ = term if acc_ is None else acc_ + term
        return acc_

    B_all = _col_dot(g, bg)
    B_op = _col_dot(gm, bg)
    tot_all = jnp.sum(g * out, axis=1, keepdims=True) - Tfin * B_all
    tot_op = jnp.sum(gm * out, axis=1, keepdims=True) - Tfin * B_op

    st[:] = jnp.concatenate(
        [jnp.ones((PIX, 1), jnp.float32), jnp.zeros((PIX, 3), jnp.float32)],
        axis=1,
    )

    def dma_in(slot, ci):
        off = pl.multiple_of(astart + ci * chunk, chunk)
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds(off, chunk)],
            buf.at[slot],
            sem.at[slot],
        )

    def flush(slot, col):
        # col is only an address: waits reconstruct the descriptor with
        # col 0 — Mosaic waits on (semaphore, byte count), not the address
        return pltpu.make_async_copy(
            obuf.at[slot],
            dgrad_hbm.at[:, pl.ds(pl.multiple_of(col * chunk, chunk), chunk)],
            osem.at[slot],
        )

    def emit_grad(grad, gc):
        """Accumulate one [Dg, chunk] lane-masked grad block for global
        chunk column gc. Tiles walk non-decreasing gc; equal gc across
        (possibly several tiny) tiles touches disjoint lanes -> add."""
        pi = pend[0]

        @pl.when(gc == pi)
        def _():
            cur = pend[1]
            obuf[cur] = obuf[cur] + grad

        @pl.when(gc != pi)
        def _():
            cur = pend[1]

            @pl.when(pi >= 0)
            def _():
                flush(cur, pi).start()
                pend[2 + cur] = 1

            new = 1 - cur

            @pl.when(pend[2 + new] == 1)
            def _():
                flush(new, 0).wait()
                pend[2 + new] = 0

            obuf[new] = grad
            pend[0] = gc
            pend[1] = new

    @pl.when(n > 0)
    def _():
        dma_in(0, 0).start()

    def body(i, carry):
        slot = jax.lax.rem(i, 2)
        dma_in(slot, i).wait()

        @pl.when(i + 1 < n)
        def _():
            dma_in(jax.lax.rem(i + 1, 2), i + 1).start()

        T = st[:, 0:1]
        done = st[:, 1:2] > 0.0
        pre_all = st[:, 2:3]
        pre_op = st[:, 3:4]

        data = buf[slot]
        gpos = astart + i * chunk + lane
        lane_ok = (gpos >= start) & (gpos < end)
        alpha_eff, gexp, vx, vy, ca, cb_, cc, op = _chunk_alpha(
            data, px_x, px_y, lane_ok,
            bias_row=(6 + C) if with_bias else None,
        )
        one_m = 1.0 - alpha_eff
        log1m = jnp.log2(one_m)
        cs = _scan_lanes(log1m, tri, scan_impl, interpret, True)
        T_excl = T * jnp.exp2(cs)
        cumT = T_excl * one_m
        applied = (alpha_eff > 0.0) & (cumT >= T_EPS) & jnp.logical_not(done)
        w = jnp.where(applied, alpha_eff * T_excl, 0.0)
        appf = applied.astype(jnp.float32)

        feats = data[6 : 6 + C, :]
        G_all = jax.lax.dot_general(
            g, feats, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        G_op = jax.lax.dot_general(
            gm, feats, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        u_all = G_all * w
        u_op = G_op * w
        pref_all = pre_all + _scan_lanes(u_all, tri_in, scan_impl, interpret, False)
        pref_op = pre_op + _scan_lanes(u_op, tri_in, scan_impl, interpret, False)
        suf_all = tot_all - pref_all
        suf_op = tot_op - pref_op

        dalpha_all = (G_all * T_excl - (suf_all + Tfin * B_all) / one_m) * appf
        dalpha_op = (G_op * T_excl - (suf_op + Tfin * B_op) / one_m) * appf

        # CUDA convention: clamp ignored => dalpha/dop = gexp,
        # dalpha/dpower = op * gexp (alpha_blending_enhanced.cu:254-270)
        dop_pk = gexp * dalpha_op
        dpow = op * gexp * dalpha_all
        duvx_pk = dpow * (-(ca * vx + cb_ * vy))
        duvy_pk = dpow * (-(cc * vy + cb_ * vx))

        duvx = jnp.sum(duvx_pk, axis=0, keepdims=True)
        duvy = jnp.sum(duvy_pk, axis=0, keepdims=True)
        dabsx = jnp.sum(jnp.abs(duvx_pk), axis=0, keepdims=True)
        dabsy = jnp.sum(jnp.abs(duvy_pk), axis=0, keepdims=True)
        dca = jnp.sum(dpow * (-0.5 * vx * vx), axis=0, keepdims=True)
        dcb = jnp.sum(dpow * (-vx * vy), axis=0, keepdims=True)
        dcc = jnp.sum(dpow * (-0.5 * vy * vy), axis=0, keepdims=True)
        dop = jnp.sum(dop_pk, axis=0, keepdims=True)
        dfeat = jax.lax.dot_general(
            g, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        rows = [duvx, duvy, dca, dcb, dcc, dop, dfeat, dabsx, dabsy]
        used = 8 + C
        if with_bias:
            # d alpha / d bias = 1 (alpha = op*G + bias, clamp ignored as
            # for dop): dbias accumulates dL/dalpha directly
            # (`alpha_blending_with_bias.cu:259`)
            rows.append(jnp.sum(dalpha_op, axis=0, keepdims=True))
            used += 1
        grad = jnp.concatenate(rows, axis=0)
        if Dg > used:
            grad = jnp.concatenate(
                [grad, jnp.zeros((Dg - used, chunk), jnp.float32)], axis=0
            )
        emit_grad(grad, astart // chunk + i)

        T_new = jnp.min(jnp.where(applied, cumT, T), axis=1, keepdims=True)
        term = jnp.any((alpha_eff > 0.0) & (cumT < T_EPS), axis=1, keepdims=True)
        done_new = jnp.where(term, 1.0, st[:, 1:2])
        st[:] = jnp.concatenate(
            [T_new, done_new, pref_all[:, -1:], pref_op[:, -1:]], axis=1
        )
        return carry

    jax.lax.fori_loop(0, n, body, 0)

    last = (pl.program_id(0) == pl.num_programs(0) - 1) & (
        pl.program_id(1) == pl.num_programs(1) - 1
    )

    @pl.when(last)
    def _():
        pi = pend[0]

        @pl.when(pi >= 0)
        def _():
            flush(pend[1], pi).start()
            pend[2 + pend[1]] = 1

        for s in (0, 1):

            @pl.when(pend[2 + s] == 1)
            def _():
                flush(s, 0).wait()


# --------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp over the full bin+blend pipeline
# --------------------------------------------------------------------------


def _fwd_kernel_entry(edges_ref, *rest, C, D, chunk, tgx, tw, th, bg, K_idx,
                      scan_impl, interpret, with_bias=False, planar=False):
    if K_idx:
        (packed_hbm, ids_hbm, out_ref, finalT_ref, ncontrib_ref, gsidx_ref,
         buf, sem, ibuf, isem, st, acc) = rest
    else:
        (packed_hbm, out_ref, finalT_ref, ncontrib_ref,
         buf, sem, ibuf, isem, st, acc) = rest
        ids_hbm = None
        gsidx_ref = None
    _fwd_kernel(
        edges_ref, packed_hbm, ids_hbm, out_ref, finalT_ref, ncontrib_ref,
        gsidx_ref, buf, sem, ibuf, isem, st, acc,
        C=C, D=D, chunk=chunk, tgx=tgx, tw=tw, th=th, bg=bg, K_idx=K_idx,
        scan_impl=scan_impl, interpret=interpret, with_bias=with_bias,
        planar=planar,
    )


@functools.lru_cache(maxsize=None)
def _build_splat(
    C: int,
    W: int,
    H: int,
    bg: Tuple[float, ...],
    alpha_grad_mask: Tuple[float, ...],
    K_idx: int,
    chunk: int,
    max_intersections: int,
    max_tiles_per_gaussian: int,
    sort_mode: str,
    tile_wh: Tuple[int, int],
    interpret: bool,
    scan_impl: str = "matmul",
    with_bias: bool = False,
    edges_mode: str = "search",
    expand_mode: str = "fill",
):
    """Construct the custom-vjp splat over (uv, conic, opacity, features,
    abs_sink) for one static configuration. Binning runs inside the fwd;
    the bwd reduces per-slot kernel gradients to per-Gaussian cotangents
    with a sort + running-sum (deterministic, scatter-free). with_bias
    adds a per-gaussian opacity-bias operand: alpha = min(.99, op*G + b)
    (`alpha_blending_with_bias.cu`), with its own gradient row."""
    D = packed_rows(C, with_bias)
    Dg = grad_rows(C, with_bias)
    tw, th = tile_wh
    PIX = tw * th
    tgx = -(-W // tw)
    tgy = -(-H // th)
    T_tiles = tgy * tgx
    grid = (tgy, tgx)

    def tiles_to_img(x):
        c = x.shape[-1]
        x = x.reshape(tgy, tgx, th, tw, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(tgy * th, tgx * tw, c)
        return x[:H, :W]

    def img_to_tiles(x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, tgy * th - H), (0, tgx * tw - W), (0, 0)))
        x = x.reshape(tgy, th, tgx, tw, c).transpose(0, 2, 1, 3, 4)
        return x.reshape(T_tiles, PIX, c)

    tile_block = lambda c: pl.BlockSpec(
        (1, PIX, c), lambda i, j, *_: (i * tgx + j, 0, 0)
    )

    def run_binning(uv, conic, opacity, features, abs_sink, depth, tiles,
                    rect_min, rect_max, carry_prepos=False, bias=None):
        # abs_sink values are NOT packed: they are all-zero gradient sinks
        # no kernel reads (their grads come from the bwd buffer's abs rows)
        cols = [uv, conic, opacity[:, None], features]
        if bias is not None:
            cols.append(bias[:, None])
        channels = jnp.concatenate(cols, axis=1)
        # presort is off for K_idx renders: gs_idx must report ORIGINAL
        # gaussian ids, and remapping a [H,W,K] id image through perm would
        # cost more than the two-scatter layout saves. carry_prepos rides
        # the slot sort only when the backward will run (splat_fwd): the
        # grad reduction needs each slot's pre-sort position
        return _binning.bin_sort_pack(
            depth, tiles, rect_min, rect_max, channels, W, H,
            max_intersections=max_intersections,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            chunk=chunk, block=tile_wh, sort_mode=sort_mode,
            presort=(K_idx == 0), carry_prepos=carry_prepos,
            # rects from the projection are grid-clamped, so the exact
            # MXU coverage-matmul edges are valid whenever requested
            # (binning._edges_matmul); the caller picks the mode per path
            edges_mode=edges_mode,
            expand_mode=expand_mode, interpret=interpret,
        )

    def fwd_pallas(b: _binning.Binning, planar: bool = False):
        # planar=True (no-grad render path, K_idx == 0 only): the kernel
        # writes [C, Hpad, Wpad] row-band blocks directly (each band is
        # VMEM-resident across the inner grid axis), so the tiles->image
        # transpose copy disappears. The vjp path keeps the tile layout:
        # its backward consumes tile-layout residuals.
        planar = planar and not K_idx
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        inputs = [b.packed]
        if K_idx:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            inputs.append(b.gid.reshape(1, -1))
        if planar:
            Wb = tgx * tw
            band = lambda c: pl.BlockSpec(
                (th, Wb, c), lambda i, j, *_: (i, 0, 0)
            )
            out_shape = [
                jax.ShapeDtypeStruct((tgy * th, Wb, C), jnp.float32),
                jax.ShapeDtypeStruct((tgy * th, Wb, 1), jnp.float32),
                jax.ShapeDtypeStruct((tgy * th, Wb, 1), jnp.int32),
            ]
            out_specs = [band(C), band(1), band(1)]
        else:
            out_shape = [
                jax.ShapeDtypeStruct((T_tiles, PIX, C), jnp.float32),
                jax.ShapeDtypeStruct((T_tiles, PIX, 1), jnp.float32),
                jax.ShapeDtypeStruct((T_tiles, PIX, 1), jnp.int32),
            ]
            out_specs = [tile_block(C), tile_block(1), tile_block(1)]
        if K_idx:
            out_shape.append(jax.ShapeDtypeStruct((T_tiles, PIX, K_idx), jnp.int32))
            out_specs.append(tile_block(K_idx))

        kernel = functools.partial(
            _fwd_kernel_entry, C=C, D=D, chunk=chunk, tgx=tgx, tw=tw, th=th,
            bg=bg, K_idx=K_idx, scan_impl=scan_impl, interpret=interpret,
            with_bias=with_bias, planar=planar,
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=[
                    pltpu.VMEM((2, D, chunk), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((2, 1, chunk), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((PIX, 3), jnp.float32),
                    pltpu.VMEM((PIX, C), jnp.float32),
                ],
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(b.edges, *inputs)
        if planar:
            # already in the [H, W, C] API layout — just crop the pad
            out = outs[0][:H, :W, :]
            finalT = outs[1][:H, :W, 0]
            ncontrib = outs[2][:H, :W, 0]
            return out, finalT, ncontrib, None, outs[0], outs[1]
        out = tiles_to_img(outs[0])
        finalT = tiles_to_img(outs[1])[..., 0]
        ncontrib = tiles_to_img(outs[2])[..., 0]
        gs_idx = tiles_to_img(outs[3]) if K_idx else None
        # outs[0]/outs[1] returned raw too: the bwd consumes the TILE
        # layout, so saving them as residuals skips two image->tile
        # transpose copies per backward
        return out, finalT, ncontrib, gs_idx, outs[0], outs[1]

    def bwd_pallas(b: _binning.Binning, out_t, finalT_t, g):
        g = img_to_tiles(g)
        kernel = functools.partial(
            _bwd_kernel, C=C, D=D, Dg=Dg, chunk=chunk, tgx=tgx, tw=tw, th=th, bg=bg,
            alpha_grad_mask=alpha_grad_mask, scan_impl=scan_impl,
            interpret=interpret, with_bias=with_bias,
        )
        dgrad = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    tile_block(C),
                    tile_block(C),
                    tile_block(1),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, D, chunk), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((2, Dg, chunk), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((PIX, 4), jnp.float32),
                    pltpu.SMEM((4,), jnp.int32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((Dg, max_intersections + chunk), jnp.float32),
            ],
            interpret=interpret,
        )(b.edges, b.packed, g, out_t, finalT_t)
        return dgrad[0]

    def reduce_to_gaussians(dgrad, b, N):
        """Per-gaussian reduction of the per-slot gradient columns.

        Instead of a row-scatter-add keyed by gid (XLA TPU scatters
        serialize: 7.0 ms at 524k columns; memory: tpu-perf-model), invert
        the slot sort with ONE int scatter of iota at `Binning.prepos` and
        gather the grad columns back into PRE-SORT order — where each
        gaussian's slots form one contiguous run of at most
        `max_tiles_per_gaussian` columns. A log2(cap)-pass segmented
        suffix-sum (Hillis-Steele over the bounded runs, the same trick as
        binning's `_fill_forward`) then puts each gaussian's total at its
        run start, and extraction is a plain gather at `Binning.offs`.
        Fully deterministic (fixed tree summation order; the reference's
        atomicAdd backward is not). Garbage columns at/after the true
        intersection count carry gid -1, which never equals a valid gid,
        so they cannot contaminate any run.
        """
        nrows = 8 + C + (1 if with_bias else 0)
        M = max_intersections
        iota = jnp.arange(M, dtype=jnp.int32)
        inv = jnp.zeros((M,), jnp.int32).at[b.prepos].set(iota)
        # gid rides the f32 gather as an integer-VALUED float (+2 keeps the
        # -1 padding positive), NOT a bitcast: small-int bit patterns are
        # f32 denormals/NaNs that TPU fusions mangle in transport (measured:
        # ALL 524k ids corrupted, reduction error 5.1; exact as values)
        gid_f = (b.gid[:M] + 2).astype(jnp.float32)
        src = jnp.concatenate([dgrad[:nrows, :M], gid_f[None, :]], axis=0)
        x = jnp.take(src, inv, axis=1)                 # [nrows+1, M] pre-sort
        gidp = x[nrows].astype(jnp.int32)              # gid + 2 (shift-safe
        x = x[:nrows]                                  #  for == comparisons)
        cap = max(int(max_tiles_per_gaussian), 2)
        shift = 1
        while shift < cap:
            xs = jnp.concatenate(
                [x[:, shift:], jnp.zeros((nrows, shift), jnp.float32)], axis=1
            )
            gs = jnp.concatenate(
                [gidp[shift:], jnp.full((shift,), -2, jnp.int32)]
            )
            x = x + jnp.where((gs == gidp)[None, :], xs, 0.0)
            shift *= 2
        safe_off = jnp.clip(b.offs, 0, M - 1)
        per_g = jnp.take(x, safe_off, axis=1)          # [nrows, N]
        per_g = jnp.where((b.tiles > 0)[None, :], per_g, 0.0)
        seg = per_g.T                                  # [N, nrows]
        if b.perm is not None:
            # presorted binning: row s of seg belongs to gaussian perm[s];
            # one disjoint row scatter restores the caller's order
            seg = jnp.zeros_like(seg).at[b.perm].set(seg)
        duv = seg[:, 0:2]
        dconic = seg[:, 2:5]
        dop = seg[:, 5]
        dfeat = seg[:, 6 : 6 + C]
        dabs = seg[:, 6 + C : 8 + C]
        if with_bias:
            return duv, dconic, dop, dfeat, dabs, seg[:, 8 + C]
        return duv, dconic, dop, dfeat, dabs

    zi = lambda shape: np.zeros(shape, jax.dtypes.float0)

    if with_bias:

        @jax.custom_vjp
        def splat_b(uv, conic, opacity, features, abs_sink, depth, tiles,
                    rect_min, rect_max, bias):
            b = run_binning(uv, conic, opacity, features, abs_sink, depth,
                            tiles, rect_min, rect_max, bias=bias)
            out, finalT, ncontrib, gs_idx, _, _ = fwd_pallas(b, planar=_PLANAR_RENDER)
            return out, finalT, ncontrib, gs_idx, b.num_intersections

        def splat_b_fwd(uv, conic, opacity, features, abs_sink, depth, tiles,
                        rect_min, rect_max, bias):
            b = run_binning(uv, conic, opacity, features, abs_sink, depth,
                            tiles, rect_min, rect_max, carry_prepos=True,
                            bias=bias)
            out, finalT, ncontrib, gs_idx, out_t, finalT_t = fwd_pallas(b)
            res = (b, out_t, finalT_t, uv.shape[0])
            return (out, finalT, ncontrib, gs_idx, b.num_intersections), res

        def splat_b_bwd(res, cts):
            b, out_t, finalT_t, N = res
            dgrad = bwd_pallas(b, out_t, finalT_t, cts[0])
            duv, dconic, dop, dfeat, dabs, dbias = reduce_to_gaussians(
                dgrad, b, N
            )
            return (
                duv, dconic, dop, dfeat, dabs,
                jnp.zeros((N,), jnp.float32), zi((N,)),
                zi((N, 2)), zi((N, 2)), dbias,
            )

        splat_b.defvjp(splat_b_fwd, splat_b_bwd)
        return splat_b

    @jax.custom_vjp
    def splat(uv, conic, opacity, features, abs_sink, depth, tiles,
              rect_min, rect_max):
        b = run_binning(uv, conic, opacity, features, abs_sink, depth, tiles,
                        rect_min, rect_max)
        out, finalT, ncontrib, gs_idx, _, _ = fwd_pallas(b, planar=_PLANAR_RENDER)
        return out, finalT, ncontrib, gs_idx, b.num_intersections

    def splat_fwd(uv, conic, opacity, features, abs_sink, depth, tiles,
                  rect_min, rect_max):
        b = run_binning(uv, conic, opacity, features, abs_sink, depth, tiles,
                        rect_min, rect_max, carry_prepos=True)
        out, finalT, ncontrib, gs_idx, out_t, finalT_t = fwd_pallas(b)
        N = uv.shape[0]
        res = (b, out_t, finalT_t, N)
        return (out, finalT, ncontrib, gs_idx, b.num_intersections), res

    def splat_bwd(res, cts):
        b, out_t, finalT_t, N = res
        gimg = cts[0]
        dgrad = bwd_pallas(b, out_t, finalT_t, gimg)
        duv, dconic, dop, dfeat, dabs = reduce_to_gaussians(dgrad, b, N)
        return (
            duv,
            dconic,
            dop,
            dfeat,
            dabs,
            jnp.zeros((N,), jnp.float32),      # depth (sort key: stop-grad)
            zi((N,)),                          # tiles (int)
            zi((N, 2)),                        # rect_min
            zi((N, 2)),                        # rect_max
        )

    splat.defvjp(splat_fwd, splat_bwd)
    return splat


def splat_scene(
    uv: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    features: jnp.ndarray,
    abs_sink: jnp.ndarray,
    depth: jnp.ndarray,
    tiles: jnp.ndarray,
    rect_min: jnp.ndarray,
    rect_max: jnp.ndarray,
    *,
    C: int,
    W: int,
    H: int,
    bg: Tuple[float, ...],
    alpha_grad_mask: Optional[Tuple[float, ...]] = None,
    K_idx: int = 0,
    chunk: int = 128,
    max_intersections: int = 1 << 19,
    max_tiles_per_gaussian: int = 64,
    sort_mode: str = "packed",
    block: Tuple[int, int] = DEFAULT_TILE,
    interpret: Optional[bool] = None,
    scan_impl: str = "matmul",
    opacity_bias: Optional[jnp.ndarray] = None,
    edges_mode: str = "search",
    expand_mode: str = "auto",
):
    """Differentiable bin+sort+blend of pre-projected Gaussians.

    Returns (image [H,W,C], final_T, ncontrib, gs_idx|None, num_intersections).
    `bg` is per-channel; `alpha_grad_mask` marks channels whose gradient
    reaches opacity (0 = the reference's `opacity.detach()` channels).
    `opacity_bias` [N] engages the `alpha_blending_with_bias` variant:
    alpha = min(.99, op*G + bias), with a dL/dbias cotangent.

    CALLER CONTRACT: rects must respect `max_tiles_per_gaussian` — clamp the
    EWA radius with `projection.max_radius_for_tile_cap` (as
    `rasterize.render_gaussians` does) BEFORE calling. Oversized rects are
    silently truncated to the first `max_tiles_per_gaussian` tiles in
    row-major order, which renders only a band of the footprint. Budget
    overflow is reported (not hidden) via `num_intersections >
    max_intersections`.
    """
    if alpha_grad_mask is None:
        alpha_grad_mask = (1.0,) * C
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if expand_mode == "auto":
        # MEASURED 2026-08-19 (854x480/100k, 345k slots, v5e): the
        # monotone-window Pallas kernel is bit-identical but 7.14 -> 22.85
        # ms/frame SLOWER than the scatter+fill — its per-slot-offset lane
        # reductions are the wrong shape for the VPU (the fix would be a
        # merge-path formulation; the windows/A-matrix groundwork is in
        # binning._monotone_expand_pallas). Keep the XLA path the default;
        # "pallas" stays available and parity-tested.
        expand_mode = "fill"
    fn = _build_splat(
        C, W, H, tuple(float(x) for x in bg),
        tuple(float(x) for x in alpha_grad_mask), K_idx, chunk,
        max_intersections, max_tiles_per_gaussian, sort_mode,
        tuple(block), interpret, scan_impl,
        with_bias=opacity_bias is not None,
        edges_mode=edges_mode, expand_mode=expand_mode,
    )
    if opacity_bias is not None:
        return fn(uv, conic, opacity, features, abs_sink, depth, tiles,
                  rect_min, rect_max, opacity_bias)
    return fn(uv, conic, opacity, features, abs_sink, depth, tiles,
              rect_min, rect_max)
