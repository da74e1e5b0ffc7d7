"""Pallas TPU kernels: sorted multi-channel alpha compositing, fwd + bwd.

TPU-native re-architecture of the reference CUDA blenders
(`/root/reference/src/submodules/dptr/dptr/gs/src/alpha_blending.cu`,
`alpha_blending_enhanced.cu`). The CUDA design — one 16x16 thread block per
tile, Gaussians staged through shared memory, a scalar front-to-back loop per
pixel, atomicAdd gradient scatter — maps badly to TPU. This design instead:

  * grid = (tile_y, tile_x); each kernel instance owns one 16x16 pixel tile
    (256 pixels) and streams its depth-sorted Gaussian list in chunks of
    `CHUNK` (128) via double-buffered async DMA from a packed [D, P]
    intersection buffer built by `binning.py` (chunk-aligned, alpha=0
    padding => no validity masks in the kernel);
  * compositing is vectorized over (pixels=256, chunk=128): transmittance is
    a cumulative *sum of log(1-alpha)* along the chunk axis, computed as a
    matmul with a constant triangular matrix (MXU), and feature accumulation
    is a (256 x 128) x (128 x C) matmul (MXU) — there is no scalar loop;
  * the CUDA early-termination rule (stop before the Gaussian that would
    push T below 1e-4) is reproduced exactly with a monotone-prefix argument:
    within a chunk, `applied = valid & (cumT >= 1e-4) & ~done`, which equals
    the sequential rule because cumT is non-increasing;
  * backward is a *forward* re-sweep (no reverse pass): the suffix term of
    dL/dalpha is `total - prefix` where `total = sum_c g*(out - T_fin*bg)` is
    known from the saved output — gradients are written per intersection slot
    and reduced to per-Gaussian values by the (deterministic) XLA scatter-add
    that is the autodiff transpose of the packing gather. No atomics anywhere,
    so gradients are bit-deterministic — an improvement over the reference
    (SURVEY.md §5 "race detection").

Gradient conventions match `alpha_blending_enhanced.cu:136-273`: the 0.99
alpha clamp is ignored in the backward (d alpha/d opacity = exp(power)), the
skip rules gate gradients, and |d uv| magnitudes are accumulated into
dedicated "abs" rows of the packed buffer for densification statistics
(replacing the reference's `abs_ndc` dummy-tensor trick,
`dptr_ortho_enhanced.py:331-338`).

Per-channel generalization: the reference issues three CUDA launches per
view (RGB via `alpha_blending_enhanced`, depth with bg=1, extra attributes
with detached opacity and bg=0, `dptr_ortho_enhanced.py:342-376`). Here one
kernel invocation blends all channels at once: `bg` is a per-channel vector
and `alpha_grad_mask` marks which channels propagate into d opacity
(the detached-opacity channels get a 0), reproducing the reference's
`opacity.detach()` semantics without extra passes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16          # pixel tile edge; parity with BLOCK_X/BLOCK_Y (config.h:7-10)
PIX = TILE * TILE  # pixels per kernel instance
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def packed_rows(C: int) -> int:
    """Rows of the packed intersection buffer: uv(2) conic(3) opacity(1)
    features(C) abs-sink(2), padded to a multiple of 8 sublanes."""
    return _round_up(8 + C, 8)


def pack_intersections(
    uv: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    features: jnp.ndarray,
    abs_sink: jnp.ndarray,
    gid: jnp.ndarray,
) -> jnp.ndarray:
    """Gather per-Gaussian data into the packed [D, P] intersection buffer.

    This gather is *differentiable*: its autodiff transpose is a
    deterministic scatter-add that plays the role of the reference backward's
    atomicAdd accumulation (but in sorted order => bit-reproducible).

    Args:
      uv [N,2], conic [N,3], opacity [N], features [N,C]: screen-space data.
      abs_sink [N,2]: zeros; its *gradient* receives the summed |duv| stats.
      gid [P]: slot -> gaussian id map from `bin_and_sort` (-1 = padding).
    Returns: [D, P] float32 with alpha-neutral padding slots.
    """
    C = features.shape[1]
    D = packed_rows(C)
    attrs = jnp.concatenate(
        [uv, conic, opacity[:, None], features, abs_sink], axis=1
    )  # [N, 8+C]
    valid = gid >= 0
    safe = jnp.where(valid, gid, 0)
    # where (not multiply): its vjp *selects* the cotangent, so uninitialized
    # garbage in never-written tail slots of d_packed cannot leak through as
    # NaN * 0 into gaussian 0's gradients.
    vals = jnp.where(valid[:, None], attrs[safe], 0.0)  # [P, 8+C]
    pad = D - (8 + C)
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
    return vals.T.astype(jnp.float32)  # [D, P]


def _tri_incl(K: int, dtype=jnp.float32):
    """[K, K] lower-triangular-ones (inclusive): out = x @ tri == cumsum(x)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (r <= c).astype(dtype)


def _tri_excl(K: int, dtype=jnp.float32):
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (r < c).astype(dtype)


def _cumsum_lanes(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Cumulative sum along the lane (chunk) axis as an MXU matmul."""
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _chunk_alpha(data, px_x, px_y):
    """Shared fwd/bwd per-chunk screen-space math.

    data: [D, K] packed slice. px_x/px_y: [PIX, 1] pixel coords.
    Returns (alpha_eff [PIX,K], gexp [PIX,K], vx, vy, conic rows, op row).
    """
    uvx = data[0:1, :]
    uvy = data[1:2, :]
    ca = data[2:3, :]
    cb = data[3:4, :]
    cc = data[4:5, :]
    op = data[5:6, :]
    vx = uvx - px_x  # [PIX, K]
    vy = uvy - px_y
    power = -0.5 * (ca * vx * vx + cc * vy * vy) - cb * vx * vy
    # clamp before exp: power > 0 entries are masked out anyway, and an inf
    # gexp would poison masked gradients with inf * 0 = nan
    gexp = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, op * gexp)
    alpha_eff = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
    return alpha_eff, gexp, vx, vy, ca, cb, cc, op


def _pixel_coords(tgx: int):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px_x = (tx * TILE + p % TILE).astype(jnp.float32)
    px_y = (ty * TILE + p // TILE).astype(jnp.float32)
    return ty, tx, px_x, px_y


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(
    # scalar prefetch
    nchunks_ref,
    cstart_ref,
    # inputs
    packed_hbm,
    ids_hbm,  # may be None (K_idx == 0)
    # outputs
    out_ref,
    finalT_ref,
    ncontrib_ref,
    gsidx_ref,  # may be None
    # scratch
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
    bg: Tuple[float, ...],
    K_idx: int,
):
    ty, tx, px_x, px_y = _pixel_coords(tgx)
    t = ty * tgx + tx
    n = nchunks_ref[t]
    c0 = cstart_ref[t]
    tri = _tri_incl(chunk)

    # Per-pixel running state lives in VMEM scratch, not in loop carries:
    # Mosaic cannot legalize large vector carries with mixed layouts, and
    # scratch persists across the sequential grid anyway (reset per tile).
    # st columns: 0 = T (transmittance), 1 = done flag, 2 = applied count.
    st[:] = jnp.concatenate(
        [
            jnp.ones((PIX, 1), jnp.float32),
            jnp.zeros((PIX, 2), jnp.float32),
        ],
        axis=1,
    )
    acc[:] = jnp.zeros((PIX, C), jnp.float32)
    if K_idx:
        gsidx_ref[:] = jnp.full((1, PIX, K_idx), -1, jnp.int32)

    def dma(slot, ci):
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds((c0 + ci) * chunk, chunk)],
            buf.at[slot],
            sem.at[slot],
        )

    def idma(slot, ci):
        return pltpu.make_async_copy(
            ids_hbm.at[:, pl.ds((c0 + ci) * chunk, chunk)],
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

        data = buf[slot]  # [D, chunk]
        alpha_eff, _, _, _, _, _, _, _ = _chunk_alpha(data, px_x, px_y)
        log1m = jnp.log(1.0 - alpha_eff)
        cumT = T * jnp.exp(_cumsum_lanes(log1m, tri))  # [PIX, chunk]
        applied = (alpha_eff > 0.0) & (cumT >= T_EPS) & jnp.logical_not(done)
        one_m = 1.0 - alpha_eff
        w = jnp.where(applied, alpha_eff * cumT / one_m, 0.0)

        feats = data[6 : 6 + C, :]  # [C, chunk]
        acc[:] = acc[:] + jax.lax.dot_general(
            w, feats, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [PIX, C]

        if K_idx:
            ids = ibuf[slot]  # [1, chunk] int32
            rank = cnt + _cumsum_lanes(applied.astype(jnp.float32), _tri_excl(chunk))
            ranki = rank.astype(jnp.int32)
            for s in range(K_idx):
                sel = applied & (ranki == s)
                has = jnp.any(sel, axis=1, keepdims=True)
                val = jnp.max(jnp.where(sel, ids, -1), axis=1, keepdims=True)
                col = gsidx_ref[0, :, s : s + 1]
                gsidx_ref[0, :, s : s + 1] = jnp.where(has, val, col)

        T_new = jnp.min(jnp.where(applied, cumT, T), axis=1, keepdims=True)
        term = jnp.any((alpha_eff > 0.0) & (cumT < T_EPS), axis=1, keepdims=True)
        done_new = jnp.where(term, 1.0, st[:, 1:2])
        cnt_new = cnt + jnp.sum(applied.astype(jnp.float32), axis=1, keepdims=True)
        st[:] = jnp.concatenate([T_new, done_new, cnt_new], axis=1)

        all_done = jnp.all(done_new > 0.0)
        go = (i + 1 < n) & jnp.logical_not(all_done)
        return (i + 1, go)

    i_f, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), n > 0))

    # an in-flight DMA may remain if we exited via all-done
    @pl.when(i_f < n)
    def _():
        dma(jax.lax.rem(i_f, 2), i_f).wait()
        if K_idx:
            idma(jax.lax.rem(i_f, 2), i_f).wait()

    # bg is a static python tuple; array constants can't be captured by the
    # kernel, so compose channel columns with scalar constants instead.
    # Outputs are tile-major [num_tiles, PIX, c] (TPU-legal block shapes);
    # the wrapper reassembles the [H, W, c] image.
    T = st[:, 0:1]
    out_cols = [acc[:, i : i + 1] + T * bg[i] for i in range(C)]
    out_ref[:] = jnp.concatenate(out_cols, axis=1).reshape(1, PIX, C)
    finalT_ref[:] = T.reshape(1, PIX, 1)
    ncontrib_ref[:] = st[:, 2:3].astype(jnp.int32).reshape(1, PIX, 1)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------


def _bwd_kernel(
    # scalar prefetch
    nchunks_ref,
    cstart_ref,
    # inputs
    packed_hbm,
    g_ref,      # [TILE, TILE, C] upstream grad block
    outimg_ref,  # [TILE, TILE, C] saved forward output block
    finalT_ref,  # [TILE, TILE]
    # outputs
    dpacked_hbm,
    # scratch
    buf,
    sem,
    obuf,
    osem,
    st,
    *,
    C: int,
    D: int,
    chunk: int,
    tgx: int,
    bg: Tuple[float, ...],
    alpha_grad_mask: Tuple[float, ...],
):
    ty, tx, px_x, px_y = _pixel_coords(tgx)
    t = ty * tgx + tx
    n = nchunks_ref[t]
    c0 = cstart_ref[t]
    tri = _tri_incl(chunk)

    g = g_ref[:].reshape(PIX, C)
    # bg / alpha_grad_mask are static python tuples (array constants can't be
    # captured by kernels) — compose per-channel columns with scalar consts.
    gm = jnp.concatenate(
        [g[:, i : i + 1] * alpha_grad_mask[i] for i in range(C)], axis=1
    )
    out = outimg_ref[:].reshape(PIX, C)
    Tfin = finalT_ref[:].reshape(PIX, 1)

    # total_p = sum over all applied j of G_j w_j  (per channel mask);
    # B = sum_c g_c bg_c for the background term of dL/dalpha.
    def _col_dot(x, coeffs):
        acc = None
        for i in range(C):
            term = x[:, i : i + 1] * coeffs[i]
            acc = term if acc is None else acc + term
        return acc

    B_all = _col_dot(g, bg)
    B_op = _col_dot(gm, bg)
    blended_dot_g = jnp.sum(g * out, axis=1, keepdims=True) - Tfin * B_all
    blended_dot_gm = jnp.sum(gm * out, axis=1, keepdims=True) - Tfin * B_op
    tot_all = blended_dot_g
    tot_op = blended_dot_gm

    def dma_in(slot, ci):
        return pltpu.make_async_copy(
            packed_hbm.at[:, pl.ds((c0 + ci) * chunk, chunk)],
            buf.at[slot],
            sem.at[slot],
        )

    def dma_out(slot, ci):
        return pltpu.make_async_copy(
            obuf.at[slot],
            dpacked_hbm.at[:, pl.ds((c0 + ci) * chunk, chunk)],
            osem.at[slot],
        )

    # Running per-pixel state in VMEM scratch (see fwd kernel note):
    # st columns: 0 = T, 1 = done, 2 = prefix_all, 3 = prefix_op.
    st[:] = jnp.concatenate(
        [jnp.ones((PIX, 1), jnp.float32), jnp.zeros((PIX, 3), jnp.float32)],
        axis=1,
    )

    @pl.when(n > 0)
    def _():
        dma_in(0, 0).start()

    def body(i, carry):
        slot = jax.lax.rem(i, 2)
        dma_in(slot, i).wait()

        @pl.when(i + 1 < n)
        def _():
            dma_in(jax.lax.rem(i + 1, 2), i + 1).start()

        # wait for the out-DMA that used this slot two iterations ago
        @pl.when(i >= 2)
        def _():
            dma_out(slot, i - 2).wait()

        T = st[:, 0:1]
        done = st[:, 1:2] > 0.0
        pre_all = st[:, 2:3]
        pre_op = st[:, 3:4]

        data = buf[slot]
        alpha_eff, gexp, vx, vy, ca, cb, cc, op = _chunk_alpha(data, px_x, px_y)
        log1m = jnp.log(1.0 - alpha_eff)
        cumT = T * jnp.exp(_cumsum_lanes(log1m, tri))
        applied = (alpha_eff > 0.0) & (cumT >= T_EPS) & jnp.logical_not(done)
        one_m = 1.0 - alpha_eff
        w = jnp.where(applied, alpha_eff * cumT / one_m, 0.0)
        T_excl = cumT / one_m
        appf = applied.astype(jnp.float32)

        feats = data[6 : 6 + C, :]
        # G_kp = sum_c g_cp f_ck : [PIX, chunk]
        G_all = jax.lax.dot_general(
            g, feats, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        G_op = jax.lax.dot_general(
            gm, feats, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        u_all = G_all * w
        u_op = G_op * w
        pref_all = pre_all + _cumsum_lanes(u_all, tri)  # inclusive prefix
        pref_op = pre_op + _cumsum_lanes(u_op, tri)
        suf_all = tot_all - pref_all
        suf_op = tot_op - pref_op

        dalpha_all = (G_all * T_excl - (suf_all + Tfin * B_all) / one_m) * appf
        dalpha_op = (G_op * T_excl - (suf_op + Tfin * B_op) / one_m) * appf

        # CUDA convention: clamp ignored => dalpha/dop = gexp, dalpha/dpower
        # = op * gexp (alpha_blending_enhanced.cu:254-270).
        dop_pk = gexp * dalpha_op
        dpow = op * gexp * dalpha_all
        duvx_pk = dpow * (-(ca * vx + cb * vy))
        duvy_pk = dpow * (-(cc * vy + cb * vx))
        dca_pk = dpow * (-0.5 * vx * vx)
        dcb_pk = dpow * (-vx * vy)
        dcc_pk = dpow * (-0.5 * vy * vy)

        # per-gaussian reductions over pixels -> [1, chunk] rows
        duvx = jnp.sum(duvx_pk, axis=0, keepdims=True)
        duvy = jnp.sum(duvy_pk, axis=0, keepdims=True)
        dabsx = jnp.sum(jnp.abs(duvx_pk), axis=0, keepdims=True)
        dabsy = jnp.sum(jnp.abs(duvy_pk), axis=0, keepdims=True)
        dca = jnp.sum(dca_pk, axis=0, keepdims=True)
        dcb = jnp.sum(dcb_pk, axis=0, keepdims=True)
        dcc = jnp.sum(dcc_pk, axis=0, keepdims=True)
        dop = jnp.sum(dop_pk, axis=0, keepdims=True)
        # dfeat_ck = sum_p g_cp w_pk : [C, chunk]
        dfeat = jax.lax.dot_general(
            g, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        grad = jnp.concatenate(
            [duvx, duvy, dca, dcb, dcc, dop, dfeat, dabsx, dabsy], axis=0
        )  # [8+C, chunk]
        if D > 8 + C:
            grad = jnp.concatenate(
                [grad, jnp.zeros((D - (8 + C), chunk), jnp.float32)], axis=0
            )
        obuf[slot] = grad
        dma_out(slot, i).start()

        # state update
        T_new = jnp.min(jnp.where(applied, cumT, T), axis=1, keepdims=True)
        term = jnp.any((alpha_eff > 0.0) & (cumT < T_EPS), axis=1, keepdims=True)
        done_new = jnp.where(term, 1.0, st[:, 1:2])
        st[:] = jnp.concatenate(
            [T_new, done_new, pref_all[:, -1:], pref_op[:, -1:]], axis=1
        )
        return carry

    jax.lax.fori_loop(0, n, body, 0)

    # drain the last (up to) two out-DMAs
    @pl.when(n >= 2)
    def _():
        dma_out(jax.lax.rem(n - 2, 2), n - 2).wait()

    @pl.when(n >= 1)
    def _():
        dma_out(jax.lax.rem(n - 1, 2), n - 1).wait()


# --------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _build_splat(
    C: int,
    W: int,
    H: int,
    bg: Tuple[float, ...],
    alpha_grad_mask: Tuple[float, ...],
    K_idx: int,
    chunk: int,
    interpret: bool,
):
    """Construct the custom-vjp splat function for one static config."""
    D = packed_rows(C)
    tgx = -(-W // TILE)
    tgy = -(-H // TILE)
    grid = (tgy, tgx)

    T_tiles = tgy * tgx

    def tiles_to_img(x):
        """[T, PIX, c] -> [H, W, c] (crop the tile-padded canvas)."""
        c = x.shape[-1]
        x = x.reshape(tgy, tgx, TILE, TILE, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(tgy * TILE, tgx * TILE, c)
        return x[:H, :W]

    def img_to_tiles(x):
        """[H, W, c] -> [T, PIX, c] (pad onto the tile canvas)."""
        c = x.shape[-1]
        x = jnp.pad(x, ((0, tgy * TILE - H), (0, tgx * TILE - W), (0, 0)))
        x = x.reshape(tgy, TILE, tgx, TILE, c).transpose(0, 2, 1, 3, 4)
        return x.reshape(T_tiles, PIX, c)

    tile_block = lambda c: pl.BlockSpec((1, PIX, c), lambda i, j, *_: (i * tgx + j, 0, 0))

    def fwd_pallas(packed, ids, nchunks, cstart):
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        inputs = [packed]
        if K_idx:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            inputs.append(ids.reshape(1, -1))
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
            _fwd_kernel_entry,
            C=C,
            D=D,
            chunk=chunk,
            tgx=tgx,
            bg=bg,
            K_idx=K_idx,
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=[
                    pltpu.VMEM((2, D, chunk), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((2, 1, chunk), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((PIX, 3), jnp.float32),   # st: T/done/cnt
                    pltpu.VMEM((PIX, C), jnp.float32),   # acc
                ],
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(nchunks, cstart, *inputs)
        out = tiles_to_img(outs[0])
        finalT = tiles_to_img(outs[1])[..., 0]
        ncontrib = tiles_to_img(outs[2])[..., 0]
        gs_idx = tiles_to_img(outs[3]) if K_idx else None
        return out, finalT, ncontrib, gs_idx

    def bwd_pallas(packed, nchunks, cstart, out, finalT, g):
        g = img_to_tiles(g)
        out = img_to_tiles(out)
        finalT = img_to_tiles(finalT[..., None])
        kernel = functools.partial(
            _bwd_kernel,
            C=C,
            D=D,
            chunk=chunk,
            tgx=tgx,
            bg=bg,
            alpha_grad_mask=alpha_grad_mask,
        )
        dpacked = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    tile_block(C),
                    tile_block(C),
                    tile_block(1),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((2, D, chunk), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((2, D, chunk), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((PIX, 4), jnp.float32),  # st: T/done/prefixes
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
            interpret=interpret,
        )(nchunks, cstart, packed, g, out, finalT)
        return dpacked

    @jax.custom_vjp
    def splat(packed, ids, nchunks, cstart):
        return fwd_pallas(packed, ids, nchunks, cstart)

    def splat_fwd(packed, ids, nchunks, cstart):
        outs = fwd_pallas(packed, ids, nchunks, cstart)
        out, finalT, _, _ = outs
        shapes = (ids.shape, nchunks.shape, cstart.shape)
        return outs, (packed, nchunks, cstart, out, finalT, shapes)

    def splat_bwd(res, cts):
        packed, nchunks, cstart, out, finalT, shapes = res
        g = cts[0]  # [H, W, C]; finalT/ncontrib/gs_idx cotangents ignored
        dpacked = bwd_pallas(packed, nchunks, cstart, out, finalT, g)
        # int-dtype primals take float0 cotangents
        zeros0 = tuple(np.zeros(s, dtype=jax.dtypes.float0) for s in shapes)
        return (dpacked,) + zeros0

    splat.defvjp(splat_fwd, splat_bwd)
    return splat


def _fwd_kernel_entry(nchunks_ref, cstart_ref, *rest, C, D, chunk, tgx, bg, K_idx):
    """Adapter matching pallas_call's positional ref ordering for both the
    K_idx>0 (with ids input + gs_idx output) and K_idx==0 signatures."""
    if K_idx:
        (packed_hbm, ids_hbm, out_ref, finalT_ref, ncontrib_ref, gsidx_ref,
         buf, sem, ibuf, isem, st, acc) = rest
    else:
        (packed_hbm, out_ref, finalT_ref, ncontrib_ref,
         buf, sem, ibuf, isem, st, acc) = rest
        ids_hbm = None
        gsidx_ref = None
    _fwd_kernel(
        nchunks_ref, cstart_ref, packed_hbm, ids_hbm,
        out_ref, finalT_ref, ncontrib_ref, gsidx_ref,
        buf, sem, ibuf, isem, st, acc,
        C=C, D=D, chunk=chunk, tgx=tgx, bg=bg, K_idx=K_idx,
    )


def splat_packed(
    packed: jnp.ndarray,
    ids: jnp.ndarray,
    nchunks: jnp.ndarray,
    cstart: jnp.ndarray,
    *,
    C: int,
    W: int,
    H: int,
    bg: Tuple[float, ...],
    alpha_grad_mask: Optional[Tuple[float, ...]] = None,
    K_idx: int = 0,
    chunk: int = 128,
    interpret: Optional[bool] = None,
):
    """Blend a packed intersection buffer into an [H, W, C] image.

    Args:
      packed: [D, P] buffer from `pack_intersections`.
      ids: [P] int32 slot->gaussian ids (used only when K_idx > 0).
      nchunks/cstart: per-tile chunk counts/starts from `bin_and_sort`.
      bg: per-channel background values (length C).
      alpha_grad_mask: per-channel 0/1 — channels whose gradient reaches
        opacity (1 = reference's attached-opacity blends, 0 = the
        `opacity.detach()` extra-attribute blend). Defaults to all ones.
      K_idx: record first-K contributing ids per pixel when > 0.
    Returns: (image [H,W,C], final_T [H,W], ncontrib [H,W], gs_idx or None).
    """
    if alpha_grad_mask is None:
        alpha_grad_mask = (1.0,) * C
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _build_splat(
        C, W, H, tuple(float(b) for b in bg),
        tuple(float(m) for m in alpha_grad_mask), K_idx, chunk, interpret
    )
    return fn(packed, ids, nchunks, cstart)
