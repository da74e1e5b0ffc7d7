"""Adaptive density control under static capacity (jit-safe clone/split/prune).

TPU-native re-design of the reference's 3DGS density control
(`/root/reference/src/pointrix/optimizer/gs_optimizer.py:94-379` and the
production `AtlasGaussianSplattingOptimizer` variant
`atlas_gs_optimizer.py`, which always prunes big screen-space points).
The reference grows/shrinks tensors and performs Adam-state surgery
(`points.py:281-395`); under jit every shape is static, so here:

  * arrays stay at `capacity`; `alive` is the live mask;
  * clone/split children are *compacted* with fixed-size `jnp.nonzero(...,
    size=cap)` and scattered into free (dead) slots; if free slots run
    out, the surplus candidates are dropped (and reported via
    `DensifyInfo.dropped` — no silent caps);
  * split parents are removed only when all their children were placed
    (placement is a prefix of the candidate list, so "last child placed"
    suffices);
  * Adam moments of newly used slots are zeroed — the functional mirror of
    `extend_optimizer` (`points.py:337-353`); opacity-reset zeroes the
    opacity moments like `replace_optimizer` (`points.py:384-385`).

Semantics parity notes:
  * clone: grad-norm >= threshold and max scale <= percent_dense * extent
    (`gs_optimizer.py:197-224`); split: same grad test with max scale >
    percent_dense * extent; children sample N(0, scale) rotated by the
    parent rotation, scaling /= 0.8 * split_num (`:253-285`);
  * prune: opacity < min_opacity, 2D radius > 20 px, world size > 0.1 *
    extent (the atlas variant applies the size tests unconditionally,
    `atlas_gs_optimizer.py:358-366`);
  * opacity reset to min(op, 0.01) every `opacity_reset_interval`, with the
    reference's one-step deferral (`gs_optimizer.py:127-133,186-195`);
  * viewspace grad-norm accumulation over visible points with per-point
    visit counts (`gs_optimizer.py:110-121`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianScene
from ..ops.quaternion import inverse_sigmoid, quat_normalize, quat_to_rotmat
from .optim import zero_moments_at


@dataclass(frozen=True)
class DensifyConfig:
    """Hypers — production values from `frag_gs_v10.yaml:26-39`."""

    percent_dense: float = 0.001
    split_num: int = 2
    densify_start_iter: int = 500
    densify_stop_iter: int = 100000
    prune_interval: int = 100
    duplicate_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_grad_threshold: float = 0.0002
    min_opacity: float = 0.05
    # The reference hard-codes `cameras_extent = 5` for the production
    # canonical-camera run (`trainer_fragGS.py:229`), so its world-size
    # prune threshold is 0.1 * 5 = 0.5 world units and its clone/split
    # boundary is 0.001 * 5 = 0.005. Round 3 shipped 1.0 here, which made
    # the size prune 5x too aggressive — the root cause of the
    # "always-prune divergence" (alive 27.8k -> 6.1k, PSNR 5.36 in
    # METRICS_480p_diverged.json): lifted bg/border gaussians legitimately
    # have world scales in (0.1, 0.5) at the [0.5, 2.0] depth range.
    cameras_extent: float = 5.0
    max_radii2d_px: float = 20.0
    # The single-atlas reference optimizer applies BOTH size prunes
    # (screen radii + world scale) only once `step > opacity_reset_interval`
    # (`gs_optimizer.py:361-372`); the PRODUCTION atlas variant prunes by
    # size unconditionally (`atlas_gs_optimizer.py:362`,
    # selected by `frag_gs_v10.yaml:24`). The round-3 collapse under
    # always-prune (alive 27.8k -> 6.1k, METRICS_480p_diverged.json) was
    # NOT caused by this rule — it was the cameras_extent=1.0 bug above
    # (world-size threshold 0.1 instead of the reference's 0.5); with
    # extent=5 the production rule trains fine (METRICS_480p.json r4).
    size_prune_always: bool = False
    # Per-event growth budget as a fraction of the current alive count
    # (0 = unlimited, the reference's behavior: `points.py:281-395` grows
    # by every candidate). MEASURED NEED (2026-08-20): on the textured
    # 480p harness the unlimited policy places 20-40k candidates per
    # event once errors are large (T=250, or T=48 with headroom beyond
    # ~131k); mass duplication then outruns the ~2 visits/frame of
    # healing between events and the fit collapses (PSNR 16 -> 9,
    # METRICS_480p_c196k / _T250 artifacts). A budget of ~5%/event keeps
    # growth exponential (x1.05 per event) but healable; combined with
    # hottest-first candidate ordering the budget goes to the regions
    # the heuristic scores most urgent.
    max_growth_frac: float = 0.0
    # Permanently stop densification once post-event saturation
    # (alive/capacity) reaches this level (0 disables). A saturated scene
    # cannot grow; what events then do is pure CHURN — prune a few
    # thousand and refill the slots with clones every interval — and the
    # 2026-08-20 bisect measured that churn as the collapse agent on the
    # textured 480p harness: PSNR climbs to ~20 until full capacity
    # (step ~2000), then crashes to ~10 once saturated events begin,
    # while an identical run with events stopped just before saturation
    # holds 20-21.5 through the opacity resets (/tmp/e480_stop19.log).
    # The latch lives in the fit loop (`fit.fit_clip`), which already
    # syncs DensifyInfo per event. The reference cannot hit this state
    # (unbounded growth), so 0.97 is the static-capacity design's analog
    # of "no capacity left: densification is done".
    saturation_stop: float = 0.97


class DensifyState(NamedTuple):
    max_radii2d: jnp.ndarray      # [cap] f32
    pos_grad_accum: jnp.ndarray   # [cap] f32
    denom: jnp.ndarray            # [cap] f32


class DensifyInfo(NamedTuple):
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    dropped: jnp.ndarray          # candidates that found no free slot
    num_alive: jnp.ndarray


def init_state(capacity: int) -> DensifyState:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyState(z, z, z)


def accumulate_stats(
    state: DensifyState,
    visibility: jnp.ndarray,
    radii: jnp.ndarray,
    viewspace_grad_norm: jnp.ndarray,
) -> DensifyState:
    """Per-step statistics update (`gs_optimizer.py:110-121`).

    Args:
      visibility: [cap] bool (radius > 0 across the batch).
      radii: [cap] int/float max 2D radii across the batch.
      viewspace_grad_norm: [cap] ||d ndc||_2 of the screen-position grads.
    """
    vis = visibility.astype(jnp.float32)
    return DensifyState(
        max_radii2d=jnp.maximum(state.max_radii2d, radii.astype(jnp.float32) * vis),
        pos_grad_accum=state.pos_grad_accum + viewspace_grad_norm * vis,
        denom=state.denom + vis,
    )


def _place_candidates(
    scene_params: Dict[str, jnp.ndarray],
    alive: jnp.ndarray,
    cand_parent: jnp.ndarray,   # [cap] parent index per candidate (-1 pad)
    cand_is_split: jnp.ndarray, # [cap] bool
    cand_rank: jnp.ndarray,     # [cap] child rank within parent (for rng)
    key: jax.Array,
    split_num: int,
    max_new=None,               # scalar placement budget (None = n_free)
):
    """Scatter candidate children into free slots. Returns (params, used_mask,
    n_placed, n_cand, n_free)."""
    if max_new is None:
        max_new = alive.shape[0]
    cap = alive.shape[0]
    free_idx = jnp.nonzero(~alive, size=cap, fill_value=cap)[0]  # [cap]
    n_free = jnp.sum(~alive)
    n_cand = jnp.sum(cand_parent >= 0)
    n_placed = jnp.minimum(jnp.minimum(n_free, n_cand), max_new)

    j = jnp.arange(cap)
    placed = (j < n_placed) & (cand_parent >= 0)
    dst = jnp.where(placed, free_idx[j], cap)          # scatter target (drop)
    src = jnp.where(cand_parent >= 0, cand_parent, 0)  # safe gather

    # split children get resampled positions + shrunk scaling
    scaling_act = jnp.exp(scene_params["scaling"][src])          # [cap,3]
    rot = quat_normalize(scene_params["rotation"][src])
    Rm = quat_to_rotmat(rot)
    noise = jax.random.normal(key, (cap, 3)) * scaling_act
    split_pos_off = jnp.einsum("nij,nj->ni", Rm, noise)
    new_params = {}
    for name, val in scene_params.items():
        if val.ndim == 0 or val.shape[0] != cap:
            # GLOBAL (non-per-gaussian) parameter — e.g. shared LBS bone
            # trajectories [K, ...]: density control never touches it
            new_params[name] = val
            continue
        child = val[src]
        if name == "position":
            child = jnp.where(
                cand_is_split[:, None], child + split_pos_off, child
            )
        elif name == "scaling":
            child = jnp.where(
                cand_is_split[:, None],
                child - jnp.log(0.8 * split_num),
                child,
            )
        new_params[name] = val.at[dst].set(
            jnp.where(placed.reshape((cap,) + (1,) * (child.ndim - 1)), child, 0.0),
            mode="drop",
        )

    used = jnp.zeros((cap,), bool).at[dst].set(placed, mode="drop")
    return new_params, used, n_placed, n_cand, n_free


def densify_and_prune(
    scene: GaussianScene,
    opt_state,
    state: DensifyState,
    step: jnp.ndarray,
    cfg: DensifyConfig,
    key: jax.Array,
) -> Tuple[GaussianScene, object, DensifyState, DensifyInfo]:
    """One density-control event (call every `duplicate_interval` steps).

    Pure and jit-safe; mirrors `densification` + `prune` + `reset_opacity`
    ordering of the reference.
    """
    cap = scene.alive.shape[0]
    alive = scene.alive
    params = scene.params

    grads = jnp.where(state.denom > 0, state.pos_grad_accum / state.denom, 0.0)
    grads = jnp.nan_to_num(grads)
    scaling_act = jnp.exp(params["scaling"])
    max_scale = jnp.max(scaling_act, axis=-1)
    dense_limit = cfg.percent_dense * cfg.cameras_extent

    hot = alive & (grads >= cfg.densify_grad_threshold)
    clone_mask = hot & (max_scale <= dense_limit)
    split_mask = hot & (max_scale > dense_limit)

    # ---- build the candidate list, hottest parents first -----------------
    # The reference never orders candidates: its growth is unbounded
    # (`points.py:281-395`) so every candidate lands. Under a static
    # capacity, placement is a prefix of the candidate list, so the ORDER
    # becomes the drop policy. Slot-index order (rounds <=4) is arbitrary:
    # at saturation it starves the highest-error regions and never splits
    # (splits sat behind all clones) — measured as a PSNR collapse in the
    # first T=250 flagship run (saturated from step ~1500, 37k dropped
    # per event, PSNR 15.7 -> 9; /tmp/e480_T250.log 2026-08-20). Ranking
    # parents by accumulated viewspace-gradient norm makes the truncated
    # event place the candidates the densify heuristic itself considers
    # most urgent. When nothing is dropped the placed SET is identical,
    # so unsaturated dynamics (and the quality gate) are unchanged.
    sn = cfg.split_num
    n_child = jnp.where(hot, jnp.where(split_mask, sn, 1), 0)    # [cap]
    # CLONE-BEFORE-SPLIT is load-bearing, not incidental: the reference
    # runs `densify_clone` before `densify_split` (`gs_optimizer.py:
    # 302,338`), and a grad-only priority inverts it — the hottest
    # candidates are overwhelmingly splits (hot implies large residuals,
    # and large gaussians collect the largest accumulated grads), and a
    # split is destructive (parent removed, children rescaled 0.8/sn at
    # resampled positions with fresh moments). Measured 2026-08-20: pure
    # grad priority collapsed even the r4-good 131k flagship config
    # (PSNR 26.5 -> 10, /tmp/e480_growth5.log) by churning mass through
    # hot splits. Order: clones (grad desc), then splits (grad desc).
    prio = jnp.where(hot, grads, -jnp.inf)
    order = jnp.lexsort((-prio, split_mask & hot, ~hot))
    n_child_o = n_child[order]
    cum = jnp.cumsum(n_child_o)               # inclusive; cum[-1] = n_cand
    c = jnp.arange(cap)
    pj = jnp.searchsorted(cum, c, side="right")          # ordered-parent id
    valid = c < cum[-1]
    pj_c = jnp.minimum(pj, cap - 1)
    parent = order[pj_c]
    start = cum[pj_c] - n_child_o[pj_c]       # candidate offset of parent
    cand_parent = jnp.where(valid, parent, -1)
    cand_is_split = valid & split_mask[parent]
    cand_rank = jnp.where(valid, c - start, 0).astype(jnp.int32)

    max_new = None
    if cfg.max_growth_frac > 0:
        max_new = jnp.ceil(
            cfg.max_growth_frac * jnp.sum(alive)
        ).astype(jnp.int32)
    new_params, used, n_placed, n_cand, n_free = _place_candidates(
        params, alive, cand_parent, cand_is_split, cand_rank, key, sn,
        max_new=max_new,
    )
    alive = alive | used

    # ---- remove split parents whose children were all placed -------------
    # slot s's children span [start_slot[s], start_slot[s] + sn) of the
    # candidate list; placement is a prefix of n_placed.
    inv_order = jnp.argsort(order)            # slot -> ordered position
    start_slot = (cum - n_child_o)[inv_order]
    parent_removed = split_mask & (start_slot + sn <= n_placed)
    remove_slots = jnp.where(parent_removed, jnp.arange(cap), cap)
    alive = alive.at[remove_slots].set(False, mode="drop")

    # ---- prune ------------------------------------------------------------
    # low-opacity always; the WORLD-scale size test gated on
    # step > opacity_reset_interval exactly like `gs_optimizer.py:361-372`,
    # unless cfg.size_prune_always (the `atlas_gs_optimizer.py:362` variant,
    # set by the atlas trainer).
    #
    # PARITY — the SCREEN-radius test (`max_radii2D > 20`) is intentionally
    # absent: in the reference, `densify_clone`/`densify_split` call
    # `reset_densification_state()` (zeroing max_radii2D) BEFORE `prune`
    # runs in the same `densification(step)` event (`gs_optimizer.py:
    # 302,338,361-372`, `atlas_gs_optimizer.py:304,339`), and production
    # uses duplicate_interval == prune_interval == 100, so the prune always
    # compares freshly-zeroed stats — the screen test never fires. Round 4
    # measured what enforcing it actually does at the flagship scale: big
    # gaussians that re-cover the scene after each opacity reset get
    # executed at the next event, training quality then declines
    # MONOTONICALLY (480p/100k textured run: PSNR 23 -> 6 over steps
    # 2.5k-8k, /tmp/e480_ab_reset.log 2026-08-19). max_radii2d is still
    # accumulated in DensifyState for diagnostics.
    opacity_act = jax.nn.sigmoid(new_params["opacity"][:, 0])
    size_prune = (
        jnp.max(jnp.exp(new_params["scaling"]), axis=-1) > 0.1 * cfg.cameras_extent
    )
    if not cfg.size_prune_always:
        size_prune = size_prune & (step > cfg.opacity_reset_interval)
    prune = (opacity_act < cfg.min_opacity) | size_prune
    # freshly placed children keep zeroed radii stats -> not pruned by radii
    prune = prune & ~used
    n_pruned = jnp.sum(prune & alive)
    alive = alive & ~prune

    # ---- optimizer moments: restart stats at newly used slots ------------
    opt_state = zero_moments_at(opt_state, used)

    # ---- reset densification statistics (reference resets fully) ---------
    new_state = init_state(cap)

    aux = dict(scene.aux)
    aux["alive"] = alive
    new_scene = scene.replace(params=new_params, aux=aux)
    info = DensifyInfo(
        num_cloned=jnp.sum((jnp.arange(cap) < n_placed) & valid
                           & ~cand_is_split),
        num_split=jnp.sum(parent_removed),
        num_pruned=n_pruned,
        dropped=n_cand - n_placed,
        num_alive=jnp.sum(alive),
    )
    return new_scene, opt_state, new_state, info


def reset_opacity(
    scene: GaussianScene, opt_state, max_value: float = 0.01
) -> Tuple[GaussianScene, object]:
    """Clamp opacities to <= max_value and restart their Adam moments —
    parity with `reset_opacity` (`gs_optimizer.py:186-195`) +
    `replace_optimizer` moment zeroing (`points.py:384-385`)."""
    op = jax.nn.sigmoid(scene.params["opacity"])
    new_op = inverse_sigmoid(jnp.minimum(op, max_value))
    params = dict(scene.params)
    params["opacity"] = new_op
    opt_state = zero_moments_at(
        opt_state, jnp.ones_like(scene.alive), names=("opacity",)
    )
    return scene.replace(params=params), opt_state
