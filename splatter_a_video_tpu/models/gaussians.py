"""Dynamic Gaussian scene: a static-capacity pytree of attribute arrays.

TPU-native re-design of the reference's `PointCloud` attribute bag +
`DynamicGaussianPointCloud` / `DynamicGaussianWithBasePointCloud`
(`/root/reference/src/pointrix/point_cloud/points.py`,
`src/dynamic_gaussian_points.py`, `src/dynamic_gaussian_with_base_point_cloud.py`).

The reference mutates tensor shapes during densification (optimizer surgery,
`points.py:281-395`) — impossible under jit. Here (SURVEY.md §7 idiom 1):

  * arrays are allocated once at `capacity`; an `alive` mask marks live
    Gaussians; densify writes into free slots and prune clears the mask —
    every shape is static, the whole trainer jits;
  * dead/padded slots carry opacity activation ~0 *and* are excluded by the
    renderer via `alive` gating of `tiles`, so they cost nothing downstream;
  * the scene is a registered pytree: `params` holds the trainable leaves
    (per-attribute, mirroring the reference's per-attribute param groups,
    `pointrix/optimizer/__init__.py:40-54`), `aux` holds non-trainable
    arrays (alive mask, spline knots).

Trajectory kinds:
  * "poly_fourier": position/rotation via polynomial+Fourier bases
    (`gs_base` default atlas when no tracks are given);
  * "cubic_spline": position via per-point splines fitted to lifted 3D
    tracks, plus the poly/fourier attributes (which also feed the
    `pos_poly_feat` render attribute) — the production `gs_base` atlas
    (`trainer_fragGS.py:210`, config `render_attributes`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import knn as _knn
from ..ops import sh as _sh
from ..ops.quaternion import inverse_sigmoid
from . import trajectory as _traj


@dataclass(frozen=True)
class SceneConfig:
    """Static scene configuration (shapes + semantics; hashable)."""

    capacity: int
    num_frames: int
    max_sh_degree: int = 3
    traj: str = "poly_fourier"  # or "cubic_spline" / "lbs" / "static"
    poly_dim: int = _traj.POLY_DIM
    fourier_dim: int = _traj.FOURIER_DIM
    frames_per_knot: int = 5
    num_bones: int = 16         # traj="lbs": shared translation bones
    # name -> channel count of extra blended attributes, e.g.
    # {"mask_attribute": 1, "dino_attribute": 3} (frag_gs_v10.yaml:110-118)
    render_attributes: Tuple[Tuple[str, int], ...] = ()
    start_frame_id: int = 0

    @property
    def num_knots(self) -> int:
        return -(-self.num_frames // self.frames_per_knot) + 1

    def t_norm(self, t) -> jnp.ndarray:
        """Frame index -> normalized time in [0,1]
        (`dynamic_gaussian_points.py:140`)."""
        return (jnp.asarray(t, jnp.float32) - self.start_frame_id) / max(
            self.num_frames - 1, 1
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class GaussianScene:
    """params: trainable attribute arrays [capacity, ...]; aux: non-trainable."""

    params: Dict[str, jnp.ndarray]
    aux: Dict[str, jnp.ndarray]
    cfg: SceneConfig

    def tree_flatten(self):
        return (self.params, self.aux), self.cfg

    @classmethod
    def tree_unflatten(cls, cfg, children):
        params, aux = children
        return cls(params=params, aux=aux, cfg=cfg)

    # ---- activations (parity: dynamic_gaussian_points.py:75-81) ----------

    @property
    def alive(self) -> jnp.ndarray:
        return self.aux["alive"]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    def get_opacity(self) -> jnp.ndarray:
        """[capacity] sigmoid opacity, zeroed for dead slots."""
        return jax.nn.sigmoid(self.params["opacity"][:, 0]) * self.alive

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.params["scaling"])

    def get_shs(self) -> jnp.ndarray:
        """[capacity, (deg+1)^2, 3] — DC + rest (`:164-168`)."""
        return jnp.concatenate(
            [self.params["features_dc"], self.params["features_rest"]], axis=1
        )

    def get_position(self, t, detach_pos: bool = False) -> jnp.ndarray:
        if self.cfg.traj == "static":
            return self.params["position"]
        tn = self.cfg.t_norm(t)
        if self.cfg.traj == "lbs":
            return _traj.position_lbs(
                self.params["position"],
                self.params["pos_lbs_logits"],
                self.params["lbs_bone_poly"],
                self.params["lbs_bone_fourier"],
                tn,
                detach_pos=detach_pos,
            )
        if self.cfg.traj == "cubic_spline":
            return _traj.position_cubic_spline(
                self.params["position"],
                self.params["pos_cubic_coeff"],
                self.aux["spline_knots"],
                jnp.asarray(t, jnp.float32) / max(self.cfg.num_frames - 1, 1),
                detach_pos=detach_pos,
            )
        return _traj.position_poly_fourier(
            self.params["position"],
            self.params["pos_poly_feat"],
            self.params["pos_fourier_feat"],
            tn,
            detach_pos=detach_pos,
        )

    def get_rotation(self, t) -> jnp.ndarray:
        """Unnormalized quaternion at time t (renderer normalizes)."""
        if self.cfg.traj == "static":
            return self.params["rotation"]
        return _traj.rotation_poly_fourier(
            self.params["rotation"],
            self.params["rot_poly_feat"],
            self.params["rot_fourier_feat"],
            self.cfg.t_norm(t),
        )

    def get_render_attribute(self, name: str) -> jnp.ndarray:
        """Sigmoid-activated extra attribute (mask/dino — `:119-122`)."""
        return jax.nn.sigmoid(self.params[name])

    def replace(self, **kw) -> "GaussianScene":
        return dataclasses.replace(self, **kw)


def create_scene(
    cfg: SceneConfig,
    positions: np.ndarray,
    colors: Optional[np.ndarray] = None,
    init_opacity: float = 0.01,
    track_seq: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> GaussianScene:
    """Initialize a scene from points (+ colors, + optional 3D track seq).

    Parity with `gaussian_point_init` (`gaussian_utils.py:67-106`): scale =
    log(sqrt(mean 3-NN squared distance)), identity quats, opacity =
    inverse_sigmoid(init_opacity) (0.01 for the poly/fourier cloud
    `dynamic_gaussian_points.py:86`, 0.5 for the spline cloud
    `..._base_point_cloud.py:125`), zero features_rest and motion coeffs.

    Args:
      positions: [N, 3] with N <= cfg.capacity (rest of capacity is dead).
      colors: [N, 3] RGB in [0,1]; None -> random grey-ish init.
      track_seq: [T, N, 3] per-frame positions for traj="cubic_spline".
    """
    N = positions.shape[0]
    cap = cfg.capacity
    if N > cap:
        raise ValueError(f"{N} init points > capacity {cap}")

    positions = np.asarray(positions, np.float32)
    pos_full = np.zeros((cap, 3), np.float32)
    pos_full[:N] = positions
    # park dead slots far behind the near plane so they cull cheaply even
    # if somehow rendered
    pos_full[N:] = np.array([0.0, 0.0, -10.0], np.float32)

    d2 = np.asarray(_knn.mean_knn3_sq_dist(jnp.asarray(positions)))
    scales_n = np.log(np.sqrt(np.maximum(d2, 1e-7)))[:, None].repeat(3, 1)
    scaling = np.full((cap, 3), np.log(1e-3), np.float32)
    scaling[:N] = scales_n

    rotation = np.zeros((cap, 4), np.float32)
    rotation[:, 0] = 1.0

    opacity = np.full((cap, 1), inverse_sigmoid(jnp.asarray(init_opacity)), np.float32)

    if colors is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        colors = np.asarray(jax.random.uniform(key, (N, 3))) * 0.5 + 0.25
    fdc = np.zeros((cap, 1, 3), np.float32)
    fdc[:N] = np.asarray(_sh.rgb_to_sh(jnp.asarray(colors, jnp.float32)))[:, None, :]
    frest = np.zeros((cap, (cfg.max_sh_degree + 1) ** 2 - 1, 3), np.float32)

    params: Dict[str, jnp.ndarray] = {
        "position": jnp.asarray(pos_full),
        "features_dc": jnp.asarray(fdc),
        "features_rest": jnp.asarray(frest),
        "scaling": jnp.asarray(scaling),
        "rotation": jnp.asarray(rotation),
        "opacity": jnp.asarray(opacity),
    }
    if cfg.traj != "static":
        params.update(
            pos_poly_feat=jnp.zeros((cap, cfg.poly_dim, 3)),
            pos_fourier_feat=jnp.zeros((cap, cfg.fourier_dim, 3)),
            rot_poly_feat=jnp.zeros((cap, cfg.poly_dim, 4)),
            rot_fourier_feat=jnp.zeros((cap, cfg.fourier_dim, 4)),
        )
    if cfg.traj == "lbs":
        # small random skinning logits break the bone-gradient symmetry
        # (zero bones + equal weights would keep all bones identical);
        # the bone trajectories themselves start at rest
        if key is None:
            key = jax.random.PRNGKey(0)
        params.update(
            pos_lbs_logits=0.01
            * jax.random.normal(jax.random.fold_in(key, 1), (cap, cfg.num_bones)),
            lbs_bone_poly=jnp.zeros((cfg.num_bones, cfg.poly_dim, 3)),
            lbs_bone_fourier=jnp.zeros((cfg.num_bones, cfg.fourier_dim, 3)),
        )
    for name, dim in cfg.render_attributes:
        if name in ("pos_poly_feat", "pos_fourier_feat", "rot_poly_feat", "rot_fourier_feat"):
            continue  # motion coeffs double as render attributes (`:114-116`)
        params[name] = jnp.zeros((cap, dim))

    aux: Dict[str, jnp.ndarray] = {
        "alive": jnp.arange(cap) < N,
    }

    if cfg.traj == "cubic_spline":
        if track_seq is None:
            raise ValueError("cubic_spline trajectory needs track_seq [T,N,3]")
        coeff, knots = _traj.fit_cubic_spline(
            np.asarray(track_seq, np.float32), cfg.frames_per_knot
        )
        coeff_full = np.zeros((cap,) + coeff.shape[1:], np.float32)
        coeff_full[:N] = coeff
        params["pos_cubic_coeff"] = jnp.asarray(coeff_full)
        aux["spline_knots"] = jnp.asarray(knots)

    return GaussianScene(params=params, aux=aux, cfg=cfg)
