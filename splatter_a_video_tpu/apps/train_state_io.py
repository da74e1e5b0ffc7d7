"""Scene (de)serialization glue between training output dirs and the
inference CLIs — restore a `GaussianScene` without reconstructing the full
`TrainState` example pytree."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np


def save_scene_cfg(out_dir: str, scene) -> None:
    cfg = dataclasses.asdict(scene.cfg)
    with open(os.path.join(out_dir, "scene_cfg.json"), "w") as f:
        json.dump(cfg, f, indent=2, default=str)


def load_scene_from_ckpt(out_dir: str, step: Optional[int] = None):
    """Restore the scene pytree from the newest (or given) checkpoint."""
    import orbax.checkpoint as ocp

    from ..models.gaussians import GaussianScene, SceneConfig
    from ..utils.checkpoint import latest_step

    if step is None:
        step = latest_step(out_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {out_dir}")
    path = os.path.join(os.path.abspath(out_dir), f"ckpt_{step:06d}")
    raw = ocp.StandardCheckpointer().restore(path)
    # TrainState is a NamedTuple -> restored as a list/tuple pytree;
    # index 0 is the scene (params, aux) with cfg lost to serialization.
    scene_raw = raw[0] if isinstance(raw, (list, tuple)) else raw["scene"]
    params, aux = scene_raw  # GaussianScene flattens to (params, aux)

    cfg_path = os.path.join(out_dir, "scene_cfg.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            d = json.load(f)
        d["render_attributes"] = tuple(
            (k, int(v)) for k, v in (d.get("render_attributes") or [])
        )
        cfg = SceneConfig(**{
            k: v for k, v in d.items()
            if k in {f.name for f in dataclasses.fields(SceneConfig)}
        })
    else:
        # reconstruct from shapes
        cap = params["position"].shape[0]
        traj = "cubic_spline" if "pos_cubic_coeff" in params else "poly_fourier"
        nf = (
            int((aux["spline_knots"].shape[0] - 1) * 5)
            if "spline_knots" in aux
            else 2
        )
        cfg = SceneConfig(capacity=cap, num_frames=nf, traj=traj)

    params = {k: jnp.asarray(v) for k, v in params.items()}
    aux = {k: jnp.asarray(v) for k, v in aux.items()}
    return GaussianScene(params=params, aux=aux, cfg=cfg)
