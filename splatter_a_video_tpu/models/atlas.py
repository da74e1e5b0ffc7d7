"""Multi-atlas scene container — the FragModel equivalent.

TPU-native equivalent of `FragModel`
(`/root/reference/src/frag_model.py:204-355`): a named collection of
Gaussian "atlases" (`gs_base`, `gs_fg`, `gs_bg`, ...) whose per-atlas render
dicts are concatenated along the Gaussian axis for one fused rasterization,
and whose viewspace gradients are split back per atlas by point-count prefix
sums for per-atlas density control (`frag_model.py:319-343`).

Here each atlas is a static-capacity `GaussianScene`; concatenation happens
on the activated render inputs (everything stays jit-static because each
atlas has a fixed capacity), and the per-atlas slices are just static
offsets — no `.grad` surgery needed.

The production configuration uses a single `gs_base` atlas
(`trainer_fragGS.py:210`), which callers get via `single()`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from .gaussians import GaussianScene


@jax.tree_util.register_pytree_node_class
@dataclass
class AtlasModel:
    """Ordered dict of named atlases; a pytree over the scenes."""

    atlases: Dict[str, GaussianScene]

    def tree_flatten(self):
        names = tuple(self.atlases.keys())
        return tuple(self.atlases.values()), names

    @classmethod
    def tree_unflatten(cls, names, scenes):
        return cls(atlases=dict(zip(names, scenes)))

    @classmethod
    def single(cls, scene: GaussianScene, name: str = "gs_base") -> "AtlasModel":
        return cls(atlases={name: scene})

    @property
    def names(self) -> List[str]:
        return list(self.atlases.keys())

    def get_atlas(self, name: str) -> GaussianScene:
        """Parity with `FragModel.get_atlas` (`frag_model.py:260-270`)."""
        return self.atlases[name]

    def point_num_sep(self) -> List[int]:
        """Static prefix offsets of each atlas in the concatenated arrays —
        parity with `get_point_num_sep` (`frag_model.py:319-324`), except
        offsets are capacities (static) rather than live counts."""
        offs = [0]
        for s in self.atlases.values():
            offs.append(offs[-1] + s.alive.shape[0])
        return offs

    def slice_for(self, name: str) -> Tuple[int, int]:
        offs = self.point_num_sep()
        i = self.names.index(name)
        return offs[i], offs[i + 1]

    def forward(self, t) -> Dict[str, jnp.ndarray]:
        """Concatenated activated render inputs at time t — parity with
        `FragModel.forward` (`frag_model.py:273-298`)."""
        dicts = []
        for s in self.atlases.values():
            d = {
                "position": s.get_position(t),
                "opacity": s.get_opacity(),
                "scaling": s.get_scaling(),
                "rotation": s.get_rotation(t),
                "shs": s.get_shs(),
                "pos_poly_feat": s.params["pos_poly_feat"].reshape(
                    s.params["pos_poly_feat"].shape[0], -1
                ),
            }
            for name in ("mask_attribute", "dino_attribute"):
                if name in s.params:
                    d[name] = s.get_render_attribute(name)
            dicts.append(d)
        keys = dicts[0].keys()
        return {k: jnp.concatenate([d[k] for d in dicts], axis=0) for k in keys}

    @property
    def alive(self) -> jnp.ndarray:
        return jnp.concatenate([s.alive for s in self.atlases.values()])

    def replace_atlas(self, name: str, scene: GaussianScene) -> "AtlasModel":
        new = dict(self.atlases)
        new[name] = scene
        return AtlasModel(atlases=new)
