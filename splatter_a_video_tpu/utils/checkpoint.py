"""Checkpoint / resume for training state (orbax).

Parity target: `FragTrainer.save_model` / `load_from_ckpt`
(`/root/reference/src/trainer_fragGS.py:928-997`): periodic snapshots of
{model state, optimizer state}, auto-resume from the newest checkpoint in
the output dir, step recovered from the checkpoint name. Here the whole
`TrainState` (scene params+aux, optax state, densify stats, step, rng key)
is one pytree saved with orbax — shape-stable by design (static capacity),
so restore never needs the reference's optimizer re-creation dance
(`load_model`, `:942-965`).
"""

from __future__ import annotations

import os
import re
from typing import Optional



def _ckpt_dir(out_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(out_dir), f"ckpt_{step:06d}")


def save_checkpoint(out_dir: str, state, step: int) -> str:
    import orbax.checkpoint as ocp

    path = _ckpt_dir(out_dir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(out_dir: str) -> Optional[int]:
    if not os.path.isdir(out_dir):
        return None
    steps = []
    for name in os.listdir(out_dir):
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(out_dir: str, example_state, step: Optional[int] = None):
    """Restore into the structure of `example_state`; returns (state, step)
    or (None, None) if no checkpoint exists — the auto-resume behavior of
    `load_from_ckpt` (`trainer_fragGS.py:968-997`)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(out_dir)
    if step is None:
        return None, None
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(_ckpt_dir(out_dir, step), example_state)
    return restored, step
