"""Pure-JAX network trunks for the offline preprocessing stages (L0).

The reference runs three pretrained torch networks before training
(`/root/reference/src/data_preparation/`): Depth-Anything-V2 monocular
disparity, UniDepth metric depth, and TAPIR dense tracking. These modules
reimplement the inference paths TPU-natively (jnp + static shapes, resizes
as dense matmuls); weights load from converted checkpoints when present
(same gating pattern as `eval/lpips.py`).
"""
