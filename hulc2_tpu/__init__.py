"""hulc2_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the HULC++ stack.

A hierarchical language-conditioned robot-manipulation framework with the
capabilities of the reference implementation (mees/hulc2):

- low-level goal-conditioned latent-plan CVAE policy (``hulc2_tpu.models.hulc2``)
- visuo-lingual affordance model (``hulc2_tpu.affordance``)
- CALVIN long-horizon evaluation harness (``hulc2_tpu.evaluation``)

Design: SPMD over ``jax.sharding.Mesh``, functional transforms, static shapes,
bf16 compute on the MXU, fused on-device preprocessing. Python hosts feed data;
all per-step compute is a single jitted function.
"""

__version__ = "0.1.0"
