"""Config registry: all registered groups/options (the conf/ tree equivalent)."""
from hulc2_tpu.configs import affordance, policy  # noqa: F401  (registers groups on import)
