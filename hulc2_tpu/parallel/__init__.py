"""Device-mesh / SPMD parallelism utilities (the NCCL-DDP replacement)."""
