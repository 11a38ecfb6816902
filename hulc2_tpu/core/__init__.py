"""Core infrastructure: config composition, PRNG discipline, device mesh,
checkpointing, metrics/logging."""
