"""Training layer: jitted train/val steps over a device mesh, optimizers,
KL annealing, checkpointing, the trainer loop."""
