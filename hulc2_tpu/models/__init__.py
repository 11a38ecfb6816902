"""Flax model zoo: policy networks, encoders, decoders, plan nets.

Components mirror the reference's registries (reference:
hulc2/models/__init__.py:13-31) but are idiomatic JAX: pure functions of
(params, inputs, rng), static shapes, NHWC image layout, bf16-friendly.
"""
