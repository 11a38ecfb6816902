"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host CPU devices
(``xla_force_host_platform_device_count``); the real TPU is only used by
bench.py / the driver. Note: the environment pins JAX_PLATFORMS=axon, so the
env var alone does not stick — we must update jax.config explicitly.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# tests intentionally exercise stub (hash) language embeddings; production
# paths refuse them unless this is set (see auto_lang_annotator.require_stub_embeddings_ok)
os.environ.setdefault("HULC2_ALLOW_STUB_EMBEDDINGS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated suite runs skip recompiles of the
# heavy jitted programs (train steps, fused policy steps)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.7)
