"""Measure whether the persistent XLA compilation cache works on this backend.

Runs the same jit'd computation in two fresh subprocesses with
``JAX_COMPILATION_CACHE_DIR`` pointed at a shared directory and reports both
compile times plus the cache-dir entry count. On the axon IFRT backend the
plugin's own compile-cache hooks (``/root/.axon_site/axon/register/ifrt.py:551``)
do the read/stage/write through a fingerprint sidechannel — all they need is
the cache dir configured. See docs/compile_cache.md for the full diagnosis
(VERDICT r2 #4).

Reference role: the upstream repo has no equivalent (torch caches kernels via
cudnn benchmarking); this exists because fresh-process compiles were the
largest iteration tax on the harness (~5-8 min full-size).

Usage::

    python -m hulc2_tpu.tools.cache_probe [--cache-dir /tmp/jax_cache] [--full]

``--full`` compiles the flagship train step (the expensive, realistic case);
the default compiles a mid-size matmul chain that stays >1 s (the plugin
skips entries under ``persistent_cache_min_compile_time_secs``).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

_CHILD_SMALL = """
import os, time, json
import jax, jax.numpy as jnp
# the axon plugin ignores the JAX_PLATFORMS env var (see skills/verify);
# honor it here so the probe can be forced onto the CPU backend
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
t0 = time.monotonic()
REPS = int(os.environ.get("CACHE_PROBE_REPS", "48"))
DIM = int(os.environ.get("CACHE_PROBE_DIM", "1024"))
def f(x, w):
    for _ in range(REPS):
        x = jnp.tanh(x @ w)
    return x.sum()
g = jax.jit(jax.grad(f, argnums=1))
x = jnp.ones((256, DIM), jnp.bfloat16)
w = jnp.ones((DIM, DIM), jnp.bfloat16)
out = g(x, w)
float(out.astype(jnp.float32)[0, 0])  # force host fetch (block_until_ready unreliable on axon)
print(json.dumps({"compile_plus_run_s": round(time.monotonic() - t0, 2)}))
"""

_CHILD_FULL = """
import os, time, json
import jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
t0 = time.monotonic()
from __graft_entry__ import entry
fn, args = entry()
import jax
out = jax.jit(fn)(*args)
leaf = jax.tree_util.tree_leaves(out)[0]
float(jax.numpy.asarray(leaf).astype("float32").ravel()[0])
print(json.dumps({"compile_plus_run_s": round(time.monotonic() - t0, 2)}))
"""


def _run_child(code: str, cache_dir: str, timeout: int, reps: int = 48, dim: int = 1024) -> dict:
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    env["CACHE_PROBE_REPS"] = str(reps)
    env["CACHE_PROBE_DIM"] = str(dim)
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=str(pathlib.Path(__file__).resolve().parents[2]),
        )
    except subprocess.TimeoutExpired:
        # backend outage / pathological compile — report, don't crash
        return {"error": f"child exceeded {timeout}s", "rc": -1,
                "wall_s": round(time.monotonic() - t0, 2)}
    wall = round(time.monotonic() - t0, 2)
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None
    )
    rec = json.loads(line) if line else {"error": proc.stderr[-2000:]}
    rec.update(rc=proc.returncode, wall_s=wall)
    cache_notes = [
        ln for ln in proc.stderr.splitlines() if "compile-cache" in ln
    ]
    if cache_notes:
        rec["cache_notes"] = cache_notes[:5]
    return rec


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--cache-dir", default="/tmp/jax_cache")
    p.add_argument("--full", action="store_true",
                   help="compile the flagship train step instead of the probe matmul")
    p.add_argument("--timeout", type=int, default=900)
    p.add_argument("--reps", type=int, default=48,
                   help="matmul-chain depth of the probe computation")
    p.add_argument("--dim", type=int, default=1024,
                   help="matmul width of the probe computation")
    args = p.parse_args(argv)

    pathlib.Path(args.cache_dir).mkdir(parents=True, exist_ok=True)
    code = _CHILD_FULL if args.full else _CHILD_SMALL

    def entries() -> int:
        return sum(1 for f in pathlib.Path(args.cache_dir).rglob("*") if f.is_file())

    before = entries()
    cold = _run_child(code, args.cache_dir, args.timeout, args.reps, args.dim)
    after_cold = entries()
    warm = _run_child(code, args.cache_dir, args.timeout, args.reps, args.dim)
    report = {
        "cache_dir": args.cache_dir,
        "entries_before": before,
        "entries_after_cold": after_cold,
        "entries_after_warm": entries(),
        "cold": cold,
        "warm": warm,
        "cache_effective": bool(
            after_cold > before
            and isinstance(warm.get("compile_plus_run_s"), (int, float))
            and isinstance(cold.get("compile_plus_run_s"), (int, float))
            and warm["compile_plus_run_s"] < 0.5 * cold["compile_plus_run_s"]
        ),
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
