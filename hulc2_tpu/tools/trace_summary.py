"""Summarize a jax.profiler Chrome trace: top device ops by total time.

Companion to ``tools/profile_train`` (SURVEY.md §5 — the reference has no
profiling beyond a timeit decorator, hulc2/utils/utils.py:21). Reads the
``*.trace.json.gz`` that ``jax.profiler.trace`` writes under
``<trace_dir>/plugins/profile/<run>/``, keeps only the device's "XLA Ops"
lane (leaf HLO ops — the "XLA Modules"/"Steps" lanes are enclosing parent
spans and would double-count), aggregates by op name and by the trace's own
``hlo_category``, and prints a top-N table — the numbers behind the MFU
commentary in README.md.

Usage::

    python -m hulc2_tpu.tools.profile_train --steps 5 --trace-dir /tmp/t
    python -m hulc2_tpu.tools.trace_summary /tmp/t [--top 15] [--steps 5]
"""
from __future__ import annotations

import argparse
import collections
import gzip
import json
from pathlib import Path


def find_trace_file(trace_dir: str) -> Path:
    hits = sorted(Path(trace_dir).rglob("*.trace.json.gz"))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    return hits[-1]  # newest run


def load_xla_op_events(path: Path):
    """Leaf HLO-op events from the device's 'XLA Ops' thread(s)."""
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    device_pids = {e["pid"] for e in ev
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "/device:" in e["args"].get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in device_pids
               and e["args"].get("name") == "XLA Ops"}
    return [e for e in ev
            if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids]


def summarize(trace_dir: str, top: int = 15, steps: int | None = None) -> dict:
    path = find_trace_file(trace_dir)
    ops = load_xla_op_events(path)
    if not ops:
        raise RuntimeError(f"no device 'XLA Ops' events in {path} — CPU-only trace?")
    per_op = collections.Counter()
    per_cat = collections.Counter()
    long_names: dict = {}
    for e in ops:
        dur = e.get("dur", 0) / 1e3  # us -> ms
        args = e.get("args", {})
        per_op[e["name"]] += dur
        per_cat[args.get("hlo_category", "?")] += dur
        long_names.setdefault(e["name"], args.get("long_name", "")[:160])
    total = sum(per_op.values())
    return {
        "trace": str(path),
        "device_total_ms": round(total, 2),
        "per_step_ms": round(total / steps, 2) if steps else None,
        "top_ops": [
            {"name": n, "total_ms": round(ms, 2),
             "per_step_ms": round(ms / steps, 3) if steps else None,
             "pct": round(100 * ms / total, 1), "hlo": long_names.get(n, "")}
            for n, ms in per_op.most_common(top)
        ],
        "categories": [
            {"category": c, "total_ms": round(ms, 2),
             "pct": round(100 * ms / total, 1)}
            for c, ms in per_cat.most_common()
        ],
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--steps", type=int, default=None,
                   help="profiled step count: also print per-step times")
    p.add_argument("--json", action="store_true", help="machine-readable output")
    p.add_argument("--hlo", action="store_true", help="show HLO long names")
    args = p.parse_args(argv)
    s = summarize(args.trace_dir, args.top, args.steps)
    if args.json:
        print(json.dumps(s))
        return 0
    print(f"trace: {s['trace']}")
    per_step = f"  ({s['per_step_ms']} ms/step)" if s["per_step_ms"] else ""
    print(f"device op total: {s['device_total_ms']} ms{per_step}\n")
    print(f"{'ms':>10} {'%':>6}  op")
    for o in s["top_ops"]:
        print(f"{o['total_ms']:>10.2f} {o['pct']:>5.1f}%  {o['name']}")
        if args.hlo and o["hlo"]:
            print(f"{'':>18}{o['hlo']}")
    print()
    for c in s["categories"]:
        print(f"{c['total_ms']:>10.2f} {c['pct']:>5.1f}%  [{c['category']}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
