"""Result plots from results.json files.

Counterpart of the reference's paper-plot tooling
(reference: hulc2/evaluation/create_plots.py:136-457): chain success-rate
curves across checkpoints/runs, per-task success bars, avg-seq-len over
epochs. Reads the results.json schema written by
hulc2_tpu.evaluation.harness.print_and_save.
"""
from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path
from typing import Dict, List

import numpy as np

logger = logging.getLogger(__name__)


def _load(results_file) -> Dict:
    data = json.loads(Path(results_file).read_text())
    return {k: v for k, v in data.items() if k != "best"}


def plot_chain_sr(results_files: List, labels: List[str], out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for f, label in zip(results_files, labels):
        data = _load(f)
        best = max(data, key=lambda k: data[k]["avg_seq_len"])
        srs = [data[best]["chain_sr"][str(i)] for i in range(1, 6)]
        ax.plot(range(1, 6), srs, marker="o", label=f"{label} (ep {best})")
    ax.set_xlabel("instructions in a row")
    ax.set_ylabel("success rate")
    ax.set_xticks(range(1, 6))
    ax.set_ylim(0, 1)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    logger.info("wrote %s", out_path)


def plot_avg_seq_len(results_files: List, labels: List[str], out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for f, label in zip(results_files, labels):
        data = _load(f)
        epochs = sorted(data, key=lambda k: (len(k), k))
        ax.plot(epochs, [data[e]["avg_seq_len"] for e in epochs], marker="o", label=label)
    ax.set_xlabel("checkpoint")
    ax.set_ylabel("avg successful sequence length")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)


def plot_task_sr(results_file, out_path, epoch: str = None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = _load(results_file)
    epoch = epoch or max(data, key=lambda k: data[k]["avg_seq_len"])
    info = data[epoch]["task_info"]
    tasks = sorted(info, key=lambda t: info[t]["success"] / max(info[t]["total"], 1))
    srs = [info[t]["success"] / max(info[t]["total"], 1) for t in tasks]
    fig, ax = plt.subplots(figsize=(7, max(4, 0.22 * len(tasks))))
    ax.barh(tasks, srs)
    ax.set_xlabel("success rate")
    ax.set_xlim(0, 1)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results", nargs="+", help="results.json files")
    p.add_argument("--labels", nargs="*", default=None)
    p.add_argument("--out-dir", default="plots")
    args = p.parse_args(argv)
    labels = args.labels or [Path(f).parent.name for f in args.results]
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    plot_chain_sr(args.results, labels, out / "chain_sr.png")
    plot_avg_seq_len(args.results, labels, out / "avg_seq_len.png")
    plot_task_sr(args.results[0], out / "task_sr.png")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
