"""Evaluate many checkpoints of a run (optionally several runs) sequentially
or in parallel worker processes.

Counterpart of the reference's run_multiple tooling
(reference: hulc2/evaluation/run_multiple.py:24 — taskset-pinned 8-way
parallel checkpoint evaluation): each worker gets a subset of checkpoints
and appends into the shared results.json (the harness merge handles it).
On a single-TPU host workers share the chip, so the default is sequential;
--workers N fans out processes for CPU/fake-env sweeps.

    python -m hulc2_tpu.evaluation.run_multiple --train-dir runs/... \
        --dataset-path /data/calvin/task_D_D [--num-sequences 1000]
"""
from __future__ import annotations

import argparse
import logging
import subprocess
import sys
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger(__name__)


def list_checkpoints(train_dir) -> list:
    d = Path(train_dir) / "saved_models"
    return sorted(int(p.name) for p in d.iterdir() if p.is_dir() and p.name.isdigit())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-dir", required=True)
    p.add_argument("--dataset-path", default=None)
    p.add_argument("--num-sequences", type=int, default=1000)
    p.add_argument("--ep-len", type=int, default=360)
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--fake-env", action="store_true")
    p.add_argument("--checkpoints", type=int, nargs="*", default=None)
    p.add_argument("--aff-train-dir", default=None,
                   help="forwarded: hierarchical mode per checkpoint")
    p.add_argument("--n-envs", type=int, default=None)
    p.add_argument("--cohorts", type=int, default=None)
    p.add_argument("--single-step", action="store_true")
    p.add_argument("--process-envs", action="store_true")
    p.add_argument("--aff-lang-embeddings", default=None,
                   help="forwarded: custom affordance embedding table")
    p.add_argument("--heuristic-oracle", action="store_true",
                   help="forwarded: pin the heuristic oracle per checkpoint")
    args = p.parse_args(argv)

    steps = args.checkpoints or list_checkpoints(args.train_dir)
    logger.info("evaluating %d checkpoints: %s", len(steps), steps)

    def cmd_for(step: int) -> list:
        cmd = [
            sys.executable, "-m", "hulc2_tpu.evaluation.evaluate_policy",
            "--train-dir", args.train_dir,
            "--checkpoint", str(step),
            "--num-sequences", str(args.num_sequences),
            "--ep-len", str(args.ep_len),
        ]
        if args.dataset_path:
            cmd += ["--dataset-path", args.dataset_path]
        if args.fake_env:
            cmd += ["--fake-env"]
        if args.aff_train_dir:
            cmd += ["--aff-train-dir", args.aff_train_dir]
        if args.n_envs:
            cmd += ["--n-envs", str(args.n_envs)]
        if args.cohorts:
            cmd += ["--cohorts", str(args.cohorts)]
        if args.single_step:
            cmd += ["--single-step"]
        if args.process_envs:
            cmd += ["--process-envs"]
        if args.aff_lang_embeddings:
            cmd += ["--aff-lang-embeddings", args.aff_lang_embeddings]
        if args.heuristic_oracle:
            cmd += ["--heuristic-oracle"]
        return cmd

    if args.workers <= 1:
        for step in steps:
            subprocess.run(cmd_for(step), check=True)
        return 0

    shards = np.array_split(steps, args.workers)
    procs = []
    for w, shard in enumerate(shards):
        if not len(shard):
            continue
        script = " && ".join(" ".join(cmd_for(int(s))) for s in shard)
        procs.append(subprocess.Popen(["bash", "-c", script]))
    rc = 0
    for proc in procs:
        rc |= proc.wait()
    return rc


if __name__ == "__main__":
    sys.exit(main())
