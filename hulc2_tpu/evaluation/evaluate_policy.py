"""CALVIN 1000-chain benchmark CLI.

Public-entry equivalent of the reference's
``python hulc2/evaluation/evaluate_policy.py`` (reference:
hulc2/evaluation/evaluate_policy.py:14-94): evaluates one or all checkpoints
of a training run on the fixed 1000-chain x 5-subtask protocol (ep_len=360)
and writes results.json.

    python -m hulc2_tpu.evaluation.evaluate_policy --train-dir runs/... \
        --dataset-path /data/calvin/task_D_D [--checkpoint N] [--fake-env]

``--fake-env`` runs the full harness against the interactive FakeCalvinEnv
(envs/fake_env.py): scene state mutates only through the policy's own
``step()`` actions, observations are rendered from the scene, and success is
scored by the scene-obs task oracle — the in-repo benchmark backend used when
the PyBullet calvin_env package is unavailable (see docs/runs/r4_learning_loop).
"""
from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

import numpy as np

from hulc2_tpu.evaluation import harness
from hulc2_tpu.evaluation.sequences import get_sequences

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger(__name__)


def load_lang_embeddings_file(f: Path):
    """Parse an ``embeddings.npy``-style dict file into
    ({annotation: embedding}, {key: annotation})."""
    data = np.load(f, allow_pickle=True).item()
    return {v["ann"][0]: np.asarray(v["emb"]).squeeze() for v in data.values()}, {
        k: v["ann"][0] for k, v in data.items()
    }


def load_lang_embeddings(dataset_path: Path, lang_folder: str):
    """Validation-annotation sentence -> embedding lookup
    (reference: evaluation/utils.py:88-96 LangEmbeddings)."""
    return load_lang_embeddings_file(
        Path(dataset_path) / "validation" / lang_folder / "embeddings.npy"
    )


def save_eval_diagnostics(ev, log_dir: Path, args, sequences) -> None:
    """Write eval_diagnostics.json next to results.json: per-subtask outcome
    records + per-task failure-mode histogram (VERDICT r4 next #3), the
    wall-clock stage decomposition and tail-drain throughput curve (next #6),
    and the hierarchical-mode counters."""
    import json

    per_task: dict = {}
    for r in ev.subtask_records:
        d = per_task.setdefault(r["task"], {
            "attempts": 0, "successes": 0, "policy_steps_on_success": [],
            "approach_steps_mean": 0.0,
        })
        d["attempts"] += 1
        d["approach_steps_mean"] += r["approach_steps"]
        if r["success"]:
            d["successes"] += 1
            d["policy_steps_on_success"].append(r["policy_steps"])
    for t, d in per_task.items():
        n_ok = len(d["policy_steps_on_success"])
        d["sr"] = round(d["successes"] / max(d["attempts"], 1), 3)
        d["mean_policy_steps_on_success"] = (
            round(float(np.mean(d["policy_steps_on_success"])), 1) if n_ok else None
        )
        d["approach_steps_mean"] = round(d["approach_steps_mean"] / max(d["attempts"], 1), 1)
        del d["policy_steps_on_success"]
    diag = {
        "num_sequences": len(sequences),
        "ep_len": args.ep_len,
        "n_envs": args.n_envs,
        "cohorts": args.cohorts,
        "paraphrase_eval": bool(getattr(args, "paraphrase_eval", False)),
        "wall_clock_s": round(getattr(ev, "wall_clock_s", 0.0), 1),
        "total_env_steps": int(getattr(ev, "total_env_steps", 0)),
        "timings_s": {k: round(v, 1) for k, v in ev.timings.items()},
        "throughput_curve": ev.throughput_curve,
        "hierarchical": {
            "aff_predictions": ev.n_aff_predictions,
            "approaches": ev.n_approaches,
            "approach_steps": ev.n_approach_steps,
        },
        "per_task": dict(sorted(per_task.items(), key=lambda kv: kv[1]["sr"])),
        "subtask_records": ev.subtask_records,
    }
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    (log_dir / "eval_diagnostics.json").write_text(json.dumps(diag, indent=1))
    logger.info("per-task SR (worst 8): %s",
                {t: d["sr"] for t, d in list(diag["per_task"].items())[:8]})


def make_policy_rollout_fn(agent, oracle, task_to_annotation, lang_embeddings, ep_len: int):
    """rollout_fn(env, subtask) -> bool: reset agent for the instruction and
    run up to ep_len policy steps, checking the oracle after every step
    (reference: manager_aff_lmp.py:26-79)."""

    def rollout_fn(env, subtask: str) -> bool:
        caption = task_to_annotation[subtask]
        agent.reset(caption)
        start_info = env.get_info()
        goal = {"lang": lang_embeddings[caption]}
        obs = env.get_obs()
        for _ in range(ep_len):
            action = agent.step(obs, goal)
            obs, _, _, _ = env.step(action)
            if subtask in oracle.get_task_info_for_set(start_info, env.get_info(), [subtask]):
                return True
        return False

    return rollout_fn


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-dir", required=True, help="training run dir (config.json + saved_models)")
    p.add_argument("--dataset-path", default=None, help="CALVIN dataset root (for env + lang embeddings)")
    p.add_argument("--checkpoint", type=int, default=None, help="specific step (default: newest)")
    p.add_argument("--all-checkpoints", action="store_true")
    p.add_argument("--ep-len", type=int, default=harness.EP_LEN)
    p.add_argument("--num-sequences", type=int, default=harness.NUM_SEQUENCES)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--fake-env", action="store_true",
                   help="use the interactive FakeCalvinEnv backend (no PyBullet)")
    p.add_argument("--lang-folder", default="lang_annotations")
    p.add_argument("--n-envs", type=int, default=1,
                   help="lockstep env instances per policy dispatch (batched eval)")
    p.add_argument("--cohorts", type=int, default=1,
                   help="split the env farm into C cohorts with overlapping TPU "
                        "dispatches (hides dispatch latency behind host sim time)")
    p.add_argument("--process-envs", action="store_true",
                   help="give each simulator its own worker process so envs "
                        "step in parallel on host cores (needs n-envs > 1)")
    p.add_argument("--aff-train-dir", default=None,
                   help="affordance training run dir: enables the hierarchical "
                        "HULC++ mode (affordance predict -> PD approach -> "
                        "policy), the reference's --aff_train_folder "
                        "(manager_aff_lmp.py:139-155)")
    p.add_argument("--aff-checkpoint", type=int, default=None,
                   help="specific affordance step (default: newest)")
    p.add_argument("--single-step", action="store_true",
                   help="evaluate only the FIRST subtask of each chain — the "
                        "per-task success-rate protocol of the reference's "
                        "evaluate_policy_singlestep.py (results.json then "
                        "carries per-task SR; chain_sr/1 is the overall SR)")
    p.add_argument("--heuristic-oracle", action="store_true",
                   help="score with the scene-obs heuristic oracle even when "
                        "calvin_env's native oracle is available")
    p.add_argument("--aff-lang-embeddings", default=None,
                   help="npy dict file {idx: {ann, emb}} with embeddings "
                        "matching the affordance model's language encoder; "
                        "defaults to the dataset's validation embeddings when "
                        "the dimensions match")
    p.add_argument("--device-render", action="store_true",
                   help="render observations INSIDE the policy's jitted "
                        "program from (scene_obs, robot_obs) instead of on "
                        "the host (fake env only; envs/render_jax.py, "
                        "byte-identical raycast). Removes the measured host "
                        "render floor (~8 ms/env-step on a 1-core host) and "
                        "shrinks per-step H2D from ~30 KiB/env to 156 B/env")
    p.add_argument("--paraphrase-eval", action="store_true",
                   help="paraphrase-generalization protocol: instructions are "
                        "drawn from each task's HELD-OUT paraphrases "
                        "(tools.annotations.heldout_annotations) — sentences "
                        "excluded from training annotation sampling. Requires "
                        "a policy with an in-graph language tower (it must "
                        "encode sentences it never saw)")
    args = p.parse_args(argv)

    from hulc2_tpu.envs.task_oracle import make_oracle
    from hulc2_tpu.evaluation.loading import load_policy

    if args.all_checkpoints:
        from hulc2_tpu.evaluation.run_multiple import list_checkpoints, main as run_all

        argv_rest = ["--train-dir", args.train_dir, "--num-sequences", str(args.num_sequences),
                     "--ep-len", str(args.ep_len)]
        if args.dataset_path:
            argv_rest += ["--dataset-path", args.dataset_path]
        if args.fake_env:
            argv_rest += ["--fake-env"]
        if args.aff_train_dir:
            argv_rest += ["--aff-train-dir", args.aff_train_dir]
        if args.n_envs > 1:
            argv_rest += ["--n-envs", str(args.n_envs), "--cohorts", str(args.cohorts)]
        if args.single_step:
            argv_rest += ["--single-step"]
        if args.process_envs:
            argv_rest += ["--process-envs"]
        if args.aff_lang_embeddings:
            argv_rest += ["--aff-lang-embeddings", args.aff_lang_embeddings]
        if args.heuristic_oracle:
            argv_rest += ["--heuristic-oracle"]
        if args.device_render:
            argv_rest += ["--device-render"]
        if args.paraphrase_eval:
            argv_rest += ["--paraphrase-eval"]
        return run_all(argv_rest)

    t0 = time.time()
    model, params, cfg = load_policy(args.train_dir, args.checkpoint)
    log_dir = Path(args.log_dir or (Path(args.train_dir) / "evaluation"))
    sequences = get_sequences(args.num_sequences)
    if args.single_step:
        val_dir = Path(args.dataset_path) / "validation" if args.dataset_path else None
        if val_dir and val_dir.is_dir():
            # reference protocol: initial states from oracle-detected
            # validation episodes (evaluate_policy_singlestep.py:22-41)
            sequences = harness.dataset_singlestep_sequences(val_dir)
        else:
            logger.warning(
                "--single-step without a dataset validation split: using "
                "truncated 1000-chain initial states (approximation of the "
                "reference's recorded-episode distribution)")
            sequences = harness.singlestep_sequences(sequences)
    # native calvin_env oracle for real-simulator scoring, heuristic otherwise
    oracle = make_oracle(real_env=not args.fake_env,
                         force_heuristic=args.heuristic_oracle)

    affordance = None
    if args.aff_train_dir:
        from hulc2_tpu.evaluation.loading import load_affordance

        affordance = load_affordance(args.aff_train_dir, args.aff_checkpoint)

    if args.fake_env:
        from hulc2_tpu.envs.fake_env import FakeCalvinEnv
        from hulc2_tpu.agents.hulc2_agent import Hulc2Agent
        from hulc2_tpu.evaluation.tasks import TASK_NAMES

        rng = np.random.default_rng(0)
        task_to_ann = {}
        lang_variants = aff_lang_variants = None
        policy_uses_tokens = (
            (cfg["model"].get("language_encoder") or {}).get("_name_") == "clip_text"
        )
        if args.paraphrase_eval and not policy_uses_tokens:
            p.error("--paraphrase-eval needs a policy with an in-graph language "
                    "tower (model/language_encoder=clip*): an embedding-table "
                    "policy cannot encode sentences it never saw")
        if policy_uses_tokens:
            # in-graph tower: goals are BPE token ids of the CANONICAL
            # validation sentence per task (the same phrasing the validation
            # bank pins — reference conf/annotations/new_playtable_validation);
            # --paraphrase-eval swaps in the held-out paraphrases instead
            from hulc2_tpu.tools.annotations import VALIDATION_BANK, heldout_annotations
            from hulc2_tpu.utils.clip_tokenizer import tokenize

            lang_embeddings = {
                t: np.asarray(tokenize([VALIDATION_BANK[t]])[0]) for t in TASK_NAMES
            }
            if args.paraphrase_eval:
                lang_variants = {
                    t: [np.asarray(tokenize([s])[0]) for s in heldout_annotations(t)]
                    for t in TASK_NAMES
                }
        elif args.dataset_path:
            # trained-checkpoint eval: the goal vector per task must be the
            # SAME embedding training saw (the dataset's canonical
            # embeddings.npy) — random vectors only exercise mechanics
            ann_emb, task_to_ann = load_lang_embeddings(args.dataset_path, args.lang_folder)
            lang_embeddings = {t: np.asarray(ann_emb[a], np.float32)
                               for t, a in task_to_ann.items()}
        else:
            lang_embeddings = {t: rng.standard_normal(384).astype(np.float32) for t in TASK_NAMES}
        aff_lang = None
        if affordance is not None:
            dim = affordance.model.lang_embed_dim
            if affordance.uses_tokens:
                # token-tower affordance model: same sentences as the policy,
                # as CLIP-BPE ids (no embedding table anywhere)
                from hulc2_tpu.tools.annotations import VALIDATION_BANK, heldout_annotations
                from hulc2_tpu.utils.clip_tokenizer import tokenize

                aff_lang = {t: np.asarray(tokenize([VALIDATION_BANK[t]])[0])
                            for t in TASK_NAMES}
                if args.paraphrase_eval:
                    aff_lang_variants = {
                        t: [np.asarray(tokenize([s])[0]) for s in heldout_annotations(t)]
                        for t in TASK_NAMES
                    }
            elif args.aff_lang_embeddings:
                ann_emb, t2a = load_lang_embeddings_file(Path(args.aff_lang_embeddings))
                aff_lang = {t: np.asarray(ann_emb[a], np.float32) for t, a in t2a.items()}
            elif task_to_ann:
                # hash-embedding runs: the affordance tower trained on
                # hash_embed(annotation) at its own dim — rebuild that table
                # for the canonical sentences
                from hulc2_tpu.tools.auto_lang_annotator import hash_embed

                aff_lang = {t: hash_embed([a], dim)[0] for t, a in task_to_ann.items()}
            else:
                # smoke mode: shape-correct pseudo-embeddings
                aff_lang = {t: rng.standard_normal(dim).astype(np.float32) for t in TASK_NAMES}
            affordance.lang_table = aff_lang

        # render at the training preset's resolution: the agent's transform
        # would resample any other size, putting eval pixels subtly off the
        # training distribution (96-rendered vs 200-rendered-then-resized)
        from hulc2_tpu.data import device_transforms as dt

        preset = dt.TRANSFORM_PRESETS.get(cfg["datamodule"].get("transforms", "rand_shift"), {})
        val_tf = preset.get("val", {})

        def _preset_hw(cam_key, default):
            for op in val_tf.get(cam_key, []):
                if op.get("op") == "resize":
                    return int(op["size"])
            return default

        env_hw = dict(static_hw=_preset_hw("rgb_static", 200),
                      gripper_hw=_preset_hw("rgb_gripper", 84))

        # batched/pipelined evaluator — the interactive benchmark path
        # (n_envs=1 is just a 1-env farm; success always comes from the
        # oracle judging what the policy's own step() actions did)
        from hulc2_tpu.envs.calvin_wrapper import EnvFarm
        from hulc2_tpu.evaluation.batched_eval import PipelinedEvaluator

        n_cohorts = max(1, min(args.cohorts, args.n_envs))
        per = args.n_envs // n_cohorts
        sizes = [per + (1 if c < args.n_envs % n_cohorts else 0) for c in range(n_cohorts)]
        cohorts, shared_step = [], None
        seed = 0
        for size in sizes:
            farm = EnvFarm([FakeCalvinEnv(seed=seed + i, render_obs=not args.device_render,
                                          **env_hw) for i in range(size)])
            seed += size
            agent = Hulc2Agent(farm, model, params, cfg["datamodule"],
                               n_envs=size, fused_step=shared_step,
                               device_render=env_hw if args.device_render else None)
            shared_step = shared_step or agent._fused_step
            cohorts.append((farm, agent))
        ev = PipelinedEvaluator(cohorts, lang_embeddings, ep_len=args.ep_len, oracle=oracle,
                                affordance=affordance, aff_lang_embeddings=aff_lang,
                                lang_variants=lang_variants,
                                aff_lang_variants=aff_lang_variants)
        log_dir.mkdir(parents=True, exist_ok=True)
        ev.partial_path = log_dir / "partial_results.json"  # cutoff insurance
        results = ev.evaluate(sequences=sequences)
        if affordance is not None:
            logger.info("hierarchical mode: %d affordance predictions, %d approaches, "
                        "%d approach steps", ev.n_aff_predictions, ev.n_approaches,
                        ev.n_approach_steps)
        step = args.checkpoint if args.checkpoint is not None else "latest"
        merged = harness.print_and_save({str(step): results}, log_dir, sequences=sequences)
        save_eval_diagnostics(ev, log_dir, args, sequences)
        logger.info("evaluation wall-clock: %.1f s", time.time() - t0)
        return merged

    else:
        from hulc2_tpu.agents.hulc2_agent import Hulc2Agent
        from hulc2_tpu.envs.calvin_wrapper import CalvinEnvWrapper, make_calvin_env
        from hulc2_tpu.data.statistics import load_statistics

        if args.dataset_path is None:
            p.error("--dataset-path is required without --fake-env")
        stats = load_statistics(Path(args.dataset_path) / "training")
        lang_embeddings, task_to_ann = load_lang_embeddings(args.dataset_path, args.lang_folder)
        aff_task_table = None
        if affordance is not None:
            dim = affordance.model.lang_embed_dim
            if args.aff_lang_embeddings:
                ann_emb, _ = load_lang_embeddings_file(Path(args.aff_lang_embeddings))
            else:
                ann_emb = lang_embeddings
            sample = np.asarray(next(iter(ann_emb.values())))
            if sample.shape[-1] != dim:
                p.error(
                    f"affordance language embeddings are {sample.shape[-1]}-d but the "
                    f"affordance model expects {dim}-d — pass --aff-lang-embeddings "
                    "with a table produced by the affordance model's own encoder"
                )
            aff_task_table = {task: np.asarray(ann_emb[ann], np.float32)
                              for task, ann in task_to_ann.items()}
            affordance.lang_table = {ann: np.asarray(e, np.float32)
                                     for ann, e in ann_emb.items()}
        if args.n_envs > 1:
            from hulc2_tpu.envs.calvin_wrapper import EnvFarm
            from hulc2_tpu.evaluation.batched_eval import PipelinedEvaluator

            n_cohorts = max(1, min(args.cohorts, args.n_envs))
            per = args.n_envs // n_cohorts
            sizes = [per + (1 if c < args.n_envs % n_cohorts else 0) for c in range(n_cohorts)]
            cohorts, shared_step = [], None
            for size in sizes:
                if args.process_envs:
                    from functools import partial

                    from hulc2_tpu.envs.calvin_wrapper import make_wrapped_calvin_env
                    from hulc2_tpu.envs.process_farm import ProcessEnvFarm

                    farm = ProcessEnvFarm(
                        [partial(make_wrapped_calvin_env, args.dataset_path)] * size
                    )
                else:
                    farm = EnvFarm([
                        CalvinEnvWrapper(make_calvin_env(args.dataset_path, show_gui=False))
                        for _ in range(size)
                    ])
                agent = Hulc2Agent(farm, model, params, cfg["datamodule"], stats,
                                   n_envs=size, fused_step=shared_step)
                shared_step = shared_step or agent._fused_step
                cohorts.append((farm, agent))
            lang_variants = aff_lang_variants = None
            if (cfg["model"].get("language_encoder") or {}).get("_name_") == "clip_text":
                # in-graph tower: goals are BPE token ids of the annotations
                from hulc2_tpu.utils.clip_tokenizer import tokenize

                ann_to_emb = {task: tokenize([ann])[0] for task, ann in task_to_ann.items()}
                if args.paraphrase_eval:
                    from hulc2_tpu.tools.annotations import heldout_annotations

                    lang_variants = {
                        t: [np.asarray(tokenize([s])[0]) for s in heldout_annotations(t)]
                        for t in task_to_ann
                    }
                    if affordance is not None and affordance.uses_tokens:
                        aff_lang_variants = lang_variants
            elif args.paraphrase_eval:
                p.error("--paraphrase-eval needs a policy with an in-graph "
                        "language tower (model/language_encoder=clip*)")
            else:
                ann_to_emb = {task: lang_embeddings[ann] for task, ann in task_to_ann.items()}
            ev = PipelinedEvaluator(cohorts, ann_to_emb, ep_len=args.ep_len, oracle=oracle,
                                    affordance=affordance, aff_lang_embeddings=aff_task_table,
                                    lang_variants=lang_variants,
                                    aff_lang_variants=aff_lang_variants)
            try:
                results = ev.evaluate(sequences=sequences)
            finally:
                for farm, _ in cohorts:
                    if hasattr(farm, "close"):
                        farm.close()
            if affordance is not None:
                logger.info("hierarchical mode: %d affordance predictions, %d approaches, "
                            "%d approach steps", ev.n_aff_predictions, ev.n_approaches,
                            ev.n_approach_steps)
            step = args.checkpoint if args.checkpoint is not None else "latest"
            merged = harness.print_and_save({str(step): results}, log_dir, sequences=sequences)
            save_eval_diagnostics(ev, log_dir, args, sequences)
            logger.info("evaluation wall-clock: %.1f s", time.time() - t0)
            return merged
        env = CalvinEnvWrapper(make_calvin_env(args.dataset_path, show_gui=False))
        agent = Hulc2Agent(env, model, params, cfg["datamodule"], stats, affordance=affordance)
        rollout_fn = make_policy_rollout_fn(agent, oracle, task_to_ann, lang_embeddings, args.ep_len)

    results = harness.evaluate_policy(rollout_fn, env, sequences=sequences)
    step = args.checkpoint if args.checkpoint is not None else "latest"
    merged = harness.print_and_save({str(step): results}, log_dir, sequences=sequences)
    logger.info("evaluation wall-clock: %.1f s", time.time() - t0)
    return merged


if __name__ == "__main__":
    main(sys.argv[1:])
