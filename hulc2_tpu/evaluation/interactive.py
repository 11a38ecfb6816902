"""Interactive policy rollouts: type an instruction, watch the policy act.

Counterpart of the reference's interactive smoke-test CLIs
(reference: hulc2/evaluation/test_policy_interactive.py:131,
rollouts_interactive.py:40): loads a trained run, builds the env (calvin_env
when installed; --fake-env otherwise), and loops reading instructions from
stdin, running up to --ep-len policy steps each, reporting the oracle verdict.

    python -m hulc2_tpu.evaluation.interactive --train-dir runs/... \
        --dataset-path /data/calvin/task_D_D [--fake-env] [--show]
"""
from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(message)s")
logger = logging.getLogger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-dir", required=True)
    p.add_argument("--dataset-path", default=None)
    p.add_argument("--ep-len", type=int, default=360)
    p.add_argument("--fake-env", action="store_true")
    p.add_argument("--show", action="store_true", help="cv2 window with the static cam")
    p.add_argument("--lang-folder", default="lang_annotations")
    args = p.parse_args(argv)

    from hulc2_tpu.agents.hulc2_agent import Hulc2Agent
    from hulc2_tpu.envs.task_oracle import SceneObsTaskOracle
    from hulc2_tpu.evaluation.loading import load_policy
    from hulc2_tpu.evaluation.tasks import TASK_NAMES
    from hulc2_tpu.tools.auto_lang_annotator import hash_embed, require_stub_embeddings_ok

    model, params, cfg = load_policy(args.train_dir)
    oracle = SceneObsTaskOracle()

    # models with the in-graph CLIP text tower take BPE token ids for FREE
    # instructions (no precomputed-embedding table needed)
    has_tower = (cfg["model"].get("language_encoder") or {}).get("_name_") == "clip_text"
    if has_tower:
        from hulc2_tpu.utils.clip_tokenizer import tokenize

        embed = lambda s: tokenize([s])[0]
    else:
        require_stub_embeddings_ok("interactive eval without an embeddings table")
        embed = lambda s: hash_embed([s])[0]

    if args.fake_env:
        from hulc2_tpu.envs.fake_env import FakeCalvinEnv

        env = FakeCalvinEnv()
    else:
        from hulc2_tpu.envs.calvin_wrapper import CalvinEnvWrapper, make_calvin_env
        from hulc2_tpu.evaluation.evaluate_policy import load_lang_embeddings

        env = CalvinEnvWrapper(make_calvin_env(args.dataset_path, show_gui=False))
        if not has_tower:
            table, _ = load_lang_embeddings(args.dataset_path, args.lang_folder)

            def embed(s, _table=table):
                if s in _table:
                    return _table[s]
                print(f"WARNING: {s!r} is not in the embeddings table — using a "
                      "stub hash embedding; the policy will NOT understand it")
                return hash_embed([s])[0]

    agent = Hulc2Agent(env, model, params, cfg["datamodule"])
    env.reset()
    print("Type an instruction (or a task name like 'open_drawer'); empty line to quit.")
    for line in sys.stdin:
        caption = line.strip()
        if not caption:
            break
        agent.reset()
        start = env.get_info()
        goal = {"lang": embed(caption)}
        obs = env.get_obs()
        done_task = None
        for t in range(args.ep_len):
            action = agent.step(obs, goal)
            obs, _, _, _ = env.step(action)
            if args.show:
                import cv2

                cv2.imshow("rgb_static", obs["rgb_obs"]["rgb_static"][:, :, ::-1])
                cv2.waitKey(1)
            detected = oracle.get_task_info_for_set(start, env.get_info(), TASK_NAMES)
            if detected:
                done_task = sorted(detected)[0]
                break
        print(f"-> {'completed ' + done_task if done_task else 'no task completed'} "
              f"({t + 1} steps)")
        print("next instruction:")
    return 0


if __name__ == "__main__":
    sys.exit(main())
