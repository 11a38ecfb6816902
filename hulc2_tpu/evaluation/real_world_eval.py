"""Combined real-world evaluation: type an instruction, affordance-guided
approach, then the policy rollout on the Franka Panda.

Public-entry equivalent of the reference's
``python hulc2/rollout/real_world_eval_combined.py``
(reference: hulc2/rollout/real_world_eval_combined.py:69-171): an interactive
loop where each typed instruction triggers (1) an affordance prediction +
clipped staged approach near the deprojected 3D point and (2) up to
``--ep-len`` policy steps at the robot control rate — here through ONE jitted
policy dispatch per step (RealWorldAgent) instead of per-module tensor hops.

    python -m hulc2_tpu.evaluation.real_world_eval \
        --train-dir runs/<policy> --aff-train-dir runs/<affordance> \
        --dataset-path /data/taco --camera-calib calib.json

robot_io is an optional host dependency; ``--env-factory mod:fn`` injects any
object with the PandaLfpWrapper surface (used by tests with a fake robot).
"""
from __future__ import annotations

import argparse
import importlib
import json
import logging
import sys
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger(__name__)

# neutral downward orientation + the y>0.4 rotated grip of the reference
# (real_world_eval_combined.py:86-103)
TARGET_ORN = np.array([-3.11, 0.047, 0.027])
ROTATE_ORN = np.array([3.12, -0.022, 1.38])


def load_camera(calib_path) -> "object":
    """PinholeCamera from a JSON calib {width, height, K, T_world_cam}."""
    from hulc2_tpu.envs.camera import PinholeCamera

    d = json.loads(Path(calib_path).read_text())
    return PinholeCamera(
        int(d["width"]), int(d["height"]),
        np.asarray(d["K"], np.float64), np.asarray(d["T_world_cam"], np.float64),
        d.get("name", "static"),
    )


def build_agent(args):
    from hulc2_tpu.agents.real_world_agent import RealWorldAgent
    from hulc2_tpu.data.statistics import load_statistics
    from hulc2_tpu.evaluation.loading import load_affordance, load_policy

    model, params, cfg = load_policy(args.train_dir, args.checkpoint)
    stats = (load_statistics(Path(args.dataset_path) / "training")
             if args.dataset_path else None)

    affordance = None
    if args.aff_train_dir:
        affordance = load_affordance(args.aff_train_dir, args.aff_checkpoint)

    if args.env_factory:
        mod, fn = args.env_factory.rsplit(":", 1)
        env = getattr(importlib.import_module(mod), fn)()
    else:
        from hulc2_tpu.envs.panda_wrapper import PandaLfpWrapper

        cams = [load_camera(args.camera_calib)] if args.camera_calib else []
        env = PandaLfpWrapper(cameras=cams, freq_hz=args.freq_hz)

    static_camera = load_camera(args.camera_calib) if args.camera_calib else None
    agent = RealWorldAgent(
        env, model, params, cfg["datamodule"], stats,
        affordance=affordance, static_camera=static_camera,
        target_orn=TARGET_ORN,
    )
    return agent, cfg


def embed_factory(args, cfg):
    """caption -> policy goal embedding (tokens for the in-graph tower,
    table lookup otherwise)."""
    if (cfg["model"].get("language_encoder") or {}).get("_name_") == "clip_text":
        from hulc2_tpu.utils.clip_tokenizer import tokenize

        return lambda s: np.asarray(tokenize([s])[0])
    from hulc2_tpu.evaluation.evaluate_policy import load_lang_embeddings

    table, _ = load_lang_embeddings(args.dataset_path, args.lang_folder)
    def embed(s):
        if s not in table:
            raise KeyError(f"{s!r} not in the embeddings table — policies without "
                           "the in-graph text tower only understand annotated sentences")
        return np.asarray(table[s], np.float32)
    return embed


def rollout(agent, caption: str, goal_emb, ep_len: int, move_robot: bool, show: bool):
    """One instruction: affordance approach (inside agent.reset) + policy
    loop (reference rollout(), real_world_eval_combined.py:76-83)."""
    agent.reset(caption if agent.affordance is not None else None)
    goal = {"lang": goal_emb}
    obs = agent.env.get_obs()
    for step in range(ep_len):
        action = agent.step(obs, goal)
        if move_robot:
            obs, _, _, _ = agent.env.step(action)
        if show:
            import cv2

            cv2.imshow("rgb_static", obs["rgb_obs"]["rgb_static"][..., ::-1])
            if cv2.waitKey(1) == 27:  # ESC stops the rollout
                return


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-dir", required=True)
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--aff-train-dir", default=None)
    p.add_argument("--aff-checkpoint", type=int, default=None)
    p.add_argument("--aff-lang-embeddings", default=None,
                   help="npy table for the affordance tower (dims must match)")
    p.add_argument("--dataset-path", default=None, help="TACO dataset root (stats + embeddings)")
    p.add_argument("--lang-folder", default="lang_annotations")
    p.add_argument("--camera-calib", default=None, help="JSON {width,height,K,T_world_cam}")
    p.add_argument("--ep-len", type=int, default=300)
    p.add_argument("--freq-hz", type=int, default=15)
    p.add_argument("--no-move", action="store_true", help="dry run: never command the robot")
    p.add_argument("--show", action="store_true", help="cv2 preview windows")
    p.add_argument("--env-factory", default=None, help="mod:fn returning an env (tests)")
    args = p.parse_args(argv)

    agent, cfg = build_agent(args)
    if agent.affordance is not None and args.aff_lang_embeddings:
        from hulc2_tpu.evaluation.evaluate_policy import load_lang_embeddings_file

        table, _ = load_lang_embeddings_file(Path(args.aff_lang_embeddings))
        agent.affordance.lang_table = {k: np.asarray(v, np.float32) for k, v in table.items()}
    embed = embed_factory(args, cfg)

    print("Type an instruction (empty line to quit).")
    for line in sys.stdin:
        caption = line.strip()
        if not caption:
            break
        try:
            rollout(agent, caption, embed(caption), args.ep_len, not args.no_move, args.show)
        except KeyError as e:
            print(e)
    return agent


if __name__ == "__main__":
    main(sys.argv[1:])
