"""Affordance label mining: play data -> labeled (frame, pixel, depth, lang).

Counterpart of the reference's dataset-creation pipeline
(reference: hulc2/affordance/dataset_creation/data_labeler.py:26,
data_labeler_lang.py:17, core/utils.py:195 create_data_ep_split,
find_norm_values.py): replay recorded play frames, detect gripper
open->close interaction events, back-project the TCP interaction point into
the *past* static/gripper camera frames (so labels teach "where to go", not
"where you are"), attach a language annotation from the task oracle, split
into episodes, and compute depth normalization statistics.

Differences from the reference, by design:
- interaction *verification* uses the stored gripper-action signal (+ an
  optional pybullet contact check when calvin_env is installed) instead of
  requiring a simulator reset for every candidate
  (data_labeler_lang.py:28-44);
- language comes from the scene-obs task oracle + annotation bank rather
  than a pretrained classifier.

Output format == hulc2_tpu.affordance.dataset.AffordanceDataset (and the
reference PixeLabelDataLang): episodes_split.json + per-frame npz with
frame / centers / depth / lang_ann / tcp_pos_world_frame.
"""
from __future__ import annotations

import argparse
import json
import logging
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from hulc2_tpu.data.episode_index import load_ep_start_end_ids
from hulc2_tpu.data.frame_store import NpzFrameStore
from hulc2_tpu.envs.camera import PinholeCamera
from hulc2_tpu.envs.task_oracle import SceneObsTaskOracle
from hulc2_tpu.evaluation.tasks import TASK_NAMES
from hulc2_tpu.tools.annotations import sample_annotation

logger = logging.getLogger(__name__)

GRIPPER_CLOSED = -1.0
HIST_FRAMES = 8  # how many past frames receive each interaction label


def detect_interactions(gripper_actions: np.ndarray) -> List[int]:
    """Frame indices of open->close transitions (grasp starts)."""
    g = np.sign(np.asarray(gripper_actions))
    return [int(i) for i in np.where((g[1:] == GRIPPER_CLOSED) & (g[:-1] != GRIPPER_CLOSED))[0] + 1]


def contact_verified(frame: Dict, env=None) -> bool:
    """Optional pybullet contact check (reference: data_labeler_lang.py:28-44);
    without a simulator we accept the gripper-closure signal."""
    if env is None:
        return True
    import pybullet as p  # type: ignore

    env.reset(robot_obs=frame["robot_obs"], scene_obs=frame["scene_obs"])
    pts = np.array(p.getContactPoints())
    return len(pts) > 0 and (pts[:, 1] == env.robot.robot_uid).any()


def mine_labels(
    data_dir,
    out_dir,
    camera: PinholeCamera,
    split: str = "training",
    hist_frames: int = HIST_FRAMES,
    lang_window: int = 32,
    env=None,
    seed: int = 0,
    canonical_lang: bool = False,
    holdout_k: int = 0,
) -> Dict:
    """Produce labeled static-cam frames for one split."""
    data_dir, out_dir = Path(data_dir), Path(out_dir)
    keys = ["rgb_static", "depth_static", "robot_obs", "scene_obs", "rel_actions", "actions"]
    store = NpzFrameStore(data_dir, keys)
    ep_ids = load_ep_start_end_ids(data_dir, split)
    oracle = SceneObsTaskOracle()
    rng = np.random.default_rng(seed)

    episodes: Dict[str, List[str]] = defaultdict(list)
    depths: List[float] = []
    n_labels = 0
    for ep_i, (start, end) in enumerate(ep_ids):
        frames = [store.load_frame(i) for i in range(int(start), int(end) + 1)]
        grip = np.array([f["robot_obs"][-1] for f in frames])
        for t in detect_interactions(grip):
            f = frames[t]
            if not contact_verified(f, env):
                continue
            tcp_world = np.asarray(f["robot_obs"][:3], np.float64)
            # language: which task completes around this interaction?
            t_end = min(t + lang_window, len(frames) - 1)
            done = oracle.get_task_info_for_set(
                {"scene_obs": frames[max(t - 4, 0)]["scene_obs"]},
                {"scene_obs": frames[t_end]["scene_obs"]},
                TASK_NAMES,
            )
            # canonical_lang pins each task to its single validation-bank
            # phrasing — required when downstream embeddings are hash-based
            # (paraphrases would hash to unrelated vectors, so the eval-time
            # canonical sentence would be out-of-distribution)
            lang_ann = (
                sample_annotation(sorted(done)[0], rng, validation=canonical_lang,
                                  holdout_k=holdout_k)
                if done else ""
            )
            # back-project into past static frames
            for k in range(max(t - hist_frames, 0), t):
                fk = frames[k]
                uv = camera.project(tcp_world)
                u, v = int(round(uv[0])), int(round(uv[1]))
                h, w = fk["rgb_static"].shape[:2]
                if not (0 <= u < w and 0 <= v < h):
                    continue
                cam_pt = camera.T_cam_world @ np.append(tcp_world, 1.0)
                depth = float(cam_pt[2])
                ep_name = f"episode_{ep_i:02d}"
                fname = f"frame_{int(start) + k:07d}"
                fdir = out_dir / ep_name / "data" / "static_cam"
                fdir.mkdir(parents=True, exist_ok=True)
                np.savez(
                    fdir / f"{fname}.npz",
                    frame=fk["rgb_static"],
                    centers=np.array([[0, v, u]]),
                    depth=np.float32(depth),
                    lang_ann=lang_ann,
                    tcp_pos_world_frame=tcp_world,
                )
                episodes[ep_name].append(fname)
                depths.append(depth)
                n_labels += 1
    logger.info("%s: mined %d labels from %d episodes", split, n_labels, len(ep_ids))
    return {"episodes": dict(episodes), "depths": depths}


def create_split_file(out_dir, mined: Dict[str, Dict], val_fraction: float = 0.1) -> Dict:
    """episodes_split.json with depth norm values
    (reference: core/utils.py:195, find_norm_values.py)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)  # 0-label mining creates no episode dirs
    info: Dict = {"training": {}, "validation": {}}
    all_depths: List[float] = []
    for split, data in mined.items():
        for ep, files in data["episodes"].items():
            info[split][ep] = {"static_cam": files}
        all_depths.extend(data["depths"])
    if not info["validation"] and len(info["training"]) > 1:
        # tail-split training episodes into validation (never drain training)
        eps = sorted(info["training"])
        n_val = min(max(1, int(len(eps) * val_fraction)), len(eps) - 1)
        for ep in eps[-n_val:]:
            info["validation"][ep] = info["training"].pop(ep)
    d = np.asarray(all_depths) if all_depths else np.asarray([0.0, 1.0])
    info["norm_values"] = {
        "depth": {"static_cam": {"mean": float(d.mean()), "std": float(max(d.std(), 1e-6))}}
    }
    (out_dir / "episodes_split.json").write_text(json.dumps(info, indent=1))
    return info


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir", help="play dataset root (training/ + validation/)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--cam-params", default=None, help="json with width,height,fx,fy,cx,cy,T_world_cam")
    p.add_argument("--canonical-lang", action="store_true",
                   help="pin labels to each task's canonical phrasing (hash-embedding runs)")
    p.add_argument("--holdout-paraphrases", type=int, default=0,
                   help="exclude the last K paraphrases per task from label "
                        "annotations (match the play dataset's holdout so the "
                        "paraphrase-eval sentences stay unseen by BOTH models)")
    args = p.parse_args(argv)
    if args.cam_params:
        cam = PinholeCamera.from_params(**json.loads(Path(args.cam_params).read_text()))
    else:
        # derive the camera from the dataset itself: frames generated by
        # FakeCalvinEnv carry its static camera, whose intrinsics scale with
        # the frame size (fx = 1.15*hw, cx = hw/2 — envs/fake_env.py). The
        # old fixed 200px default mis-projected 96px datasets (fx 200 vs
        # 110.4): interaction points landed at wrong pixels or outside the
        # frame entirely (r4 mined 13.8k labels with a systematic offset the
        # eval-time deprojection then inverted with the CORRECT camera).
        cam = None
        for split in ("training", "validation"):
            d = Path(args.data_dir) / split
            frames = sorted(d.glob("episode_*.npz")) if d.is_dir() else []
            if frames:
                hw = int(np.load(frames[0])["rgb_static"].shape[0])
                from hulc2_tpu.envs.fake_env import FakeCalvinEnv

                cam = FakeCalvinEnv(static_hw=hw, gripper_hw=hw).cameras[0]
                logger.info("camera derived from %dpx dataset frames: fx=%.1f", hw, cam.K[0, 0])
                break
        if cam is None:
            cam = PinholeCamera.from_params(200, 200, 200.0, 200.0, 100.0, 100.0)
    mined = {}
    for split in ("training", "validation"):
        if (Path(args.data_dir) / split).is_dir():
            mined[split] = mine_labels(Path(args.data_dir) / split, args.out_dir, cam, split,
                                       canonical_lang=args.canonical_lang,
                                       holdout_k=args.holdout_paraphrases)
    create_split_file(args.out_dir, mined)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
