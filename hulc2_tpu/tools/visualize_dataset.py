"""Dataset viewers: play through recorded frames with overlays.

Counterparts of the reference's viz scripts
(reference: hulc2/utils/visualize_calvin_dataset.py, visualize_real_data.py,
hulc2/affordance/test_affordance.py:27): step through a play dataset (cameras
+ action/gripper readouts), or preview affordance labels / model predictions.
Writes mp4s headlessly with --out; shows cv2 windows with --show.
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np

from hulc2_tpu.utils.img_utils import add_img_text, draw_marker, heatmap_overlay

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def iter_play_frames(data_dir, start: int = None, end: int = None):
    from hulc2_tpu.data.episode_index import load_ep_start_end_ids
    from hulc2_tpu.data.frame_store import NpzFrameStore

    data_dir = Path(data_dir)
    split = data_dir.name if data_dir.name in ("training", "validation") else "training"
    ep_ids = load_ep_start_end_ids(data_dir, split)
    store = NpzFrameStore(data_dir, ["rgb_static", "rgb_gripper", "robot_obs", "rel_actions"])
    for s, e in ep_ids:
        s = max(int(s), start) if start is not None else int(s)
        e = min(int(e), end) if end is not None else int(e)
        for i in range(s, e + 1):
            yield i, store.load_frame(i)


def render_play_frame(idx: int, frame: dict, annotation: str = None) -> np.ndarray:
    import cv2

    img = frame["rgb_static"][:, :, ::-1].copy()
    if "rgb_gripper" in frame:
        g = cv2.resize(frame["rgb_gripper"][:, :, ::-1], (img.shape[1] // 3, img.shape[0] // 3))
        img[: g.shape[0], -g.shape[1]:] = g
    grip = float(frame["robot_obs"][-1])
    text = f"frame {idx}  gripper {'closed' if grip < 0 else 'open'}"
    if annotation:
        text += f"  |  {annotation}"
    return add_img_text(img, text)


def load_annotation_spans(data_dir, lang_folder: str = "lang_annotations"):
    """frame idx -> active language annotation, from auto_lang_ann.npy
    (the reference's visualize_annotations.py role). Empty when unannotated."""
    f = Path(data_dir) / lang_folder / "auto_lang_ann.npy"
    if not f.exists():
        return {}
    data = np.load(f, allow_pickle=True).item()
    spans = {}
    for (s, e), ann in zip(data["info"]["indx"], data["language"]["ann"]):
        for i in range(int(s), int(e) + 1):
            spans.setdefault(i, ann)
    return spans


def visualize_play(data_dir, out: str = None, show: bool = False, fps: int = 15, limit: int = 600):
    spans = load_annotation_spans(data_dir)
    frames = []
    for n, (idx, frame) in enumerate(iter_play_frames(data_dir)):
        img = render_play_frame(idx, frame, annotation=spans.get(idx))
        if show:
            import cv2

            cv2.imshow("dataset", img)
            cv2.waitKey(1)
        frames.append(img[:, :, ::-1])
        if n + 1 >= limit:
            break
    if out:
        import imageio

        imageio.mimwrite(out, frames, fps=fps, macro_block_size=1)
        logger.info("wrote %s (%d frames)", out, len(frames))


def visualize_affordance(data_dir, train_dir: str = None, out_dir: str = None,
                         show: bool = False, n: int = 16):
    """Preview affordance labels (and predictions when --train-dir is given)
    — the reference test_affordance.py role."""
    from hulc2_tpu.affordance.dataset import AffordanceDataset
    from hulc2_tpu.tools.auto_lang_annotator import hash_embed

    predictor, lang_dim = None, 384
    if train_dir:
        import jax

        from hulc2_tpu.affordance.detector import AffordancePredictor
        from hulc2_tpu.affordance.train_affordance import build_detector
        from hulc2_tpu.core.checkpoint import CheckpointManager, load_run_config

        cfg = load_run_config(train_dir)
        model = build_detector(cfg["aff_detection"])
        ckpt = CheckpointManager(train_dir)
        img_hw = cfg["aff_detection"]["dataset"]["img_resize"][cfg["aff_detection"]["dataset"]["cam"]]
        lang_dim = cfg["aff_detection"]["lang_embed_dim"]
        # restore raw variable dict
        variables = ckpt.restore(
            jax.jit(lambda r, i, l: model.init(r, i, l, False))(
                jax.random.PRNGKey(0),
                np.zeros((1, img_hw, img_hw, 3), np.float32),
                np.zeros((1, lang_dim), np.float32))
        )
        predictor = AffordancePredictor(model, variables, input_hw=(img_hw, img_hw))
        logger.warning("predictions use stub hash embeddings of the captions — "
                       "qualitative viz only (a real eval supplies the model's "
                       "own language embeddings)")
    ds = AffordanceDataset(data_dir, "validation",
                           lang_embedder=lambda s: hash_embed([s], dim=lang_dim)[0])

    out_dir = Path(out_dir or "aff_viz")
    out_dir.mkdir(parents=True, exist_ok=True)
    errors = []  # per-sample pixel/depth errors (reference get_aff_preds.py errors.json role)
    for i in range(min(n, len(ds))):
        s = ds[i]
        img = s["frame"].copy()
        # ground-truth label (green-ish marker via draw)
        px_gt = s["px"]
        gt_xy = (int(px_gt[1] * img.shape[1] / 224), int(px_gt[0] * img.shape[0] / 224))
        img = draw_marker(img, gt_xy)
        caption = "gt label"
        if predictor is not None:
            pred = predictor.predict(s["frame"], s["lang"])
            img = heatmap_overlay(img, pred["softmax"], alpha=0.5)
            img = draw_marker(img, pred["pixel"])
            caption = f"pred depth {pred.get('depth', 0):.3f}"
            err = {
                "sample": i,
                "px_error": float(np.hypot(pred["pixel"][0] - gt_xy[0], pred["pixel"][1] - gt_xy[1])),
            }
            # AffordanceDataset emits depth=0.0 when the npz has no stored
            # depth label — comparing against that placeholder would report
            # |pred| as an "error"; a real camera depth is never exactly 0
            if "depth" in pred and float(s.get("depth", 0.0)) != 0.0:
                err["depth_error"] = abs(float(pred["depth"]) - float(s["depth"]))
            errors.append(err)
        img = add_img_text(img, caption)
        if show:
            import cv2

            cv2.imshow("affordance", img[:, :, ::-1])
            cv2.waitKey(0)
        else:
            import imageio

            imageio.imwrite(out_dir / f"sample_{i:03d}.png", img)
    if errors:
        import json

        summary = {
            "mean_px_error": float(np.mean([e["px_error"] for e in errors])),
            "median_px_error": float(np.median([e["px_error"] for e in errors])),
            "samples": errors,
        }
        d_errs = [e["depth_error"] for e in errors if "depth_error" in e]
        if d_errs:
            summary["mean_depth_error"] = float(np.mean(d_errs))
        (out_dir / "errors.json").write_text(json.dumps(summary, indent=2))
        logger.info("mean px error %.1f over %d samples", summary["mean_px_error"], len(errors))
    logger.info("affordance previews in %s", out_dir)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("play")
    v.add_argument("data_dir")
    v.add_argument("--out", default=None)
    v.add_argument("--show", action="store_true")
    v.add_argument("--limit", type=int, default=600)
    a = sub.add_parser("affordance")
    a.add_argument("data_dir")
    a.add_argument("--train-dir", default=None)
    a.add_argument("--out-dir", default=None)
    a.add_argument("--show", action="store_true")
    a.add_argument("-n", type=int, default=16)
    args = p.parse_args(argv)
    if args.cmd == "play":
        visualize_play(args.data_dir, args.out, args.show, limit=args.limit)
    else:
        visualize_affordance(args.data_dir, args.train_dir, args.out_dir, args.show, args.n)


if __name__ == "__main__":
    sys.exit(main())
