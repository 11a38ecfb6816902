"""Standalone depth-estimation trainer.

TPU-native counterpart of the reference's depth-only training path
(reference: hulc2/affordance/models/depth/depth_module.py:12 — a standalone
LightningModule over encoder bottleneck ⊕ language — and its
``train_depth.py`` CLI): trains ONLY the depth distribution head on labeled
affordance frames, logging depth NLL and absolute depth error in meters.

    python -m hulc2_tpu.affordance.train_depth --synthetic --max-steps 5

Implementation: the same fused ``AffordanceDetector`` graph with the
affordance-loss weight at 0 and the encoder trainable, so the depth stream's
ResNet features are learned end-to-end — one jitted program on TPU, no
separate model family to maintain.
"""
from __future__ import annotations

import argparse
import sys

from hulc2_tpu.affordance import train_affordance as _ta


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--run-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    overrides = [
        # depth-only objective; keep the encoder trainable (depth_module.py
        # finetunes its own ResNet trunk)
        "aff_detection.loss_weights.aff=0.0",
        "aff_detection.loss_weights.depth=1.0",
        "aff_detection.freeze_encoder=false",
        *args.overrides,
    ]
    _ta.train(overrides, args.max_epochs, args.max_steps, args.synthetic, args.run_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
