"""Policy training entry point.

Public-entry equivalent of the reference's ``python hulc2/training.py``
(reference: hulc2/training.py:31-82) with the same ergonomics:

    python -m hulc2_tpu.training \
        datamodule.root_data_dir=/path/to/calvin/task_D_D \
        model/distribution=continuous loss.kl_beta=0.05

Composes ``cfg_low_level`` (or ``--config-name cfg_gcbc``), sets up the
datamodule, builds the model and runs the Trainer with auto-resume.
"""
from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger(__name__)


def make_run_dir(log_dir: str, overrides) -> Path:
    """runs/<date>/<time>[_overrides] (reference: conf/cfg_low_level.yaml:20-37)."""
    stamp = time.strftime("%Y-%m-%d/%H-%M-%S")
    tag = "_".join(o.replace("/", ".") for o in overrides)[:80]
    return Path(log_dir) / stamp / (tag or "run")


def train(config_name: str = "cfg_low_level", overrides=(), max_epochs=None, max_steps=None,
          synthetic: bool = False, run_dir=None, use_shm_cache: bool = False):
    import hulc2_tpu.configs  # noqa: F401
    from hulc2_tpu.core import config as cfg_lib
    from hulc2_tpu.data.datamodule import Hulc2DataModule, RandomDataModule
    from hulc2_tpu.parallel import mesh as mesh_lib
    from hulc2_tpu.train.trainer import Trainer

    mesh_lib.initialize_distributed()
    cfg = cfg_lib.compose(config_name, list(overrides))
    run_dir = Path(run_dir) if run_dir else make_run_dir(cfg.get("log_dir", "runs"), overrides)

    dm_cls = RandomDataModule if synthetic else Hulc2DataModule
    if synthetic and (cfg["model"].get("language_encoder") or {}).get("_name_") == "clip_text":
        cfg["datamodule"]["synthetic_lang_tokens"] = True  # tower consumes token ids
    dm = dm_cls(
        cfg["datamodule"],
        seed=cfg.get("seed", 42),
        use_shm_cache=use_shm_cache,
        process_index=mesh_lib.process_index(),
        process_count=mesh_lib.process_count(),
    )
    dm.setup()
    from hulc2_tpu.train.callback_factory import build_callbacks

    # real annotation embeddings for rollout-callback goals when the dataset
    # ships an embeddings.npy (reference: LangEmbeddings, evaluation/utils.py:88);
    # without it the callbacks refuse stub embeddings unless explicitly allowed
    lang_embeddings = None
    if not synthetic:
        emb_file = (Path(cfg["datamodule"]["root_data_dir"]) / "validation"
                    / cfg["datamodule"].get("lang_folder", "lang_annotations")
                    / "embeddings.npy")
        if emb_file.exists():
            import numpy as np

            data = np.load(emb_file, allow_pickle=True).item()
            lang_embeddings = {v["ann"][0]: np.asarray(v["emb"]).squeeze()
                               for v in data.values()}
    callbacks = build_callbacks(cfg, run_dir, lang_embeddings)
    trainer = Trainer(cfg, dm, run_dir, callbacks=callbacks)
    return trainer.fit(max_epochs=max_epochs, max_steps=max_steps)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="cfg_low_level")
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--run-dir", default=None)
    parser.add_argument("--synthetic", action="store_true", help="random-tensor datamodule (smoke test)")
    parser.add_argument("--shm-cache", action="store_true",
                        help="preload the dataset into a shared-memory RAM cache")
    parser.add_argument("--debug-nans", action="store_true",
                        help="numeric sanitizer: re-run any jitted step that produces "
                             "NaN un-jitted and raise at the originating op "
                             "(the reference's NaN asserts, e.g. gripper_control.py:35)")
    parser.add_argument("overrides", nargs="*", help="key=value / group=option overrides")
    args = parser.parse_args(argv)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
        # also insert host-side finite assertions into the TCP-frame math
        # (reference gripper_control.py:35,62) — catches bad euler/proprio
        # inputs at the call site even before they hit a jit boundary
        from hulc2_tpu.ops.gripper_frame import enable_finite_checks

        enable_finite_checks(True)
    train(args.config_name, args.overrides, args.max_epochs, args.max_steps, args.synthetic,
          args.run_dir, use_shm_cache=args.shm_cache)


if __name__ == "__main__":
    main(sys.argv[1:])
