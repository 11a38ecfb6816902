"""Checkpoint/model loading for evaluation.

Counterpart of the reference's PolicyManager model loading
(reference: hulc2/evaluation/manager_aff_lmp.py:81-155, utils/utils.py:184-231):
a trained run dir's ``config.json`` is the serialized model spec; the newest
(or a named) orbax step under ``saved_models/`` provides the parameters.
Also supports loading converted PyTorch-Lightning checkpoints (.ckpt) through
``hulc2_tpu.utils.convert``.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hulc2_tpu.core.checkpoint import CheckpointManager, load_run_config
from hulc2_tpu.models.build import build_policy
from hulc2_tpu.models.hulc2 import Hulc2

logger = logging.getLogger(__name__)

# post-transform camera resolutions (rand_shift preset fallback)
_CAM_HW = {"rgb_static": 200, "rgb_gripper": 84, "rgb_tactile": 64,
           "depth_static": 200, "depth_gripper": 84}


def _cam_hw(dm: dict) -> dict:
    """Per-camera post-transform resolution from the RUN's transform preset
    (the parameter shapes depend on it — a 96px run's conv flatten dims
    differ from the 200px default); falls back to the rand_shift sizes."""
    from hulc2_tpu.data.device_transforms import TRANSFORM_PRESETS

    hw = dict(_CAM_HW)
    preset = TRANSFORM_PRESETS.get(dm.get("transforms", "rand_shift"), {})
    for cam, pipeline in preset.get("val", {}).items():
        for op in pipeline:
            if op.get("op") == "resize":
                hw[cam] = int(op["size"])
    return hw


def dummy_model_batch(cfg: dict, b: int = 1, s: int = 2):
    """Shape-correct transformed batch for parameter-shape initialization."""
    dm = cfg["datamodule"]
    obs = dm["observation_space"]
    cam_hw = _cam_hw(dm)
    proprio_dim = sum(hi - lo for lo, hi in dm["proprioception_dims"]["keep_indices"])
    batch = {
        "rgb_obs": {
            cam: jnp.zeros((b, s, cam_hw[cam], cam_hw[cam], 3), jnp.float32)
            for cam in obs["rgb_obs"]
        },
        "depth_obs": {
            cam: jnp.zeros((b, s, cam_hw[cam], cam_hw[cam]), jnp.float32)
            for cam in obs["depth_obs"]
        },
        "robot_obs": jnp.zeros((b, s, proprio_dim), jnp.float32),
        "actions": jnp.zeros((b, s, dm["action_space"]), jnp.float32),
        "robot_obs_raw": jnp.zeros((b, s, 15), jnp.float32),
    }
    le = cfg["model"].get("language_encoder") or {}
    if le.get("_name_") == "clip_text":  # in-graph tower: "lang" is token ids
        lang_value = jnp.zeros((b, le.get("context_length", 77)), jnp.int32)
    else:
        lang_value = jnp.zeros(
            (b, cfg["model"].get("language_goal", {}).get("in_features", 384)), jnp.float32
        )
    lang = {
        **jax.tree_util.tree_map(lambda x: x, batch),
        "lang": lang_value,
        "use_for_aux_lang_loss": jnp.zeros((b,), bool),
    }
    if cfg["model"].get("use_lang_task_auxiliary_loss"):
        # the LangTaskHead only materializes params when labels are present —
        # the template must include them or checkpoint restore fails with a
        # tree mismatch
        lang["lang_task_id"] = jnp.zeros((b,), jnp.int32)
    return {"vis": batch, "lang": lang}


def init_params(model: Hulc2, cfg: dict):
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    # jitted init: one cacheable XLA program instead of thousands of eager op
    # dispatches (~15x faster with a warm persistent compilation cache)
    return jax.jit(model.init)(rngs, dummy_model_batch(cfg))


def load_policy(run_dir, step: Optional[int] = None) -> Tuple[Hulc2, dict, dict]:
    """(model, params, cfg) from a training run directory."""
    run_dir = Path(run_dir)
    cfg = load_run_config(run_dir)
    model = build_policy(cfg["model"])
    template = init_params(model, cfg)
    ckpt = CheckpointManager(run_dir)
    from hulc2_tpu.train.state import TrainState
    from hulc2_tpu.train import optim

    tx = optim.make_optimizer(cfg["model"]["optimizer"], None, 1)
    state_template = TrainState(template, tx.init(template), jnp.zeros((), jnp.int32))
    restored = ckpt.restore(state_template, step)
    if restored is None:
        raise FileNotFoundError(f"no checkpoints under {run_dir}/saved_models")
    logger.info("loaded step %d from %s", int(restored.step), run_dir)
    return model, restored.params, cfg


def load_affordance(run_dir, step: Optional[int] = None, lang_table=None, seed: int = 0):
    """AffordancePredictor from an affordance training run directory — the
    ``--aff_train_folder`` loading path of the reference PolicyManager
    (reference: hulc2/evaluation/manager_aff_lmp.py:139-155,
    utils/utils.py:184-231): run config is the model spec, newest (or named)
    orbax step provides params + batch_stats, depth-norm stats come from the
    persisted run config."""
    from hulc2_tpu.affordance.depth_heads import DepthNorm
    from hulc2_tpu.affordance.detector import AffordancePredictor
    from hulc2_tpu.affordance.train_affordance import build_detector

    run_dir = Path(run_dir)
    cfg = load_run_config(run_dir)
    aff_cfg = cfg["aff_detection"]
    model = build_detector(aff_cfg)
    img_hw = aff_cfg["dataset"]["img_resize"][aff_cfg["dataset"]["cam"]]
    lang_template = (
        jnp.zeros((1, 77), jnp.int32)  # token-tower models take CLIP-BPE ids
        if aff_cfg.get("text_tower")
        else jnp.zeros((1, aff_cfg["lang_embed_dim"]), jnp.float32)
    )
    template = jax.jit(lambda r, i, l: model.init(r, i, l, False))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, img_hw, img_hw, 3), jnp.float32),
        lang_template,
    )
    state_template = {"params": template["params"],
                      "batch_stats": template.get("batch_stats", {})}
    restored = CheckpointManager(run_dir).restore(state_template, step)
    if restored is None:
        raise FileNotFoundError(f"no checkpoints under {run_dir}/saved_models")
    depth_norm = DepthNorm(**cfg.get("depth_norm", {}))
    logger.info("loaded affordance model from %s", run_dir)
    return AffordancePredictor(
        model,
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        depth_norm,
        (img_hw, img_hw),
        seed=seed,
        lang_table=lang_table,
    )


def load_policy_from_torch_ckpt(ckpt_path, cfg: dict) -> Tuple[Hulc2, dict]:
    """(model, params) from a reference PyTorch-Lightning .ckpt
    (the fidelity path, BASELINE.md)."""
    from hulc2_tpu.utils import convert

    model = build_policy(cfg["model"])
    sd, _ = convert.load_lightning_checkpoint(ckpt_path)
    params = convert.convert_hulc2_checkpoint(sd, cfg["model"])
    return model, jax.tree_util.tree_map(jnp.asarray, params)
