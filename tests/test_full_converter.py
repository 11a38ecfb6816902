"""Full-model checkpoint conversion test.

Builds a torch state_dict with the reference Hulc2's exact parameter naming
(reference module tree: hulc2/models/hulc2.py:71-99 — perceptual_encoder.
rgb_static_encoder / plan_proposal.fc_model / plan_recognition.transformer_
encoder.layers / action_decoder.rnn / ... ) at reduced widths, converts it
with ``convert_hulc2_checkpoint``, and asserts the resulting tree matches the
flax model's init tree leaf-for-leaf (paths + shapes) and loads into a
working forward pass. Per-block numerics are covered by
tests/test_torch_parity.py / test_resnet.py; this closes the naming layer.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import hulc2_tpu.configs  # noqa: F401
from hulc2_tpu.core import config as cfg_lib  # noqa: E402
from hulc2_tpu.models.build import build_policy  # noqa: E402
from hulc2_tpu.utils.convert import convert_hulc2_checkpoint  # noqa: E402

H = 32  # reduced hidden size for test speed


def reference_named_state_dict() -> dict:
    """torch modules mirroring the reference's parameter names (small dims)."""
    sd = {}

    def add(prefix, module):
        for k, v in module.state_dict().items():
            sd[f"{prefix}.{k}"] = v

    # perceptual_encoder.rgb_static_encoder: VisionNetwork
    add("perceptual_encoder.rgb_static_encoder.conv_model.0", tnn.Conv2d(3, 32, 8, 4))
    add("perceptual_encoder.rgb_static_encoder.conv_model.2", tnn.Conv2d(32, 64, 4, 2))
    add("perceptual_encoder.rgb_static_encoder.conv_model.4", tnn.Conv2d(64, 64, 3, 1))
    add("perceptual_encoder.rgb_static_encoder.fc1.0", tnn.Linear(128, 512))
    add("perceptual_encoder.rgb_static_encoder.fc2", tnn.Linear(512, 64))
    add("perceptual_encoder.rgb_static_encoder.ln", tnn.LayerNorm(64))
    # perceptual_encoder.rgb_gripper_encoder: nature_cnn
    add("perceptual_encoder.rgb_gripper_encoder.conv_model.0", tnn.Conv2d(3, 32, 8, 4))
    add("perceptual_encoder.rgb_gripper_encoder.conv_model.2", tnn.Conv2d(32, 64, 4, 2))
    add("perceptual_encoder.rgb_gripper_encoder.conv_model.4", tnn.Conv2d(64, 64, 3, 1))
    add("perceptual_encoder.rgb_gripper_encoder.conv_model.7", tnn.Linear(64 * 2 * 2, 128))
    add("perceptual_encoder.rgb_gripper_encoder.fc1.0", tnn.Linear(128, 512))
    add("perceptual_encoder.rgb_gripper_encoder.fc2", tnn.Linear(512, 64))
    add("perceptual_encoder.rgb_gripper_encoder.ln", tnn.LayerNorm(64))
    # plan_proposal: 4x fc + fc_state (in 128+32, out 1024)
    for i, (fin, fout) in enumerate([(160, H), (H, H), (H, H), (H, H)]):
        add(f"plan_proposal.fc_model.{2 * i}", tnn.Linear(fin, fout))
    add("plan_proposal.fc_state.0", tnn.Linear(H, 1024))
    # plan_recognition transformer (2 layers, in 128)
    sd["plan_recognition.position_embeddings.weight"] = torch.randn(8, 128)
    for i in range(2):
        layer = tnn.TransformerEncoderLayer(128, 8, dim_feedforward=H, dropout=0.0)
        add(f"plan_recognition.transformer_encoder.layers.{i}", layer)
    add("plan_recognition.fc", tnn.Linear(128, H))
    add("plan_recognition.fc_state.0", tnn.Linear(H, 1024))
    # goal encoders
    for i, (fin, fout) in enumerate([(128, H), (H, H), (H, 32)]):
        add(f"visual_goal.mlp.{2 * i}", tnn.Linear(fin, fout))
    add("visual_goal.ln", tnn.LayerNorm(32))
    for i, (fin, fout) in enumerate([(384, H), (H, H), (H, 32)]):
        add(f"language_goal.mlp.{2 * i + 1}", tnn.Linear(fin, fout))
    add("language_goal.ln", tnn.LayerNorm(32))
    # action decoder: 2-layer RNN (in 64+32+1024=1120)
    rnn = tnn.RNN(1120, H, 2, nonlinearity="relu", batch_first=True)
    add("action_decoder.rnn", rnn)
    add("action_decoder.mean_fc", tnn.Linear(H, 60))
    add("action_decoder.log_scale_fc", tnn.Linear(H, 60))
    add("action_decoder.prob_fc", tnn.Linear(H, 60))
    add("action_decoder.gripper_fc", tnn.Linear(H, 2))
    # clip aux
    sd["logit_scale"] = torch.tensor(2.659)
    add("proj_vis_lang.mlp_im.0", tnn.Linear(H, 128))
    add("proj_vis_lang.mlp_im.2", tnn.Linear(128, 32))
    add("proj_vis_lang.mlp_lang.0", tnn.Linear(32, 128))
    add("proj_vis_lang.mlp_lang.2", tnn.Linear(128, 32))
    return sd


def tree_paths_and_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = tuple(np.shape(leaf))
    return out


@pytest.mark.slow
def test_full_checkpoint_conversion_matches_init_tree():
    overrides = [
        "model.compute_dtype=float32",
        f"model.plan_proposal.hidden_size={H}",
        f"model.plan_recognition.encoder_hidden_size={H}",
        f"model.plan_recognition.fc_hidden_size={H}",
        f"model.action_decoder.hidden_size={H}",
        f"model.visual_goal.hidden_size={H}",
        f"model.language_goal.hidden_size={H}",
        "datamodule.max_window_size=8",
    ]
    cfg = cfg_lib.compose("cfg_low_level", overrides)
    model = build_policy(cfg["model"])

    # init tree: gripper cam at 44x44 so the nature trunk flattens to 64*2*2
    rng = np.random.RandomState(0)
    batch = {
        "vis": {
            "rgb_obs": {
                "rgb_static": jnp.asarray(rng.rand(1, 2, 84, 84, 3), jnp.float32),
                "rgb_gripper": jnp.asarray(rng.rand(1, 2, 44, 44, 3), jnp.float32),
            },
            "depth_obs": {},
            "robot_obs": jnp.zeros((1, 2, 8), jnp.float32),
            "actions": jnp.zeros((1, 2, 7), jnp.float32),
            "robot_obs_raw": jnp.zeros((1, 2, 15), jnp.float32),
        },
        "lang": None,
    }
    batch["lang"] = {**jax.tree_util.tree_map(lambda x: x, batch["vis"]),
                     "lang": jnp.zeros((1, 384), jnp.float32),
                     "use_for_aux_lang_loss": jnp.zeros((1,), bool)}
    init_tree = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch,
    )

    sd = reference_named_state_dict()
    converted = convert_hulc2_checkpoint(sd, cfg["model"])

    a = tree_paths_and_shapes(init_tree)
    b = tree_paths_and_shapes(jax.tree_util.tree_map(jnp.asarray, converted))
    missing = sorted(set(a) - set(b))
    extra = sorted(set(b) - set(a))
    assert not missing, f"converter missing leaves: {missing[:8]}"
    assert not extra, f"converter extra leaves: {extra[:8]}"
    mismatched = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not mismatched, f"shape mismatches: {dict(list(mismatched.items())[:6])}"

    # converted params run a forward pass
    params = jax.tree_util.tree_map(jnp.asarray, converted)
    metrics = model.apply(
        params, batch, 0.01, True,
        rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
    )
    assert np.isfinite(float(metrics["total_loss"]))
