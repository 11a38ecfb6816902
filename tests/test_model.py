"""End-to-end model tests: config composition -> build -> forward passes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import hulc2_tpu.configs  # noqa: F401  (register config groups)
from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.models.build import build_policy
from hulc2_tpu.models.hulc2 import Hulc2


def make_batch(rng, b=2, s=8, hw_static=40, hw_gripper=40, with_lang=False):
    batch = {
        "rgb_obs": {
            "rgb_static": jnp.asarray(rng.rand(b, s, hw_static, hw_static, 3), jnp.float32),
            "rgb_gripper": jnp.asarray(rng.rand(b, s, hw_gripper, hw_gripper, 3), jnp.float32),
        },
        "depth_obs": {},
        "robot_obs": jnp.asarray(rng.rand(b, s, 8), jnp.float32),
        "actions": jnp.asarray(np.clip(rng.randn(b, s, 7) * 0.3, -1, 1), jnp.float32),
        "robot_obs_raw": jnp.asarray(rng.rand(b, s, 15), jnp.float32),
    }
    batch["actions"] = batch["actions"].at[..., -1].set(
        jnp.sign(batch["actions"][..., -1] + 1e-6)
    )
    if with_lang:
        batch["lang"] = jnp.asarray(rng.rand(b, 384), jnp.float32)
        batch["use_for_aux_lang_loss"] = jnp.asarray(rng.rand(b) > 0.5)
    return batch


@pytest.fixture(scope="module")
def model_and_params():
    # tiny widths: forward/step semantics are width-independent and the full
    # default model costs ~30s of XLA-CPU compile per suite run
    cfg = cfg_lib.compose("cfg_low_level", [
        "model.compute_dtype=float32",
        "model.plan_proposal.hidden_size=32",
        "model.plan_recognition.encoder_hidden_size=32",
        "model.plan_recognition.fc_hidden_size=32",
        "model.action_decoder.hidden_size=32",
        "model.visual_goal.hidden_size=32",
        "model.language_goal.hidden_size=32",
    ])
    model = build_policy(cfg["model"])
    rng = np.random.RandomState(0)
    batch = {"vis": make_batch(rng), "lang": make_batch(rng, with_lang=True)}
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch,
    )
    return cfg, model, params, batch


class TestCompose:
    def test_interpolation_wiring(self):
        cfg = cfg_lib.compose("cfg_low_level")
        assert cfg["model"]["kl_beta"] == cfg["loss"]["kl_beta"] == 0.01
        assert cfg["model"]["action_decoder"]["out_features"] == 7
        assert cfg["model"]["plan_recognition"]["max_position_embeddings"] == 32

    def test_overrides(self):
        cfg = cfg_lib.compose(
            "cfg_low_level",
            ["loss.kl_beta=0.5", "model/distribution=continuous", "training.lr=0.001"],
        )
        assert cfg["model"]["kl_beta"] == 0.5
        assert cfg["model"]["distribution"]["dist"] == "continuous"
        assert cfg["model"]["optimizer"]["lr"] == 0.001

    def test_gcbc_composite(self):
        cfg = cfg_lib.compose("cfg_gcbc")
        assert cfg["model"]["use_plan"] is False

    def test_top_level_group_selection(self):
        """``aff_detection=rn50_clip_pixel``-style overrides (no slash) swap
        the whole group, mirroring Hydra's top-level group syntax."""
        import hulc2_tpu.configs.affordance  # noqa: F401

        cfg = cfg_lib.compose("train_affordance", ["aff_detection=rn18_sbert_pixel"])
        assert cfg["aff_detection"]["lang_embed_dim"] == 384
        assert cfg["aff_detection"]["dataset"]["label_type"] == "pixel"

    def test_per_camera_subgroup_overrides(self):
        """reference conf/model/perceptual_encoder/{rgb_static,rgb_gripper}/
        option dirs: per-camera selection composes and builds."""
        cfg = cfg_lib.compose(
            "cfg_low_level",
            ["model/perceptual_encoder/rgb_static=resnet_aff",
             "model/perceptual_encoder/rgb_gripper=none"],
        )
        assert cfg["model"]["perceptual_encoder"]["rgb_static"]["_name_"] == "vision_resnet_aff"
        assert cfg["model"]["perceptual_encoder"]["rgb_gripper"] is None
        model = build_policy(cfg["model"])
        assert type(model.perceptual_encoder.rgb_static).__name__ == "VisionResNetAff"
        assert model.perceptual_encoder.rgb_gripper is None

    def test_sgd_cosine_presets(self):
        from hulc2_tpu.train import optim

        cfg = cfg_lib.compose(
            "cfg_low_level", ["model/optimizer=sgd", "model/lr_scheduler=cosine_warmup"]
        )
        assert cfg["model"]["optimizer"]["kind"] == "sgd"
        tx = optim.make_optimizer(cfg["model"]["optimizer"], cfg["model"]["lr_scheduler"], 100)
        assert tx is not None


class TestHulc2Forward:
    def test_train_forward_multimodal(self, model_and_params):
        cfg, model, params, batch = model_and_params
        metrics = jax.jit(lambda p, b: model.apply(
            p, b, 0.01,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        ))(params, batch)
        for k in ("total_loss", "kl_loss", "action_loss", "kl_loss_vis", "kl_loss_lang",
                  "action_loss_vis", "action_loss_lang", "lang_clip_loss"):
            assert k in metrics, k
            assert np.isfinite(float(metrics[k])), k
        # total = mean losses + (clip applied outside with beta)
        np.testing.assert_allclose(
            float(metrics["total_loss"]),
            float(metrics["kl_loss"] + metrics["action_loss"]),
            rtol=1e-5,
        )

    @pytest.mark.slow
    def test_fused_equals_per_modality_kl_and_clip(self, model_and_params):
        """Deterministic pieces of the fused pass (KL, CLIP aux) must equal the
        per-modality passes exactly; the action loss depends on the plan
        *sample* whose RNG draws differ by batch shape, so it is checked via
        the deterministic GCBC path below."""
        cfg, model, params, batch = model_and_params
        rngs = {"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)}
        fused = model.apply(params, batch, 0.01, True, rngs=rngs)
        vis_only = model.apply(params, {"vis": batch["vis"]}, 0.01, True, rngs=rngs)
        lang_only = model.apply(params, {"lang": batch["lang"]}, 0.01, True, rngs=rngs)
        np.testing.assert_allclose(
            float(fused["kl_loss_vis"]), float(vis_only["kl_loss_vis"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(fused["kl_loss_lang"]), float(lang_only["kl_loss_lang"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(fused["lang_clip_loss"]), float(lang_only["lang_clip_loss"]), rtol=1e-5
        )

    @pytest.mark.slow
    def test_fused_equals_per_modality_gcbc(self):
        """With use_plan=False the whole pass is deterministic in eval mode:
        fused action losses must match per-modality runs exactly."""
        cfg = cfg_lib.compose("cfg_gcbc", ["model.compute_dtype=float32"])
        model = build_policy(cfg["model"])
        rng = np.random.RandomState(7)
        batch = {"vis": make_batch(rng), "lang": make_batch(rng, with_lang=True)}
        rngs = {"sample": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        params = jax.jit(model.init)({"params": jax.random.PRNGKey(2), **rngs}, batch)
        fused = model.apply(params, batch, 0.0, True, rngs=rngs)
        vis_only = model.apply(params, {"vis": batch["vis"]}, 0.0, True, rngs=rngs)
        lang_only = model.apply(params, {"lang": batch["lang"]}, 0.0, True, rngs=rngs)
        np.testing.assert_allclose(
            float(fused["action_loss_vis"]), float(vis_only["action_loss_vis"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(fused["action_loss_lang"]), float(lang_only["action_loss_lang"]), rtol=1e-5
        )

    def test_val_forward(self, model_and_params):
        cfg, model, params, batch = model_and_params
        metrics = jax.jit(lambda p, b: model.apply(
            p, b,
            rngs={"sample": jax.random.PRNGKey(5)},
            method=Hulc2.val_forward,
        ))(params, batch)
        for k in ("vis_total_mae_pp", "vis_total_mae_pr", "lang_grip_sr_pp", "vis_kl_loss"):
            assert np.isfinite(float(metrics[k])), k

    @pytest.mark.slow
    def test_gradients_flow(self, model_and_params):
        cfg, model, params, batch = model_and_params

        def loss_fn(p):
            m = model.apply(
                p, batch, 0.01,
                rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            )
            return m["total_loss"] + 3.0 * m["lang_clip_loss"]

        grads = jax.grad(loss_fn)(params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
        # plan proposal (prior) must receive gradient through balanced KL
        gnorms = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).sum()), grads)
        pp = gnorms["params"]["plan_proposal"]
        assert sum(jax.tree_util.tree_leaves(pp)) > 0


class TestPolicyStep:
    def test_replan_and_step(self, model_and_params):
        cfg, model, params, _ = model_and_params
        rng = np.random.RandomState(1)
        b = 3
        obs_rgb = {
            "rgb_static": jnp.asarray(rng.rand(b, 1, 40, 40, 3), jnp.float32),
            "rgb_gripper": jnp.asarray(rng.rand(b, 1, 40, 40, 3), jnp.float32),
        }
        robot_obs = jnp.asarray(rng.rand(b, 1, 8), jnp.float32)
        robot_obs_raw = jnp.asarray(rng.rand(b, 1, 15), jnp.float32)
        goal = {"lang": jnp.asarray(rng.rand(b, 384), jnp.float32)}
        carry = model.init_carry(b)

        @jax.jit
        def step(params, carry, key):
            return model.apply(
                params, obs_rgb, {}, robot_obs, robot_obs_raw, goal, carry,
                rngs={"sample": key},
                method=Hulc2.policy_step,
            )

        action, carry1 = step(params, carry, jax.random.PRNGKey(0))
        assert action.shape == (b, 7)
        assert np.all(np.isfinite(np.asarray(action)))
        assert int(carry1.step[0]) == 1
        # plan should be fresh (replan at step 0) and persist at step 1
        action2, carry2 = step(params, carry1, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(carry1.plan), np.asarray(carry2.plan))
        # hidden state evolves
        h1 = np.asarray(jax.tree_util.tree_leaves(carry1.hidden)[0])
        h2 = np.asarray(jax.tree_util.tree_leaves(carry2.hidden)[0])
        assert not np.array_equal(h1, h2)


class TestAuxLosses:
    @pytest.mark.slow
    def test_state_recons_bcz_mia(self):
        """GCBC-style auxiliary losses produce finite masked metrics and
        gradients (reference: gcbc.py:95-180)."""
        cfg = cfg_lib.compose(
            "cfg_low_level",
            ["model.compute_dtype=float32", "model.use_state_recons=true",
             "model.use_bc_z_auxiliary_loss=true", "model.use_mia_auxiliary_loss=true"],
        )
        model = build_policy(cfg["model"])
        rng = np.random.RandomState(3)
        batch = {"vis": make_batch(rng), "lang": make_batch(rng, with_lang=True)}
        rngs = {"sample": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        params = jax.jit(model.init)({"params": jax.random.PRNGKey(2), **rngs}, batch)
        m = model.apply(params, batch, 0.01, True, rngs=rngs)
        for k in ("proprio_loss", "lang_pred_loss", "lang_contrastive_loss"):
            assert k in m and np.isfinite(float(m[k])), k

        from hulc2_tpu.train import optim
        from hulc2_tpu.train.steps import make_train_step
        from hulc2_tpu.train.state import create_train_state

        tx = optim.make_optimizer({"kind": "adam", "lr": 1e-4})
        state = create_train_state(lambda: params, tx)
        step = make_train_step(
            model, tx, {m_: (lambda r, raw: raw) for m_ in ("vis", "lang")}, 3.0,
            donate=False,
            aux_betas={"proprio_loss": 0.5, "lang_pred_loss": 1.0, "lang_contrastive_loss": 1.0},
        )
        state2, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.asarray(0.01))
        assert float(metrics["loss"]) > float(metrics["total_loss"])


    def test_sbert_group_alias_serves_precomputed_embeddings(self):
        """model/language_encoder=sbert (reference group name) maps to the
        precomputed-embedding path: the reference sbert tower is frozen, so
        its output equals the annotator-precomputed embeddings."""
        from hulc2_tpu.models.build import build_policy as bp

        cfg = cfg_lib.compose("cfg_low_level", ["model/language_encoder=sbert"])
        assert bp(cfg["model"]).lang_net is None
