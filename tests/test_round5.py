"""Round-5 additions: paraphrase holdout protocol, token-mode annotations,
the affordance in-graph text tower, per-task eval diagnostics, and goal
variants in the batched evaluator."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import hulc2_tpu.configs  # noqa: F401
import hulc2_tpu.configs.affordance  # noqa: F401
from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.evaluation.tasks import TASK_NAMES
from hulc2_tpu.tools.annotations import (
    ANNOTATION_BANK,
    HOLDOUT_K,
    VALIDATION_BANK,
    heldout_annotations,
    sample_annotation,
)


class TestParaphraseHoldout:
    def test_heldout_disjoint_from_sampling(self):
        """With holdout_k, sample_annotation never returns a held-out
        sentence — the training/eval sentence sets are disjoint."""
        rng = np.random.default_rng(0)
        for task in TASK_NAMES:
            held = set(heldout_annotations(task))
            assert len(held) == HOLDOUT_K
            drawn = {sample_annotation(task, rng, holdout_k=HOLDOUT_K) for _ in range(200)}
            assert not (drawn & held), task
            # the canonical validation phrasing stays trainable
            assert VALIDATION_BANK[task] not in held

    def test_heldout_are_real_bank_sentences(self):
        for task in TASK_NAMES:
            for s in heldout_annotations(task):
                assert s in ANNOTATION_BANK[task]

    def test_without_holdout_full_bank_reachable(self):
        rng = np.random.default_rng(1)
        task = "open_drawer"
        drawn = {sample_annotation(task, rng) for _ in range(2000)}
        assert drawn == set(ANNOTATION_BANK[task])


class TestTokenAnnotations:
    def test_tokens_mode_writes_int_ids(self, tmp_path):
        """annotate_dataset(embed_fn='tokens') stores int32 CLIP-BPE ids for
        both the per-window 'emb' field and the canonical lookup — no float
        stub embeddings anywhere."""
        from hulc2_tpu.tools.make_synthetic_dataset import make_synthetic_calvin
        from hulc2_tpu.tools.auto_lang_annotator import annotate_dataset

        root = make_synthetic_calvin(tmp_path / "ds", episodes=1,
                                     frames_per_episode=70, val_episodes=0,
                                     static_hw=8, gripper_hw=8)
        d = root / "training"
        lang = annotate_dataset(d, window=32, stride=16, embed_fn="tokens",
                                holdout_k=HOLDOUT_K)
        embs = np.asarray(lang["language"]["emb"])
        assert embs.dtype == np.int32 and embs.shape[1:] == (1, 77)
        for ann, task in zip(lang["language"]["ann"], lang["language"]["task"]):
            assert ann not in heldout_annotations(task)
        lookup = np.load(d / "lang_annotations" / "embeddings.npy",
                         allow_pickle=True).item()
        for v in lookup.values():
            assert np.asarray(v["emb"]).dtype == np.int32

    def test_token_annotations_feed_string_dataset_path(self, tmp_path):
        """load_lang_embeddings=False reads the annotation STRINGS and
        tokenizes them — the policy-side token path is annotator-agnostic."""
        from hulc2_tpu.data.episode_index import build_lang_index
        from hulc2_tpu.tools.make_synthetic_dataset import make_synthetic_calvin
        from hulc2_tpu.tools.auto_lang_annotator import annotate_dataset

        root = make_synthetic_calvin(tmp_path / "ds", episodes=1,
                                     frames_per_episode=70, val_episodes=0,
                                     static_hw=8, gripper_hw=8)
        d = root / "training"
        annotate_dataset(d, window=32, stride=16, embed_fn="tokens")
        idx = build_lang_index(d, "training", 20, 32, "lang_annotations",
                               load_lang_embeddings=False)
        assert idx.lang_ann.dtype == object  # strings, not vectors


class TestAffordanceTextTower:
    @pytest.fixture(scope="class")
    def detector(self):
        from hulc2_tpu.affordance.detector import AffordanceDetector

        return AffordanceDetector(
            encoder_name="resnet18",
            decoder_channels=(16, 16, 16, 16, 16),
            lang_embed_dim=24,
            depth_dist="gaussian",
            text_tower=True,
            tower_width=16,
            tower_heads=2,
            tower_layers=1,
        )

    def test_forward_from_tokens(self, detector):
        img = jnp.zeros((2, 32, 32, 3), jnp.float32)
        toks = jnp.asarray(np.random.default_rng(0).integers(1, 100, (2, 12)), jnp.int32)
        out, variables = detector.init_with_output(
            jax.random.PRNGKey(0), img, toks, False)
        assert out.aff_logits.shape == (2, 32 * 32)
        assert "lang_tower" in variables["params"]

    def test_tower_receives_gradients(self, detector):
        img = jnp.zeros((2, 32, 32, 3), jnp.float32)
        toks = jnp.asarray([[5, 9, 2, 90], [7, 1, 80, 3]], jnp.int32)
        variables = detector.init(jax.random.PRNGKey(0), img, toks, False)
        params, bs = variables["params"], variables.get("batch_stats", {})
        px = jnp.asarray([[3, 4], [9, 9]], jnp.int32)
        depth = jnp.asarray([0.1, -0.2], jnp.float32)

        def loss_fn(p):
            out, _ = detector.apply({"params": p, "batch_stats": bs}, img, toks, True,
                                    mutable=["batch_stats"])
            total, _ = detector.compute_loss(out, px, depth)
            return total

        grads = jax.grad(loss_fn)(params)
        tower_sq = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(
            grads["lang_tower"]))
        assert tower_sq > 0.0

    def test_float_lang_rejected(self, detector):
        img = jnp.zeros((1, 32, 32, 3), jnp.float32)
        with pytest.raises(AssertionError):
            detector.init(jax.random.PRNGKey(0), img, jnp.zeros((1, 24), jnp.float32), False)

    def test_predictor_tokens_roundtrip(self, detector):
        """AffordancePredictor keeps int token tables integral and reports
        uses_tokens for evaluate_policy's table construction."""
        from hulc2_tpu.affordance.detector import AffordancePredictor

        img = jnp.zeros((1, 32, 32, 3), jnp.float32)
        toks = jnp.zeros((1, 12), jnp.int32)
        variables = detector.init(jax.random.PRNGKey(0), img, toks, False)
        pred = AffordancePredictor(detector, variables, input_hw=(32, 32),
                                   lang_table={"open the drawer": np.zeros(12, np.int32)})
        assert pred.uses_tokens
        out = pred.predict(np.zeros((32, 32, 3), np.uint8), "open the drawer")
        assert "pixel" in out and "depth" in out

    def test_config_preset_builds(self):
        from hulc2_tpu.affordance.train_affordance import build_detector

        cfg = cfg_lib.compose("train_affordance", ["aff_detection=rn18_tokens_pixel"])
        det = build_detector(cfg["aff_detection"])
        assert det.text_tower and det.lang_embed_dim == 384


class TestGoalVariants:
    def _stub_evaluator(self, **kw):
        from hulc2_tpu.evaluation.batched_eval import PipelinedEvaluator

        class _Agent:
            n_envs = 0

        class _Farm:
            envs = ()

            def __len__(self):
                return 0

        lang = {t: np.zeros(4, np.float32) for t in TASK_NAMES}
        return PipelinedEvaluator([(_Farm(), _Agent())], lang, **kw)

    def test_variant_rotation_by_chain(self):
        variants = {t: [np.full(4, i, np.float32) for i in range(3)] for t in TASK_NAMES}
        ev = self._stub_evaluator(lang_variants=variants)
        g0 = ev.goal_for("open_drawer", 0)
        g1 = ev.goal_for("open_drawer", 1)
        g3 = ev.goal_for("open_drawer", 3)
        assert np.all(g0 == 0) and np.all(g1 == 1) and np.all(g3 == 0)

    def test_default_goal_without_variants(self):
        ev = self._stub_evaluator()
        assert np.all(ev.goal_for("open_drawer", 7) == 0)

    def test_diagnostic_counters_initialized(self):
        ev = self._stub_evaluator()
        assert set(ev.timings) == {"fetch_wait_s", "sim_step_s",
                                   "aff_flush_s", "dispatch_submit_s"}
        assert ev.subtask_records == [] and ev.throughput_curve == []


class TestPolicyClipScratchPreset:
    def test_preset_composes_and_builds(self):
        from hulc2_tpu.models.build import build_policy

        cfg = cfg_lib.compose(
            "cfg_low_level",
            ["model/language_encoder=clip_scratch", "datamodule.load_lang_embeddings=false"],
        )
        le = cfg["model"]["language_encoder"]
        assert le["_name_"] == "clip_text" and le["layers"] == 2 and not le["frozen"]
        model = build_policy(cfg["model"])
        assert model.lang_net is not None and model.lang_net.output_dim == 384


class TestLangTaskAuxLoss:
    """Task-CE supervision on the language tower (aux_nets.LangTaskHead) —
    the from-scratch substitute for the task separability the reference
    inherits from frozen SBERT (language_network.py:13)."""

    def _model(self):
        from hulc2_tpu.models.build import build_policy

        cfg = cfg_lib.compose(
            "cfg_low_level",
            ["model/language_encoder=clip_scratch",
             "model.use_lang_task_auxiliary_loss=true",
             "model.language_encoder.width=64", "model.language_encoder.heads=2",
             "model.plan_proposal.hidden_size=32",
             "model.plan_recognition.encoder_hidden_size=32",
             "model.plan_recognition.fc_hidden_size=32",
             "model.action_decoder.hidden_size=32",
             "model.compute_dtype=float32"],
        )
        return build_policy(cfg["model"])

    def _batch(self, b=2, s=4, task_ids=(3, 5)):
        import jax.numpy as jnp
        import numpy as np

        rng = np.random.RandomState(0)

        def mod(with_lang):
            d = {
                "rgb_obs": {
                    "rgb_static": jnp.asarray(rng.rand(b, s, 64, 64, 3), jnp.float32),
                    "rgb_gripper": jnp.asarray(rng.rand(b, s, 64, 64, 3), jnp.float32),
                },
                "depth_obs": {},
                "robot_obs": jnp.asarray(rng.rand(b, s, 8), jnp.float32),
                "actions": jnp.asarray(np.clip(rng.randn(b, s, 7), -1, 1), jnp.float32),
                "robot_obs_raw": jnp.asarray(rng.rand(b, s, 15), jnp.float32),
            }
            if with_lang:
                d["lang"] = jnp.asarray(rng.randint(1, 1000, (b, 77)), jnp.int32)
                d["use_for_aux_lang_loss"] = jnp.ones((b,), bool)
                d["lang_task_id"] = jnp.asarray(task_ids, jnp.int32)
            return d

        return {"vis": mod(False), "lang": mod(True)}

    def test_metrics_present_and_masked(self):
        import jax
        import jax.numpy as jnp

        model = self._model()
        assert model.lang_task_head is not None
        batch = self._batch()
        rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        params = model.init(rngs, batch)
        m = model.apply(params, batch, 0.01, True,
                        rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
        assert "lang_task_loss" in m and "lang_task_acc" in m
        assert float(m["lang_task_loss"]) > 0 and 0 <= float(m["lang_task_acc"]) <= 1

        # unknown labels (-1) are masked out of the CE mean
        batch2 = self._batch(task_ids=(3, -1))
        m2 = model.apply(params, batch2, 0.01, True,
                         rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
        assert jnp.isfinite(m2["lang_task_loss"])

    def test_dataset_emits_task_ids(self, tmp_path):
        import numpy as np

        from hulc2_tpu.tools.make_expert_dataset import make_expert_dataset
        from hulc2_tpu.data.datamodule import Hulc2DataModule
        from hulc2_tpu.evaluation.tasks import TASK_NAMES

        root = make_expert_dataset(tmp_path / "ds", episodes=2, tasks_per_episode=10,
                                   val_episodes=1, val_tasks_per_episode=6,
                                   static_hw=64, gripper_hw=48, lang_tokens=True, seed=0)
        dm_cfg = dict(cfg_lib.compose("cfg_low_level")["datamodule"])
        dm_cfg.update(root_data_dir=str(root), batch_size_vis=2, batch_size_lang=2,
                      load_lang_embeddings=False, max_window_size=8, min_window_size=8)
        dm = Hulc2DataModule(dm_cfg, use_shm_cache=False)
        dm.setup()
        batch = next(iter(dm.fused_train_iter()))
        assert "lang_task_id" in batch and batch["lang_task_id"].dtype == np.int32
        assert all(0 <= t < len(TASK_NAMES) for t in batch["lang_task_id"])
