"""Tests: annotation DB ingestion, run_multiple listing, callback factory."""
import sqlite3
from pathlib import Path

import numpy as np
import pytest

import hulc2_tpu.configs  # noqa: F401
from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.tools.annotation_db import export_auto_lang_ann, read_annotation_db
from hulc2_tpu.train.callback_factory import build_callbacks, make_policy_rollout_fn_factory


class TestAnnotationDB:
    @pytest.fixture()
    def db(self, tmp_path):
        db_path = tmp_path / "ann.db"
        con = sqlite3.connect(db_path)
        con.execute("CREATE TABLE annotations (seq_name TEXT, annotation TEXT, task TEXT)")
        con.executemany(
            "INSERT INTO annotations VALUES (?,?,?)",
            [
                ("seq-000100-000164", "open the drawer", "open_drawer"),
                ("seq-000200-000264", "push the red block left", "push_red_block_left"),
                ("badname", "ignored", "x"),
            ],
        )
        con.commit()
        con.close()
        return db_path

    def test_read(self, db):
        recs = read_annotation_db(db)
        assert len(recs) == 2
        assert recs[0]["indx"] == (100, 164)

    def test_export_format(self, db, tmp_path):
        out = export_auto_lang_ann(db, tmp_path / "lang", frequency_divisor=2)
        assert out["info"]["indx"][0] == (50, 82)  # 30Hz -> 15Hz ids
        data = np.load(tmp_path / "lang" / "auto_lang_ann.npy", allow_pickle=True).reshape(-1)[0]
        assert data["language"]["ann"][0] == "open the drawer"
        assert data["language"]["emb"].shape == (2, 1, 384)


class TestCallbackFactory:
    def test_fake_env_rollout_callbacks(self, tmp_path):
        cfg = cfg_lib.compose("cfg_low_level")
        cfg["callbacks"]["rollout_lh"] = {"env": "fake", "num_sequences": 4, "start_epoch": 0,
                                          "ep_len": 2}
        cfg["callbacks"]["tsne_plot"] = {"every_n_epochs": 5}
        cbs = build_callbacks(cfg, tmp_path)
        assert len(cbs) == 2

    def test_rollout_fn_factory_runs_policy(self, tmp_path):
        """The config-built rollout fn drives a real (tiny) policy through the
        fake env — end-to-end train-time eval plumbing."""
        from hulc2_tpu.envs.fake_env import FakeCalvinEnv
        from hulc2_tpu.models.build import build_policy
        from hulc2_tpu.evaluation.loading import init_params

        overrides = [
            "model.plan_proposal.hidden_size=32",
            "model.plan_recognition.encoder_hidden_size=32",
            "model.plan_recognition.fc_hidden_size=32",
            "model.action_decoder.hidden_size=32",
            "model.visual_goal.hidden_size=32",
            "model.language_goal.hidden_size=32",
            "model.compute_dtype=float32",
        ]
        cfg = cfg_lib.compose("cfg_low_level", overrides)
        model = build_policy(cfg["model"])
        params = init_params(model, cfg)

        class FakeTrainer:
            pass

        class FakeState:
            pass

        trainer = FakeTrainer()
        trainer.model = model
        state = FakeState()
        state.params = params

        factory = make_policy_rollout_fn_factory(cfg, ep_len=2)
        rollout_fn = factory(trainer, state)
        env = FakeCalvinEnv(static_hw=200, gripper_hw=84)
        env.reset()
        ok = rollout_fn(env, "open_drawer")
        assert ok in (True, False)  # ran policy steps without error


class TestPretrain:
    def test_merge_with_pos_embedding_truncation(self):
        import jax.numpy as jnp
        from hulc2_tpu.utils.pretrain import merge_pretrained_params

        init = {"params": {"a": jnp.zeros((4, 4)),
                           "pr": {"position_embeddings": jnp.zeros((8, 16))},
                           "b": jnp.zeros((3,))}}
        pre = {"params": {"a": jnp.ones((4, 4)),
                          "pr": {"position_embeddings": jnp.full((32, 16), 2.0)},
                          "b": jnp.ones((5,))}}  # mismatched -> keep init
        merged = merge_pretrained_params(init, pre)
        assert float(np.asarray(merged["params"]["a"]).sum()) == 16
        assert np.asarray(merged["params"]["pr"]["position_embeddings"]).shape == (8, 16)
        assert float(np.asarray(merged["params"]["pr"]["position_embeddings"])[0, 0]) == 2.0
        assert float(np.asarray(merged["params"]["b"]).sum()) == 0  # kept init

    def test_get_portion_of_batch_ids(self):
        from hulc2_tpu.utils.pretrain import get_portion_of_batch_ids

        np.testing.assert_array_equal(get_portion_of_batch_ids(0.5, 8), [0, 2, 4, 6])
        np.testing.assert_array_equal(get_portion_of_batch_ids(1.0, 3), [0, 1, 2])
        assert len(get_portion_of_batch_ids(0.0, 8)) == 0
