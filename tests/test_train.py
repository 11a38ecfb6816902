"""Training loop tests: synthetic smoke run, resume, multi-device sharding."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import hulc2_tpu.configs  # noqa: F401
from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.train import optim
from hulc2_tpu.train.kl_schedule import make_kl_schedule


SMALL_OVERRIDES = [
    # tiny model for CPU test speed
    "model.plan_proposal.hidden_size=64",
    "model.plan_recognition.encoder_hidden_size=64",
    "model.plan_recognition.fc_hidden_size=64",
    "model.action_decoder.hidden_size=64",
    "model.visual_goal.hidden_size=64",
    "model.language_goal.hidden_size=64",
    "model.compute_dtype=float32",
    "datamodule.max_window_size=8",
    "datamodule.min_window_size=8",
    "datamodule.batch_size_vis=8",  # divisible by the 8-device test mesh
    "datamodule.batch_size_lang=8",
    "trainer.log_every_n_steps=1",
]


class TestKLSchedule:
    def test_constant(self):
        s = make_kl_schedule({"kind": "constant", "kl_beta": 0.01})
        assert s(0) == s(99) == 0.01

    def test_linear(self):
        s = make_kl_schedule({"kind": "linear", "kl_beta": 0.1, "start_epoch": 10, "end_epoch": 20})
        assert s(0) == 0.0
        assert s(15) == pytest.approx(0.05)
        assert s(25) == 0.1

    def test_sigmoid_monotone(self):
        s = make_kl_schedule({"kind": "sigmoid", "kl_beta": 0.1, "start_epoch": 0, "end_epoch": 20})
        vals = [s(e) for e in range(21)]
        assert all(b >= a for a, b in zip(vals, vals[1:]))


class TestOptim:
    def test_warmup_resolution(self):
        total, warm = optim.compute_warmup(-1, 0.1, 1000)
        assert total == 1000 and warm == 100

    def test_make_optimizer(self):
        tx = optim.make_optimizer({"kind": "adam", "lr": 1e-3}, {"kind": "constant"})
        params = {"w": jnp.ones((4, 4))}
        s = tx.init(params)
        grads = {"w": jnp.ones((4, 4))}
        updates, _ = tx.update(grads, s, params)
        assert np.all(np.isfinite(np.asarray(updates["w"])))


@pytest.mark.slow
class TestTrainerSmoke:
    def test_synthetic_train_and_resume(self, tmp_path):
        from hulc2_tpu.training import train

        run_dir = tmp_path / "run"
        state = train(
            "cfg_low_level", SMALL_OVERRIDES, max_epochs=1, max_steps=2, synthetic=True,
            run_dir=run_dir,
        )
        assert int(state.step) == 2
        assert (run_dir / "config.json").exists()
        assert (run_dir / "metrics.jsonl").exists()
        # resume continues from the saved checkpoint
        state2 = train(
            "cfg_low_level", SMALL_OVERRIDES, max_epochs=2, max_steps=2, synthetic=True,
            run_dir=run_dir,
        )
        assert int(state2.step) >= 2

    def test_callback_metrics_reach_log_and_checkpoint(self, tmp_path):
        """Callback-produced metrics (eval_lh/*, tasks/*) must land in
        metrics.jsonl AND be visible to monitor-based checkpoint retention —
        regression: they used to be appended to val_metrics AFTER both the
        log write and the ckpt.save call, silently dropping rollout SR."""
        import json

        import hulc2_tpu.configs  # noqa: F401
        from hulc2_tpu.core import config as cfg_lib
        from hulc2_tpu.data.datamodule import RandomDataModule
        from hulc2_tpu.train.trainer import Trainer

        cfg = cfg_lib.compose("cfg_low_level", SMALL_OVERRIDES)
        seen_by_ckpt = {}

        def stub_callback(trainer, epoch, state, val_metrics, **kw):
            val_metrics["tasks/stub_sr"] = 0.75

        dm = RandomDataModule(cfg["datamodule"])
        dm.setup()
        trainer = Trainer(cfg, dm, tmp_path / "run", callbacks=[stub_callback])
        from hulc2_tpu.core.checkpoint import CheckpointManager

        orig_save = CheckpointManager.save

        def spy_save(self, step, state, metrics=None, **kw):
            seen_by_ckpt.update(metrics or {})
            return orig_save(self, step, state, metrics, **kw)

        CheckpointManager.save = spy_save
        try:
            trainer.fit(max_epochs=1, max_steps=2)
        finally:
            CheckpointManager.save = orig_save
        lines = [json.loads(l) for l in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
        assert any(l.get("tasks/stub_sr") == 0.75 for l in lines), "callback metric not logged"
        assert seen_by_ckpt.get("tasks/stub_sr") == 0.75, "checkpoint monitor never saw it"

    @pytest.mark.parametrize("preset,expect", [
        ("vision_only", {"vis"}), ("lang_only", {"lang"})])
    def test_single_modality_training(self, tmp_path, preset, expect):
        """datamodule/datasets={vision_only,lang_only}: the reference's
        conf/datamodule/datasets option dir — training runs end to end on a
        single modality stream (GCBC-on-play-data / lang-only variants)."""
        from hulc2_tpu.training import train

        state = train(
            "cfg_low_level", SMALL_OVERRIDES + [f"datamodule/datasets={preset}"],
            max_epochs=1, max_steps=2, synthetic=True, run_dir=tmp_path / "run",
        )
        assert int(state.step) == 2
        import json
        lines = [json.loads(l) for l in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
        val = [l for l in lines if any(k.startswith("val/") for k in l)]
        assert val, "no validation metrics logged"
        mods = {k.split("/")[1].split("_")[0] for l in val for k in l if k.startswith("val/")}
        assert expect <= mods and not ({"vis", "lang"} - expect) & mods

    def test_train_loss_decreases_overfit(self, tmp_path):
        """Overfit two fixed synthetic batches — loss must drop (end-to-end
        learning signal through every component)."""
        import hulc2_tpu.configs  # noqa: F401
        from hulc2_tpu.data.datamodule import RandomDataModule
        from hulc2_tpu.train.trainer import Trainer

        cfg = cfg_lib.compose("cfg_low_level", SMALL_OVERRIDES + ["training.lr=0.001"])
        dm = RandomDataModule(cfg["datamodule"], n_samples=8)
        dm.setup()
        trainer = Trainer(cfg, dm, tmp_path / "overfit")

        steps = dm.steps_per_epoch()
        state, tx = trainer._init_state(steps)
        from hulc2_tpu.train.steps import make_train_step

        tfs = trainer._build_transforms(train=True)
        train_step = make_train_step(trainer.model, tx, tfs, 3.0, donate=False)
        batch = next(iter(dm.train_iter()))
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        key = jax.random.PRNGKey(0)
        losses = []
        for _ in range(12):
            state, metrics = train_step(state, batch, key, jnp.asarray(0.01))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_host_prefused_batch_matches_per_modality():
    """fuse_batch_host + the train step's prefused path produce the same loss
    and gradients as the per-modality path (same rng streams)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import hulc2_tpu.configs  # noqa: F401
    from hulc2_tpu.core import config as cfg_lib
    from hulc2_tpu.data.device_transforms import make_batch_transform
    from hulc2_tpu.data.loader import fuse_batch_host
    from hulc2_tpu.data.statistics import DatasetStatistics
    from hulc2_tpu.models.build import build_policy
    from hulc2_tpu.train import optim
    from hulc2_tpu.train.state import create_train_state
    from hulc2_tpu.train.steps import make_train_step

    tiny = [
        "model.plan_proposal.hidden_size=32",
        "model.plan_recognition.encoder_hidden_size=32",
        "model.plan_recognition.fc_hidden_size=32",
        "model.action_decoder.hidden_size=32",
        "model.visual_goal.hidden_size=32",
        "model.language_goal.hidden_size=32",
        "model.compute_dtype=float32",
    ]
    cfg = cfg_lib.compose("cfg_low_level", tiny)
    model = build_policy(cfg["model"])
    dm_cfg = cfg["datamodule"]
    rng = np.random.RandomState(0)
    b, s, hw = 2, 4, 40

    def raw_mod(with_lang):
        d = {
            "rgb_static": rng.randint(0, 256, (b, s, hw, hw, 3)).astype(np.uint8),
            "rgb_gripper": rng.randint(0, 256, (b, s, hw, hw, 3)).astype(np.uint8),
            "robot_obs_raw": rng.randn(b, s, 15).astype(np.float32),
            "actions": np.concatenate(
                [np.clip(rng.randn(b, s, 6) * 0.3, -1, 1), np.sign(rng.randn(b, s, 1))], -1
            ).astype(np.float32),
        }
        if with_lang:
            d["lang"] = rng.randn(b, 384).astype(np.float32)
            d["use_for_aux_lang_loss"] = rng.rand(b) > 0.3
        return d

    per_mod = {"vis": raw_mod(False), "lang": raw_mod(True)}
    fused = fuse_batch_host(per_mod)

    tf = make_batch_transform(
        dm_cfg["observation_space"], dm_cfg["proprioception_dims"], DatasetStatistics(),
        "play_basic", False,
    )
    tx = optim.make_optimizer(cfg["model"]["optimizer"], None, 100)
    key = jax.random.PRNGKey(0)

    def init_fn():
        tfd = {m: tf(key, jax.tree_util.tree_map(jnp.asarray, per_mod[m])) for m in per_mod}
        return model.init({"params": key, "sample": key, "dropout": key}, tfd)

    state = create_train_state(init_fn, tx)
    step = make_train_step(model, tx, {"vis": tf, "lang": tf}, 3.0, donate=False)
    klb = jnp.asarray(0.01)

    _, m_a = step(state, jax.tree_util.tree_map(jnp.asarray, per_mod), key, klb)
    _, m_b = step(state, jax.tree_util.tree_map(jnp.asarray, fused), key, klb)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=1e-4)


@pytest.mark.slow
def test_preemption_signal_checkpoints_at_step_edge(tmp_path):
    """SURVEY §5 failure-detection semantics: a SIGUSR1 mid-epoch makes the
    trainer checkpoint at the next step boundary and stop cleanly (the
    slurm-requeue contract; reference: sbatch timeout + auto-resume)."""
    import os
    import signal
    import threading

    from hulc2_tpu.training import train

    run_dir = tmp_path / "preempt"
    timer = threading.Timer(0.5, lambda: os.kill(os.getpid(), signal.SIGUSR1))

    from hulc2_tpu.train import trainer as trainer_mod

    orig_fit = trainer_mod.Trainer.fit

    def fit_with_signal(self, *a, **k):
        timer.start()
        return orig_fit(self, *a, **k)

    trainer_mod.Trainer.fit = fit_with_signal
    try:
        # no max_steps: only the preemption signal can end the epoch early
        state = train("cfg_low_level", SMALL_OVERRIDES, max_epochs=1, synthetic=True,
                      run_dir=run_dir)
    finally:
        trainer_mod.Trainer.fit = orig_fit
        timer.cancel()
    saved = list((run_dir / "saved_models").iterdir())
    assert saved, "preemption did not write a checkpoint"
    assert int(state.step) < 64  # stopped well before the full epoch
