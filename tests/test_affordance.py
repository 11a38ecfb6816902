"""Affordance subsystem tests: fusion, LingUNet, depth heads, detector,
on-disk dataset format, end-to-end gradient flow."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hulc2_tpu.affordance import fusion
from hulc2_tpu.affordance.dataset import AffordanceDataset, jitter_label_and_image, resize_pixel
from hulc2_tpu.affordance.depth_heads import DepthNorm, GaussianDepthHead, LogisticDepthHead
from hulc2_tpu.affordance.detector import AffordanceDetector


class TestFusion:
    @pytest.mark.parametrize("name", ["add", "mult", "max", "conv", "film", "cross_modal_2d"])
    def test_shapes_preserved(self, name):
        x1 = jnp.ones((2, 8, 8, 16))
        x2 = jnp.ones((2, 16))
        mod = fusion.FUSERS[name]()
        y, params = mod.init_with_output(jax.random.PRNGKey(0), x1, x2)
        assert y.shape[:3] == (2, 8, 8)

    def test_concat_grows_channels(self):
        x1, x2 = jnp.ones((2, 8, 8, 16)), jnp.ones((2, 16))
        y, _ = fusion.FUSERS["concat"]().init_with_output(jax.random.PRNGKey(0), x1, x2)
        assert y.shape == (2, 8, 8, 32)

    def test_word_attention(self):
        x1 = jnp.ones((2, 8, 8, 16))
        words = jnp.ones((2, 5, 16))
        y, _ = fusion.FUSERS["word_attention"]().init_with_output(jax.random.PRNGKey(0), x1, words)
        assert y.shape == x1.shape

    def test_multi_headed_word_attention_multiscale(self):
        # reference keys fixed blocks by channel width; ours is polymorphic —
        # the same module must handle the three decoder scales
        mod = fusion.FUSERS["multi_headed_word_attn"]()
        words = jnp.ones((2, 5, 32))
        for hw, c in [(7, 64), (14, 32), (28, 16)]:
            x1 = jnp.ones((2, hw, hw, c))
            y, _ = mod.init_with_output(jax.random.PRNGKey(0), x1, words)
            assert y.shape == x1.shape

    def test_registry_covers_reference_names(self):
        # reference registry (fusion.py:321-332)
        for name in ["add", "mult", "mult_word", "film", "max", "concat",
                     "conv", "deep_conv", "sent_attn", "multi_headed_word_attn"]:
            assert name in fusion.FUSERS, name


class TestDepthHeads:
    def test_gaussian_loss_and_sample(self):
        head = GaussianDepthHead(lang_dim=32)
        feat, lang = jnp.ones((4, 64)), jnp.ones((4, 32))
        pred, params = head.init_with_output(jax.random.PRNGKey(0), feat, lang)
        mu, sigma = pred
        assert mu.shape == (4, 1) and float(sigma.min()) > 0
        loss = GaussianDepthHead.loss(pred, jnp.zeros((4, 1)))
        assert np.isfinite(float(loss))
        s = GaussianDepthHead.sample(jax.random.PRNGKey(1), pred, DepthNorm(2.0, 0.5))
        assert s.shape == (4, 1)

    def test_logistic_loss_and_sample(self):
        head = LogisticDepthHead(lang_dim=32, normalized=True)
        feat, lang = jnp.ones((4, 64)), jnp.ones((4, 32))
        pred, params = head.init_with_output(jax.random.PRNGKey(0), feat, lang)
        loss = head.loss(pred, jnp.zeros((4,)))
        assert np.isfinite(float(loss))
        s = head.sample(jax.random.PRNGKey(1), pred, DepthNorm(2.0, 0.5))
        assert s.shape == (4, 1)


class TestDetector:
    @pytest.fixture(scope="class")
    def detector(self):
        model = AffordanceDetector(
            decoder_channels=(32, 16, 8, 8, 8), lang_embed_dim=64, depth_dist="gaussian"
        )
        img = jnp.zeros((2, 64, 64, 3))
        lang = jnp.zeros((2, 64))
        variables = jax.jit(lambda r, i, l: model.init(r, i, l, False))(
            jax.random.PRNGKey(0), img, lang)
        return model, variables

    def test_forward_and_loss(self, detector):
        model, variables = detector
        img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
        lang = jnp.asarray(np.random.RandomState(1).rand(2, 64), jnp.float32)
        out = jax.jit(lambda v, i, l: model.apply(v, i, l, False))(variables, img, lang)
        assert out.aff_logits.shape == (2, 64 * 64)
        px = jnp.asarray([[10, 20], [30, 40]])
        depth = jnp.asarray([0.5, -0.2])
        total, metrics = model.compute_loss(out, px, depth)
        assert np.isfinite(float(total))
        assert "aff_loss" in metrics and "depth_loss" in metrics

    @pytest.mark.slow
    def test_gradients_skip_frozen_encoder(self, detector):
        model, variables = detector
        img = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
        lang = jnp.asarray(np.random.RandomState(1).rand(2, 64), jnp.float32)
        px = jnp.asarray([[10, 20], [30, 40]])
        depth = jnp.asarray([0.5, -0.2])

        def loss_fn(p):
            out = model.apply({"params": p, "batch_stats": variables["batch_stats"]}, img, lang, False)
            return model.compute_loss(out, px, depth)[0]

        grads = jax.grad(loss_fn)(variables["params"])
        enc_norm = sum(
            float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["aff_stream"]["encoder"])
        )
        dec_norm = sum(
            float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["aff_stream"]["decoder"])
        )
        assert enc_norm == 0.0  # frozen
        assert dec_norm > 0.0

    def test_predict_pixel_recovers_peak(self, detector):
        model, variables = detector
        # craft logits with a known argmax
        from hulc2_tpu.affordance.detector import AffordanceOutput

        logits = jnp.full((1, 64 * 64), -10.0).at[0, 17 * 64 + 42].set(10.0)
        out = AffordanceOutput(logits, None, (64, 64))
        px, depth, heat = model.predict_from_output(jax.random.PRNGKey(0), out, None)
        assert tuple(np.asarray(px[0])) == (17, 42)
        assert heat.shape == (1, 64, 64)


class TestR3MStream:
    """R3M LingUNet stream (reference: visual_lang_encoders/r3m_rn18.py:10):
    layers 1-3 always frozen; layer4 trains when freeze_encoder=False."""

    def _grads(self, freeze_encoder):
        # tiny decoder for test speed; the real r3m_pixel config carries the
        # reference's forced (512, 256, 128, 64, 32)
        model = AffordanceDetector(
            encoder_name="r3m_rn18", decoder_channels=(32, 16, 8, 8, 8),
            lang_embed_dim=32, depth_dist=None, freeze_encoder=freeze_encoder,
        )
        img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
        lang = jnp.asarray(np.random.RandomState(1).rand(1, 32), jnp.float32)
        variables = jax.jit(lambda r, i, l: model.init(r, i, l, False))(
            jax.random.PRNGKey(0), img, lang)
        px = jnp.asarray([[10, 20]])

        def loss_fn(p):
            out = model.apply({"params": p, "batch_stats": variables["batch_stats"]},
                              img, lang, False)
            return model.compute_loss(out, px, None)[0]

        g = jax.jit(jax.grad(loss_fn))(variables["params"])["aff_stream"]["encoder"]
        layer4 = sum(float(jnp.abs(v).sum()) for k, sub in g.items() if k.startswith("layer4")
                     for v in jax.tree_util.tree_leaves(sub))
        earlier = sum(float(jnp.abs(v).sum()) for k, sub in g.items()
                      if not k.startswith("layer4")
                      for v in jax.tree_util.tree_leaves(sub))
        return layer4, earlier

    @pytest.mark.slow
    def test_partial_freeze_trains_layer4_only(self):
        layer4, earlier = self._grads(freeze_encoder=False)
        assert layer4 > 0.0
        assert earlier == 0.0

    def test_full_freeze(self):
        layer4, earlier = self._grads(freeze_encoder=True)
        assert layer4 == 0.0 and earlier == 0.0


class TestDataset:
    @pytest.fixture(scope="class")
    def aff_dir(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("aff")
        rng = np.random.default_rng(0)
        info = {"training": {}, "validation": {}, "norm_values": {"depth": {"static_cam": {"mean": 2.0, "std": 0.5}}}}
        for split, eps in (("training", ["episode_00", "episode_01"]), ("validation", ["episode_02"])):
            for ep in eps:
                files = []
                d = root / ep / "data" / "static_cam"
                d.mkdir(parents=True)
                for i in range(4):
                    np.savez(
                        d / f"frame_{i:04d}.npz",
                        frame=rng.integers(0, 256, (100, 100, 3), np.uint8),
                        centers=np.array([[0, 30 + i, 40 + i]]),
                        depth=np.float32(2.0 + 0.1 * i),
                        lang_ann="open the drawer",
                    )
                    files.append(f"frame_{i:04d}")
                info[split][ep] = {"static_cam": files}
        (root / "episodes_split.json").write_text(json.dumps(info))
        return root

    def test_load(self, aff_dir):
        ds = AffordanceDataset(aff_dir, "training", img_resize=64,
                               lang_embedder=lambda s: np.zeros(16, np.float32))
        assert len(ds) == 8
        s = ds[0]
        assert s["frame"].shape == (100, 100, 3)
        # pixel mapped from 100 -> 64 resolution
        np.testing.assert_array_equal(s["px"], resize_pixel([30, 40], (100, 100), (64, 64)))
        assert abs(float(s["normalized_depth"]) - 0.0) < 1e-6  # (2.0-2.0)/0.5
        assert s["lang"].shape == (16,)

    def test_jitter_label_coherent(self):
        """The shifted image's pixel at the new label equals the original
        image's pixel at the old label (modulo clipping)."""
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
        px = jnp.asarray([[16, 16]] * 4)
        shifted, new_px = jitter_label_and_image(jax.random.PRNGKey(0), imgs, px, pad=4)
        for b in range(4):
            r, c = int(new_px[b, 0]), int(new_px[b, 1])
            np.testing.assert_allclose(
                np.asarray(shifted[b, r, c]), np.asarray(imgs[b, 16, 16]), atol=1e-6
            )


class TestMaskLosses:
    def test_dice_and_miou_perfect(self):
        from hulc2_tpu.affordance import losses

        mask = jnp.zeros((2, 8, 8)).at[:, 2:4, 2:4].set(1.0)
        logits = (mask * 2 - 1) * 20.0  # saturated correct prediction
        loss, metrics = losses.mask_criterion(logits.reshape(2, -1), mask)
        assert float(metrics["miou"]) > 0.99
        assert float(metrics["dice_loss"]) < 0.01
        assert float(loss) < 0.01

    def test_mask_bce_gradient(self):
        from hulc2_tpu.affordance import losses

        mask = jnp.zeros((1, 4, 4)).at[0, 1, 1].set(1.0)
        g = jax.grad(lambda z: losses.mask_criterion(z, mask)[0])(jnp.zeros((1, 16)))
        assert np.all(np.isfinite(np.asarray(g))) and float(jnp.abs(g).sum()) > 0

    def test_pixel_ce_matches_onehot(self):
        from hulc2_tpu.affordance import losses

        logits = jnp.asarray(np.random.RandomState(0).randn(3, 25), jnp.float32)
        target = jnp.zeros((3, 25)).at[jnp.arange(3), jnp.asarray([3, 7, 11])].set(1.0)
        ce = losses.pixel_cross_entropy(logits, target)
        expected = -jnp.mean(jax.nn.log_softmax(logits, -1)[jnp.arange(3), jnp.asarray([3, 7, 11])])
        np.testing.assert_allclose(float(ce), float(expected), rtol=1e-6)


class TestMaskVariant:
    def test_detector_mask_loss(self):
        model = AffordanceDetector(decoder_channels=(16, 8, 8, 8, 8), lang_embed_dim=32,
                                   depth_dist="gaussian")
        img = jnp.zeros((2, 64, 64, 3))
        lang = jnp.zeros((2, 32))
        v = jax.jit(lambda r, i, l: model.init(r, i, l, False))(
            jax.random.PRNGKey(0), img, lang)
        out = jax.jit(lambda v, i, l: model.apply(v, i, l, False))(v, img, lang)
        mask = jnp.zeros((2, 64, 64)).at[:, 10:20, 10:20].set(1.0)
        total, metrics = model.compute_mask_loss(out, mask, jnp.asarray([0.1, 0.2]))
        assert np.isfinite(float(total))
        assert "miou" in metrics and "depth_loss" in metrics

    def test_dataset_mask_mode(self, tmp_path):
        rng = np.random.default_rng(0)
        d = tmp_path / "ep0" / "data" / "static_cam"
        d.mkdir(parents=True)
        np.savez(d / "f0.npz", frame=rng.integers(0, 256, (64, 64, 3), np.uint8),
                 centers=np.array([[0, 32, 32]]), depth=np.float32(1.0), lang_ann="x")
        info = {"training": {"ep0": {"static_cam": ["f0"]}}, "validation": {},
                "norm_values": {"depth": {"static_cam": {"mean": 0, "std": 1}}}}
        (tmp_path / "episodes_split.json").write_text(json.dumps(info))
        ds = AffordanceDataset(tmp_path, "training", img_resize=64, label_type="mask",
                               lang_embedder=lambda s: np.zeros(8, np.float32))
        s = ds[0]
        assert s["mask"].shape == (64, 64) and s["mask"].sum() > 0

    def test_mask_jitter_coherent(self):
        """The mask rides through the same one-hot shift as the image: a
        shifted all-ones patch must land where the shifted image says."""
        from hulc2_tpu.affordance.dataset import jitter_mask_and_image

        imgs = jnp.zeros((2, 32, 32, 3)).at[:, 8:12, 8:12, :].set(1.0)
        mask = jnp.zeros((2, 32, 32)).at[:, 8:12, 8:12].set(1.0)
        px = jnp.asarray([[9, 9], [10, 10]])
        out_i, out_m, out_px = jitter_mask_and_image(
            jax.random.PRNGKey(3), imgs, mask, px, pad=4)
        assert out_i.shape == imgs.shape and out_m.shape == mask.shape
        # wherever the shifted image is lit, the shifted mask is lit too
        np.testing.assert_array_equal(np.asarray(out_m > 0.5),
                                      np.asarray(out_i[..., 0] > 0.5))

    @pytest.mark.slow
    def test_mask_train_cli_runs(self, tmp_path):
        """aff_detection=rn18_*_mask trains end to end on the synthetic set
        with the BCE+dice mask criterion (reference mask_data.yaml role)."""
        from hulc2_tpu.affordance.train_affordance import train

        _, _, metrics = train(
            ["aff_detection=rn18_bert_mask",
             "aff_detection.decoder_channels=[16,8,8,8,8]",
             "aff_detection.dataset.img_resize.static=32",
             "batch_size=2", "num_workers=1"],
            max_epochs=1, max_steps=2, synthetic=True,
            run_dir=tmp_path, n_synthetic=4)
        assert np.isfinite(metrics["total_loss"])
        assert "miou" in metrics


class TestAuxScripts:
    def _mined_dataset(self, root, eps, mean, std):
        import numpy as np

        split = {"training": {}, "validation": {},
                 "norm_values": {"depth": {"static_cam": {"mean": mean, "std": std}}}}
        for i, ep in enumerate(eps):
            d = root / ep / "data" / "static_cam"
            d.mkdir(parents=True)
            files = []
            for j in range(3):
                fn = f"frame_{j:04d}"
                np.savez(d / f"{fn}.npz", frame=np.zeros((8, 8, 3), np.uint8),
                         centers=np.array([[0, 4, 4]]), depth=np.float32(2.0),
                         lang_ann="open the drawer")
                files.append(fn)
            split["training" if i == 0 else "validation"][ep] = {"static_cam": files}
        (root / "episodes_split.json").write_text(json.dumps(split))

    def test_merge_datasets_pools_norms_and_loads(self, tmp_path):
        from hulc2_tpu.affordance.merge_datasets import merge_datasets

        self._mined_dataset(tmp_path / "srcA", ["episode_0"], 2.0, 0.5)
        self._mined_dataset(tmp_path / "srcB", ["episode_0", "episode_1"], 3.0, 1.0)
        m = merge_datasets(tmp_path / "out", [tmp_path / "srcA", tmp_path / "srcB"])
        assert sorted(m["training"]) == ["srcA_episode_0", "srcB_episode_0"]
        # srcA: 3 frames N(2, .5); srcB: 6 frames N(3, 1) -> pooled
        got = m["norm_values"]["depth"]["static_cam"]
        mean = (3 * 2 + 6 * 3) / 9
        var = (3 * (0.25 + (2 - mean) ** 2) + 6 * (1 + (3 - mean) ** 2)) / 9
        assert abs(got["mean"] - mean) < 1e-9 and abs(got["std"] - var ** 0.5) < 1e-9
        ds = AffordanceDataset(tmp_path / "out", "training", "static", 64)
        assert len(ds) == 6 and ds[0]["px"].tolist() == [32, 32]  # 2 train eps x 3 frames

    @pytest.mark.slow
    def test_visualize_predictions_with_errors_json(self, tmp_path):
        """visualize_dataset affordance --train-dir: trained checkpoint ->
        heatmap previews + pixel/depth error stats (the reference
        get_aff_preds.py errors.json role)."""
        from hulc2_tpu.affordance.train_affordance import train
        from hulc2_tpu.tools.visualize_dataset import visualize_affordance

        run_dir = tmp_path / "aff_run"
        train(["aff_detection.decoder_channels=[16,8,8,8,8]",
               "aff_detection.lang_embed_dim=16",
               "aff_detection.dataset.img_resize.static=32",
               "batch_size=2", "num_workers=1"],
              max_epochs=1, max_steps=1, synthetic=True, run_dir=run_dir, n_synthetic=2)
        data = tmp_path / "data"
        self._mined_dataset(data, ["episode_0", "episode_1"], 2.0, 0.5)
        out = tmp_path / "viz"
        visualize_affordance(data, train_dir=str(run_dir), out_dir=str(out), n=3)
        assert (out / "errors.json").exists()
        stats = json.loads((out / "errors.json").read_text())
        assert len(stats["samples"]) == 3
        assert np.isfinite(stats["mean_px_error"])
        assert "mean_depth_error" in stats
        assert len(list(out.glob("sample_*.png"))) == 3

    def test_move_to_pt_sanity(self):
        from hulc2_tpu.affordance.test_move_to_pt import run

        # depth 1.7 -> world z = 0.5, above the interactive env's table-top
        # EE clamp (scene_layout.EE_MIN_Z_TABLE = 0.452)
        err, ok = run(px=(120, 90), depth=1.7)
        assert ok, f"TCP err {err} too large"


class TestComputeDtype:
    @pytest.mark.slow
    def test_bf16_decoder_close_to_f32(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        lang = jnp.asarray(rng.rand(2, 64), jnp.float32)
        outs = {}
        for dt in (None, "bfloat16"):
            model = AffordanceDetector(decoder_channels=(32, 16, 8, 8, 8),
                                       lang_embed_dim=64, depth_dist=None, compute_dtype=dt)
            v = jax.jit(lambda r, i, l: model.init(r, i, l, False))(
            jax.random.PRNGKey(0), img, lang)
            out = model.apply(v, img, lang, False)
            assert out.aff_logits.dtype == jnp.float32
            outs[dt] = np.asarray(out.aff_logits)
        # bf16 decoder tracks fp32 within bf16 resolution
        denom = np.abs(outs[None]).mean()
        assert np.abs(outs[None] - outs["bfloat16"]).mean() / denom < 0.05
