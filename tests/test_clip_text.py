"""CLIP text tower + BPE tokenizer parity against the reference's vendored
CLIP code (imported directly from /root/reference, like the other
reference-code parity suites)."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _install_reference_namespace():
    """Register reference parent packages WITHOUT running their __init__
    (hulc2.models.__init__ pulls the affordance zoo -> pkg_resources/r3m,
    absent here), same shim as tests/test_full_chain_parity.py."""
    for name, path in {
        "hulc2": f"{REF}/hulc2",
        "hulc2.models": f"{REF}/hulc2/models",
        "hulc2.models.perceptual_encoders": f"{REF}/hulc2/models/perceptual_encoders",
        "hulc2.utils": f"{REF}/hulc2/utils",
    }.items():
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = [path]
            m.__file__ = f"{path}/__init__.py"
            sys.modules[name] = m


def _import_reference_tokenizer():
    # the reference tokenizer imports ftfy only for fix_text; stub it so the
    # module imports in this ftfy-less image (identity on clean ASCII input,
    # which is all CALVIN/TACO annotations are)
    if "ftfy" not in sys.modules:
        import importlib.machinery

        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        stub.__spec__ = importlib.machinery.ModuleSpec("ftfy", None)
        sys.modules["ftfy"] = stub
    _install_reference_namespace()
    from hulc2.utils.simple_tokenizer import SimpleTokenizer

    return SimpleTokenizer()


class TestClipTokenizerParity:
    def test_encode_matches_reference_bpe(self):
        ref = _import_reference_tokenizer()
        from hulc2_tpu.utils.clip_tokenizer import ClipTokenizer

        mine = ClipTokenizer()
        sentences = [
            "push the red block to the right",
            "open the drawer",
            "turn on the yellow light bulb",
            "grasp the pink block, then rotate it left",
            "Lift the BLUE block from the sliding cabinet!",
            "move 3 blocks towards the led",
            "don't touch anything",
            "pull the handle 90 degrees",
        ]
        for s in sentences:
            assert mine.encode(s) == ref.encode(s), s

    def test_vocab_and_specials_match(self):
        ref = _import_reference_tokenizer()
        from hulc2_tpu.utils.clip_tokenizer import ClipTokenizer

        mine = ClipTokenizer()
        assert len(mine.encoder) == len(ref.encoder) == 49408
        assert mine.sot_id == ref.encoder["<|startoftext|>"]
        assert mine.eot_id == ref.encoder["<|endoftext|>"]
        # spot-check shared vocabulary entries
        for tok in ("the</w>", "block</w>", "a", "z</w>"):
            assert mine.encoder[tok] == ref.encoder[tok]

    def test_batch_framing_and_truncation(self):
        from hulc2_tpu.utils.clip_tokenizer import default_tokenizer

        t = default_tokenizer()
        arr = t(["open the drawer", " ".join(["block"] * 200)], context_length=16)
        assert arr.shape == (2, 16)
        assert arr[0, 0] == t.sot_id and t.eot_id in arr[0]
        assert arr[1, -1] == t.eot_id  # truncated row keeps EOT last

    def test_decode_roundtrip(self):
        from hulc2_tpu.utils.clip_tokenizer import ClipTokenizer

        t = ClipTokenizer()
        s = "place the red block in the drawer"
        assert t.decode(t.encode(s)).strip() == s


class TestClipTextTransformerParity:
    def _tiny_reference_clip(self):
        torch = pytest.importorskip("torch")
        _install_reference_namespace()
        # stub heavy deps the text path never touches (same as the
        # full-chain parity suite's vendored-CLIP import)
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tr = types.ModuleType("torchvision.transforms")
            for n in ("CenterCrop", "Compose", "Normalize", "Resize", "ToTensor"):
                setattr(tr, n, object)
            tv.transforms = tr
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tr
        if "tqdm" not in sys.modules:
            tq = types.ModuleType("tqdm")
            tq.tqdm = lambda x, **k: x
            sys.modules["tqdm"] = tq
        _import_reference_tokenizer()  # installs the ftfy stub
        from hulc2.models.perceptual_encoders.clip import CLIP

        torch.manual_seed(0)
        model = CLIP(
            embed_dim=32,
            image_resolution=32,
            vision_layers=(1, 1, 1, 1),
            vision_width=16,
            vision_patch_size=None,
            context_length=12,
            vocab_size=64,
            transformer_width=32,
            transformer_heads=2,
            transformer_layers=2,
        )
        return model.eval()

    def test_encode_text_matches_reference(self):
        torch = pytest.importorskip("torch")
        ref = self._tiny_reference_clip()
        from hulc2_tpu.models.clip_text import ClipTextTransformer, convert_clip_text

        sd = {k: v for k, v in ref.state_dict().items()}
        params, kwargs = convert_clip_text(sd, heads=2)
        tower = ClipTextTransformer(**kwargs)

        rng = np.random.RandomState(0)
        tokens = np.zeros((4, 12), np.int64)
        for i in range(4):
            n = rng.randint(3, 10)
            tokens[i, 0] = 60  # "SOT"-ish mid-range ids; EOT must be the max
            tokens[i, 1 : n - 1] = rng.randint(1, 50, n - 2)
            tokens[i, n - 1] = 63
        with torch.no_grad():
            want = ref.encode_text(torch.from_numpy(tokens)).numpy()
        got = tower.apply({"params": params}, jnp.asarray(tokens, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    @pytest.mark.slow
    def test_gradients_flow_unless_frozen(self):
        from hulc2_tpu.models.clip_text import ClipTextTransformer

        tokens = jnp.asarray(np.random.RandomState(1).randint(1, 60, (2, 12)), jnp.int32)
        for frozen, expect_grad in ((False, True), (True, False)):
            tower = ClipTextTransformer(
                vocab_size=64, context_length=12, width=32, heads=2, layers=1,
                output_dim=16, frozen=frozen,
            )
            params = tower.init(jax.random.PRNGKey(0), tokens)["params"]
            g = jax.grad(lambda p: jnp.sum(tower.apply({"params": p}, tokens) ** 2))(params)
            total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
            assert (total > 0) == expect_grad, (frozen, total)


class TestInLoopLanguageTower:
    @pytest.mark.slow
    def test_train_step_backprops_through_clip_tower(self):
        """Config #3 end-to-end: batch carries BPE token ids, the policy's
        in-graph CLIP text tower embeds them inside the jitted train step,
        and gradients reach the tower parameters."""
        import hulc2_tpu.configs  # noqa: F401
        from hulc2_tpu.core import config as cfg_lib
        from hulc2_tpu.data.device_transforms import make_batch_transform
        from hulc2_tpu.data.statistics import DatasetStatistics
        from hulc2_tpu.models.build import build_policy
        from hulc2_tpu.train import optim
        from hulc2_tpu.train.state import create_train_state
        from hulc2_tpu.train.steps import make_train_step

        cfg = cfg_lib.compose(
            "cfg_low_level",
            [
                "model/language_encoder=clip",
                "model.language_encoder.layers=1",
                "model.language_encoder.width=32",
                "model.language_encoder.heads=2",
                "model.language_encoder.vocab_size=128",
                "model.language_encoder.context_length=16",
                "model.language_encoder.output_dim=24",
                "model.plan_proposal.hidden_size=32",
                "model.plan_recognition.encoder_hidden_size=32",
                "model.plan_recognition.fc_hidden_size=32",
                "model.action_decoder.hidden_size=32",
                "model.visual_goal.hidden_size=32",
                "model.language_goal.hidden_size=32",
                "model.compute_dtype=float32",
            ],
        )
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
                d["lang"] = rng.randint(1, 120, (b, 16)).astype(np.int32)  # token ids
                d["use_for_aux_lang_loss"] = np.ones(b, bool)
            return d

        batch = {"vis": raw_mod(False), "lang": raw_mod(True)}
        tf = make_batch_transform(
            dm_cfg["observation_space"], dm_cfg["proprioception_dims"], DatasetStatistics(),
            "play_basic", False,
        )
        tx = optim.make_optimizer(cfg["model"]["optimizer"], None, 100)
        key = jax.random.PRNGKey(0)

        def init_fn():
            tfd = {m: tf(key, jax.tree_util.tree_map(jnp.asarray, batch[m])) for m in batch}
            return model.init({"params": key, "sample": key, "dropout": key}, tfd)

        state = create_train_state(init_fn, tx)
        assert "lang_net" in state.params["params"], sorted(state.params["params"])
        before = jax.tree_util.tree_map(np.asarray, state.params["params"]["lang_net"])

        step = make_train_step(model, tx, {"vis": tf, "lang": tf}, 3.0, donate=False)
        new_state, metrics = step(state, jax.tree_util.tree_map(jnp.asarray, batch), key,
                                  jnp.asarray(0.01))
        assert np.isfinite(float(metrics["loss"]))
        after = new_state.params["params"]["lang_net"]
        moved = sum(
            float(jnp.sum(jnp.abs(a - jnp.asarray(bv))))
            for a, bv in zip(jax.tree_util.tree_leaves(after), jax.tree_util.tree_leaves(before))
        )
        assert moved > 0, "CLIP tower params did not update"

    def test_string_annotations_tokenize_in_window_dataset(self):
        """load_lang_embeddings=False: the window dataset emits (77,) int32
        CLIP token ids instead of embeddings."""
        from hulc2_tpu.data.episode_index import EpisodeIndex

        idx = EpisodeIndex(
            episode_lookup=np.arange(4, dtype=np.int64),
            min_window_size=2,
            max_window_size=2,
            validation=False,
            lang_lookup=np.asarray([0, 0, 1, 1]),
            lang_ann=np.asarray(["open the drawer", "push the red block"], dtype=object),
            lang_tasks=["open_drawer", "push_red"],
            aux_lang_loss_window=1,
        )

        class _Store:
            def load_window(self, start, n):
                return {
                    "rgb_static": np.zeros((n, 8, 8, 3), np.uint8),
                    "robot_obs": np.zeros((n, 15), np.float32),
                    "rel_actions": np.zeros((n, 7), np.float32),
                }

        from hulc2_tpu.data.window_dataset import WindowDataset

        ds = WindowDataset(idx, _Store(), {"rgb_obs": ["rgb_static"], "depth_obs": [],
                                           "state_obs": ["robot_obs"], "actions": ["rel_actions"]})
        sample = ds[2]
        assert sample["lang"].dtype == np.int32 and sample["lang"].shape == (77,)
        assert sample["lang"][0] == 49406  # SOT


class TestLangNetConverters:
    def test_lang_encoder_mlp_parity(self):
        """Reference LanguageEncoder MLP (model/language_encoder=default) vs
        LanguageEncoderMLP with converted weights."""
        torch = pytest.importorskip("torch")
        _install_reference_namespace()
        import importlib

        lang_mod = importlib.import_module("hulc2.models.encoders.lang_encoder")
        torch.manual_seed(0)
        ref = lang_mod.LanguageEncoder(384, 64, 32, 0.0, "ReLU").eval()

        from hulc2_tpu.models.goal_encoders import LanguageEncoderMLP
        from hulc2_tpu.utils.convert import linear

        sd = ref.state_dict()
        params = {
            "fc0": linear(sd, "mlp.1"),
            "fc1": linear(sd, "mlp.3"),
            "fc2": linear(sd, "mlp.5"),
        }
        mine = LanguageEncoderMLP(out_features=32, hidden_size=64)
        x = np.random.RandomState(0).randn(4, 384).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got = mine.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_load_clip_text_into_policy_params(self):
        """An OpenAI CLIP state_dict's text side drops into a built policy's
        lang_net slot and the policy step runs with token goals."""
        torch = pytest.importorskip("torch")
        ref = TestClipTextTransformerParity()._tiny_reference_clip()

        import hulc2_tpu.configs  # noqa: F401
        from hulc2_tpu.core import config as cfg_lib
        from hulc2_tpu.evaluation.loading import init_params
        from hulc2_tpu.models.build import build_policy
        from hulc2_tpu.utils.convert import load_clip_text_into_lang_net

        cfg = cfg_lib.compose(
            "cfg_low_level",
            [
                "model/language_encoder=clip",
                "model.language_encoder.layers=2",
                "model.language_encoder.width=32",
                "model.language_encoder.heads=2",
                "model.language_encoder.vocab_size=64",
                "model.language_encoder.context_length=12",
                "model.language_encoder.output_dim=32",
                "model.plan_proposal.hidden_size=32",
                "model.plan_recognition.encoder_hidden_size=32",
                "model.plan_recognition.fc_hidden_size=32",
                "model.action_decoder.hidden_size=32",
                "model.visual_goal.hidden_size=32",
                "model.language_goal.hidden_size=32",
                "model.compute_dtype=float32",
            ],
        )
        model = build_policy(cfg["model"])
        params = init_params(model, cfg)
        merged = load_clip_text_into_lang_net(params, ref.state_dict())

        tokens = np.zeros((1, 12), np.int64)
        tokens[0, 0], tokens[0, 1], tokens[0, 2] = 60, 5, 63
        with torch.no_grad():
            want = ref.encode_text(torch.from_numpy(tokens)).numpy()
        got = model.apply(
            merged, jnp.asarray(tokens, jnp.int32), method=lambda m, t: m.apply_lang_net(t)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.slow
def test_offline_clip_text_encoder_interface():
    """Self-contained host-side encode_text (no HF assets): in-repo tokenizer
    + flax tower, matching the language-encoder zoo interface."""
    from hulc2_tpu.models.language import OfflineClipTextEncoder

    enc = OfflineClipTextEncoder(None, layers=1, width=32, heads=2, output_dim=16,
                                 context_length=16)
    emb, toks, mask = enc.encode_text(["open the drawer", "push the red block"])
    assert emb.shape == (2, 16) and emb.dtype == np.float32
    same = enc(["open the drawer"])
    np.testing.assert_allclose(same[0], emb[0], atol=1e-6)
