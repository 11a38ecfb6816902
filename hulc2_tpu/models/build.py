"""Model factories: config dicts -> flax modules.

The TPU-native analogue of Hydra ``_target_`` instantiation
(reference: hulc2/models/hulc2.py:71-92, hulc2/models/__init__.py:13-31).
``build_policy(model_cfg)`` wires input sizes across components the way the
reference's ``setup_input_sizes`` does (hulc2.py:126-158).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.models.aux_nets import ProjVisLang
from hulc2_tpu.models.decoders import DeterministicDecoder, LogisticPolicyDecoder
from hulc2_tpu.models.distributions import PlanDistribution
from hulc2_tpu.models.goal_encoders import LanguageGoalEncoder, VisualGoalEncoder
from hulc2_tpu.models.hulc2 import Hulc2
from hulc2_tpu.models.perceptual import ConcatEncoders
from hulc2_tpu.models.plan_nets import (
    PlanProposalNetwork,
    PlanRecognitionBiLSTM,
    PlanRecognitionBiRNN,
    PlanRecognitionTransformer,
)
from hulc2_tpu.models.vision import VisionConv, VisionNetwork, VisionNetworkGripper

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _dtype(cfg):
    return _DTYPES[cfg.get("compute_dtype", "float32")]


@cfg_lib.factory("vision_network")
def _vision_network(**kw):
    kw.pop("input_width", None), kw.pop("input_height", None), kw.pop("num_c", None)
    dtype = _DTYPES[kw.pop("compute_dtype", "float32")]
    return VisionNetwork(dtype=dtype, **kw)


@cfg_lib.factory("vision_network_gripper")
def _vision_gripper(**kw):
    kw.pop("input_width", None), kw.pop("input_height", None), kw.pop("num_c", None)
    dtype = _DTYPES[kw.pop("compute_dtype", "float32")]
    return VisionNetworkGripper(dtype=dtype, **kw)


@cfg_lib.factory("vision_conv")
def _vision_conv(**kw):
    kw.pop("input_width", None), kw.pop("input_height", None), kw.pop("num_c", None)
    dtype = _DTYPES[kw.pop("compute_dtype", "float32")]
    return VisionConv(dtype=dtype, **kw)


@cfg_lib.factory("vision_r3m")
def _vision_r3m(**kw):
    from hulc2_tpu.models.pretrained_vision import VisionR3M

    dtype = _DTYPES[kw.pop("compute_dtype", "float32")]
    return VisionR3M(dtype=dtype, **kw)


@cfg_lib.factory("vision_clip")
def _vision_clip(**kw):
    from hulc2_tpu.models.pretrained_vision import VisionClip

    dtype = _DTYPES[kw.pop("compute_dtype", "float32")]
    return VisionClip(dtype=dtype, **kw)


@cfg_lib.factory("vision_resnet")
def _vision_resnet(**kw):
    from hulc2_tpu.models.pretrained_vision import VisionResNet

    dtype = _DTYPES[kw.pop("compute_dtype", "float32")]
    return VisionResNet(dtype=dtype, **kw)


@cfg_lib.factory("vision_resnet_aff")
def _vision_resnet_aff(**kw):
    from hulc2_tpu.models.pretrained_vision import VisionResNetAff

    kw.pop("input_shape", None)  # flax infers shapes; reference passes [H,W,C]
    dtype = _DTYPES[kw.pop("compute_dtype", "float32")]
    return VisionResNetAff(dtype=dtype, **kw)


@cfg_lib.factory("tactile_encoder")
def _tactile(**kw):
    from hulc2_tpu.models.pretrained_vision import TactileEncoder

    dtype = _DTYPES[kw.pop("compute_dtype", "float32")]
    return TactileEncoder(dtype=dtype, **kw)


def build_encoder(enc_cfg: Optional[dict]):
    if enc_cfg is None:
        return None
    return cfg_lib.instantiate(enc_cfg)


def build_perceptual_encoder(pe_cfg: dict) -> ConcatEncoders:
    proprio = pe_cfg.get("proprio")
    proprio_dim = proprio["n_state_obs"] if proprio else 0
    return ConcatEncoders(
        rgb_static=build_encoder(pe_cfg["rgb_static"]),
        rgb_gripper=build_encoder(pe_cfg.get("rgb_gripper")),
        depth_static=build_encoder(pe_cfg.get("depth_static")),
        depth_gripper=build_encoder(pe_cfg.get("depth_gripper")),
        tactile=build_encoder(pe_cfg.get("tactile")),
        proprio_dim=proprio_dim,
    )


def perceptual_latent_size(pe_cfg: dict) -> int:
    size = 0
    for cam in ("rgb_static", "depth_static", "rgb_gripper", "depth_gripper", "tactile"):
        sub = pe_cfg.get(cam)
        if sub:
            size += sub["visual_features"]
    if pe_cfg.get("proprio"):
        size += pe_cfg["proprio"]["n_state_obs"]
    return size


def build_distribution(d_cfg: dict) -> PlanDistribution:
    return PlanDistribution(
        dist=d_cfg["dist"],
        category_size=d_cfg.get("category_size", 0),
        class_size=d_cfg.get("class_size", 0),
        plan_features=d_cfg.get("plan_features", 0),
    )


def build_plan_recognition(pr_cfg: dict, dist: PlanDistribution, dtype):
    kind = pr_cfg.get("kind", "transformers")
    if kind == "transformers":
        return PlanRecognitionTransformer(
            dist=dist,
            num_heads=pr_cfg.get("num_heads", 8),
            num_layers=pr_cfg.get("num_layers", 2),
            encoder_hidden_size=pr_cfg.get("encoder_hidden_size", 2048),
            fc_hidden_size=pr_cfg.get("fc_hidden_size", 4096),
            max_position_embeddings=pr_cfg.get("max_position_embeddings", 32),
            dropout_p=pr_cfg.get("dropout_p", 0.1),
            encoder_normalize=pr_cfg.get("encoder_normalize", False),
            positional_normalize=pr_cfg.get("positional_normalize", False),
            dtype=dtype,
        )
    if kind == "bilstm":
        return PlanRecognitionBiLSTM(dist=dist, dtype=dtype)
    if kind == "birnn":
        return PlanRecognitionBiRNN(dist=dist, dtype=dtype)
    raise ValueError(kind)


def build_action_decoder(ad_cfg: dict, dtype) -> LogisticPolicyDecoder:
    kind = ad_cfg.get("kind", "logistic")
    common = dict(
        out_features=ad_cfg.get("out_features", 7),
        hidden_size=ad_cfg.get("hidden_size", 2048),
        num_layers=ad_cfg.get("num_layers", 2),
        rnn_model=ad_cfg.get("rnn_model", "rnn_decoder"),
        policy_rnn_dropout_p=ad_cfg.get("policy_rnn_dropout_p", 0.0),
        perceptual_emb_slice=tuple(ad_cfg.get("perceptual_emb_slice", (64, 128))),
        gripper_control=ad_cfg.get("gripper_control", True),
        dtype=dtype,
    )
    if kind == "logistic":
        return LogisticPolicyDecoder(
            n_mixtures=ad_cfg.get("n_mixtures", 10),
            log_scale_min=ad_cfg.get("log_scale_min", -7.0),
            num_classes=ad_cfg.get("num_classes", 10),
            gripper_alpha=ad_cfg.get("gripper_alpha", 1.0),
            discrete_gripper=ad_cfg.get("discrete_gripper", True),
            act_max_bound=tuple(ad_cfg.get("act_max_bound", (1.0,) * 7)),
            act_min_bound=tuple(ad_cfg.get("act_min_bound", (-1.0,) * 7)),
            **common,
        )
    if kind == "deterministic":
        return DeterministicDecoder(criterion=ad_cfg.get("criterion", "HuberLoss"), **common)
    raise ValueError(kind)


def build_lang_net(cfg: Optional[dict], dtype):
    """model/language_encoder group -> optional in-graph language network
    (reference groups conf/model/language_encoder/*: none / trainable MLP /
    text tower; the clip variant consumes BPE token ids)."""
    if not cfg or cfg.get("_name_") in (None, "none"):
        return None
    name = cfg["_name_"]
    if name == "lang_mlp":
        from hulc2_tpu.models.goal_encoders import LanguageEncoderMLP

        return LanguageEncoderMLP(
            out_features=cfg.get("out_features", 256),
            hidden_size=cfg.get("hidden_size", 2048),
            word_dropout_p=cfg.get("word_dropout_p", 0.0),
            activation_function=cfg.get("activation_function", "ReLU"),
            dtype=dtype,
        )
    if name == "clip_text":
        from hulc2_tpu.models.clip_text import ClipTextTransformer

        return ClipTextTransformer(
            vocab_size=cfg.get("vocab_size", 49408),
            context_length=cfg.get("context_length", 77),
            width=cfg.get("width", 512),
            heads=cfg.get("heads", 8),
            layers=cfg.get("layers", 12),
            output_dim=cfg.get("output_dim", 1024),
            frozen=cfg.get("frozen", False),
        )
    raise ValueError(f"unknown language_encoder {name}")


def build_policy(model_cfg: dict) -> Hulc2:
    """Assemble the full HULC2 (or GCBC) policy model from a model config."""
    dtype = _dtype(model_cfg)
    dist = build_distribution(model_cfg["distribution"])
    pe_cfg = model_cfg["perceptual_encoder"]

    lg_cfg = model_cfg.get("language_goal")
    lang_goal = (
        LanguageGoalEncoder(
            latent_goal_features=lg_cfg.get("latent_goal_features", 32),
            hidden_size=lg_cfg.get("hidden_size", 2048),
            word_dropout_p=lg_cfg.get("word_dropout_p", 0.0),
            l2_normalize_goal_embeddings=lg_cfg.get("l2_normalize_goal_embeddings", False),
            dtype=dtype,
        )
        if lg_cfg
        else None
    )
    vg_cfg = model_cfg["visual_goal"]
    use_clip = model_cfg.get("use_clip_auxiliary_loss", True)
    from hulc2_tpu.models.aux_nets import (
        BCZLangDecoder,
        LangTaskHead,
        MIALangDiscriminator,
        StateDecoder,
    )

    proprio_dim = (pe_cfg.get("proprio") or {}).get("n_state_obs", 8)
    # the bc_z aux loss compares the decoder prediction against lang_emb,
    # which is POST-lang_net when a language_encoder is configured — derive
    # its dimension from the encoder's output, not language_goal.in_features
    le_cfg = model_cfg.get("language_encoder") or {}
    le_name = le_cfg.get("_name_")
    if le_name == "clip_text":
        lang_dim = le_cfg.get("output_dim", 1024)
    elif le_name == "lang_mlp":
        lang_dim = le_cfg.get("out_features", 256)
    else:
        lang_dim = (lg_cfg or {}).get("in_features", 384)
    state_dec = StateDecoder(n_state_obs=proprio_dim, dtype=dtype) if model_cfg.get("use_state_recons") else None
    bcz = BCZLangDecoder(lang_dim=lang_dim, dtype=dtype) if model_cfg.get("use_bc_z_auxiliary_loss") else None
    mia = MIALangDiscriminator(dtype=dtype) if model_cfg.get("use_mia_auxiliary_loss") else None
    lth = (
        LangTaskHead(n_tasks=int(model_cfg.get("lang_task_classes", 34)), dtype=dtype)
        if model_cfg.get("use_lang_task_auxiliary_loss")
        else None
    )
    return Hulc2(
        perceptual_encoder=build_perceptual_encoder(pe_cfg),
        plan_proposal=PlanProposalNetwork(
            dist=dist,
            hidden_size=model_cfg["plan_proposal"].get("hidden_size", 2048),
            dtype=dtype,
        ),
        plan_recognition=build_plan_recognition(model_cfg["plan_recognition"], dist, dtype),
        visual_goal=VisualGoalEncoder(
            latent_goal_features=vg_cfg.get("latent_goal_features", 32),
            hidden_size=vg_cfg.get("hidden_size", 2048),
            l2_normalize_goal_embeddings=vg_cfg.get("l2_normalize_goal_embeddings", False),
            dtype=dtype,
        ),
        language_goal=lang_goal,
        lang_net=build_lang_net(model_cfg.get("language_encoder"), dtype),
        action_decoder=build_action_decoder(model_cfg["action_decoder"], dtype),
        proj_vis_lang=ProjVisLang(
            output_dim=model_cfg.get("proj_vis_lang", {}).get("output_dim", 32), dtype=dtype
        )
        if use_clip
        else None,
        dist=dist,
        kl_balancing_mix=model_cfg.get("kl_balancing_mix", 0.8),
        use_clip_auxiliary_loss=use_clip,
        use_plan=model_cfg.get("use_plan", True),
        replan_freq=model_cfg.get("replan_freq", 30),
        state_decoder=state_dec,
        bcz_lang_decoder=bcz,
        mia_discriminator=mia,
        lang_task_head=lth,
    )
