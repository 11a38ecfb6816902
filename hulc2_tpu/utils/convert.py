"""PyTorch checkpoint -> flax params conversion.

The BASELINE fidelity target requires loading the reference's trained
PyTorch-Lightning checkpoints and reproducing its actions to MAE < 1e-3
(BASELINE.md "Rebuild targets"). This module converts torch ``state_dict``
tensors (numpy views) into this framework's flax parameter pytrees.

Layout rules (torch -> flax):
- Linear:   weight (out, in)        -> kernel (in, out)   [transpose]
- Conv2d:   weight (out, in, kh, kw)-> kernel (kh, kw, in, out)
- LayerNorm: weight/bias            -> scale/bias
- RNN/GRU/LSTM: weight_ih_l{k} (G*H, in) -> w_ih_l{k} (in, G*H) [transpose]
- MultiheadAttention: in_proj_weight (3E, E) -> in_proj kernel (E, 3E)
- Embedding: weight                 -> direct

The reference model's module paths (e.g.
``perceptual_encoder.rgb_static_encoder.conv_model.0.weight``,
reference: hulc2/models/hulc2.py:71-99) are remapped onto this package's
module tree by the ``HULC2_NAME_MAP`` rules below.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (works for torch tensors and numpy arrays)."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def linear(sd: Mapping, prefix: str) -> Dict[str, Any]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return {"linear": out}


def conv2d(sd: Mapping, prefix: str) -> Dict[str, Any]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return {"conv": out}


def layer_norm(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def rnn(sd: Mapping, prefix: str, num_layers: int, bidirectional: bool = False) -> Dict[str, Any]:
    out = {}
    suffixes = [""] + (["_reverse"] if bidirectional else [])
    for k in range(num_layers):
        for sfx in suffixes:
            out[f"w_ih_l{k}{sfx}"] = _t(sd[f"{prefix}.weight_ih_l{k}{sfx}"]).T
            out[f"w_hh_l{k}{sfx}"] = _t(sd[f"{prefix}.weight_hh_l{k}{sfx}"]).T
            out[f"b_ih_l{k}{sfx}"] = _t(sd[f"{prefix}.bias_ih_l{k}{sfx}"])
            out[f"b_hh_l{k}{sfx}"] = _t(sd[f"{prefix}.bias_hh_l{k}{sfx}"])
    return out


def mha(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "in_proj": {
            "kernel": _t(sd[f"{prefix}.in_proj_weight"]).T,
            "bias": _t(sd[f"{prefix}.in_proj_bias"]),
        },
        "out_proj": {
            "kernel": _t(sd[f"{prefix}.out_proj.weight"]).T,
            "bias": _t(sd[f"{prefix}.out_proj.bias"]),
        },
    }


def transformer_encoder_layer(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """torch nn.TransformerEncoderLayer -> models.layers.TransformerEncoderLayer."""
    return {
        "self_attn": mha(sd, f"{prefix}.self_attn"),
        "ff1": linear(sd, f"{prefix}.linear1"),
        "ff2": linear(sd, f"{prefix}.linear2"),
        "norm1": layer_norm(sd, f"{prefix}.norm1"),
        "norm2": layer_norm(sd, f"{prefix}.norm2"),
    }


# --------------------------------------------------------------------------- #
# reference-model specific converters                                          #
# --------------------------------------------------------------------------- #
def _stem_conv2d(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """8x8s4 stem kernel, packed for the space-to-depth stem (see
    hulc2_tpu/ops/space_to_depth.py)."""
    from hulc2_tpu.ops.space_to_depth import pack_conv_kernel

    raw = conv2d(sd, prefix)
    raw["conv"]["kernel"] = pack_conv_kernel(raw["conv"]["kernel"], 4)
    return raw


def vision_network(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """reference VisionNetwork (vision_network.py:11): conv_model.{0,2,4},
    fc1.0, fc2, ln (+ spatial_softmax.temperature when learnable)."""
    out = {
        "conv0": _stem_conv2d(sd, f"{prefix}.conv_model.0"),
        "conv1": conv2d(sd, f"{prefix}.conv_model.2"),
        "conv2": conv2d(sd, f"{prefix}.conv_model.4"),
        "fc1": linear(sd, f"{prefix}.fc1.0"),
        "fc2": linear(sd, f"{prefix}.fc2"),
        "ln": layer_norm(sd, f"{prefix}.ln"),
    }
    if f"{prefix}.spatial_softmax.temperature" in sd:
        out["temperature"] = _t(sd[f"{prefix}.spatial_softmax.temperature"])
    return out


def vision_network_gripper(sd: Mapping, prefix: str, conv_encoder: str = "nature_cnn") -> Dict[str, Any]:
    """reference gripper VisionNetwork (vision_network_gripper.py:57): the
    Sequential trunk indexes convs at 0/2/4(/6) and the linear after Flatten."""
    if conv_encoder == "nature_cnn":
        trunk = {
            "conv0": _stem_conv2d(sd, f"{prefix}.conv_model.0"),
            "conv1": conv2d(sd, f"{prefix}.conv_model.2"),
            "conv2": conv2d(sd, f"{prefix}.conv_model.4"),
            "fc": linear(sd, f"{prefix}.conv_model.7"),
        }
    elif conv_encoder == "cnn_3_layers":
        trunk = {
            "conv0": conv2d(sd, f"{prefix}.conv_model.0"),
            "conv1": conv2d(sd, f"{prefix}.conv_model.2"),
            "conv2": conv2d(sd, f"{prefix}.conv_model.4"),
            "fc": linear(sd, f"{prefix}.conv_model.7"),
        }
    else:  # cnn_4_layers
        trunk = {
            "conv0": conv2d(sd, f"{prefix}.conv_model.0"),
            "conv1": conv2d(sd, f"{prefix}.conv_model.2"),
            "conv2": conv2d(sd, f"{prefix}.conv_model.4"),
            "conv3": conv2d(sd, f"{prefix}.conv_model.6"),
            "fc": linear(sd, f"{prefix}.conv_model.9"),
        }
    return {
        "trunk": trunk,
        "fc1": linear(sd, f"{prefix}.fc1.0"),
        "fc2": linear(sd, f"{prefix}.fc2"),
        "ln": layer_norm(sd, f"{prefix}.ln"),
    }


def plan_proposal(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """reference PlanProposalNetwork (plan_proposal_net.py:8):
    fc_model.{0,2,4,6} + fc_state.0."""
    return {
        **{f"fc{i}": linear(sd, f"{prefix}.fc_model.{2 * i}") for i in range(4)},
        "fc_state": linear(sd, f"{prefix}.fc_state.0"),
    }


def plan_recognition_transformer(sd: Mapping, prefix: str, num_layers: int = 2) -> Dict[str, Any]:
    """reference PlanRecognitionTransformersNetwork (plan_recognition_net.py:77)."""
    out = {
        "position_embeddings": _t(sd[f"{prefix}.position_embeddings.weight"]),
        "fc": linear(sd, f"{prefix}.fc"),
        "fc_state": linear(sd, f"{prefix}.fc_state.0"),
    }
    for i in range(num_layers):
        out[f"layer{i}"] = transformer_encoder_layer(sd, f"{prefix}.transformer_encoder.layers.{i}")
    return out


def plan_recognition_bilstm(sd: Mapping, prefix: str, num_layers: int = 2) -> Dict[str, Any]:
    """reference PlanRecognitionBiLSTMNetwork (plan_recognition_net.py:12-41):
    ``birnn_model`` is a 2-layer bidirectional nn.LSTM; my BiLSTM posterior
    names its directions with torch's ``_reverse`` suffix convention."""
    return {
        "bilstm": rnn(sd, f"{prefix}.birnn_model", num_layers, bidirectional=True),
        "fc_state": linear(sd, f"{prefix}.fc_state.0"),
    }


def plan_recognition_birnn(sd: Mapping, prefix: str, num_layers: int = 2) -> Dict[str, Any]:
    """reference PlanRecognitionBiRNNNetwork (plan_recognition_net.py:44-74):
    bidirectional relu nn.RNN; my posterior holds one ReluRNN per layer and
    direction (fwd{k}/bwd{k}), each a single-layer stack (``*_l0`` params)."""
    out: Dict[str, Any] = {"fc_state": linear(sd, f"{prefix}.fc_state.0")}
    for k in range(num_layers):
        for mine, sfx in ((f"fwd{k}", ""), (f"bwd{k}", "_reverse")):
            out[mine] = {
                "w_ih_l0": _t(sd[f"{prefix}.birnn_model.weight_ih_l{k}{sfx}"]).T,
                "w_hh_l0": _t(sd[f"{prefix}.birnn_model.weight_hh_l{k}{sfx}"]).T,
                "b_ih_l0": _t(sd[f"{prefix}.birnn_model.bias_ih_l{k}{sfx}"]),
                "b_hh_l0": _t(sd[f"{prefix}.birnn_model.bias_hh_l{k}{sfx}"]),
            }
    return out


def goal_encoder(sd: Mapping, prefix: str, has_dropout_front: bool) -> Dict[str, Any]:
    """reference Visual/LanguageGoalEncoder (goal_encoders.py:8,37). The lang
    variant has Dropout at Sequential index 0, shifting Linear indices."""
    idx = (1, 3, 5) if has_dropout_front else (0, 2, 4)
    return {
        "fc0": linear(sd, f"{prefix}.mlp.{idx[0]}"),
        "fc1": linear(sd, f"{prefix}.mlp.{idx[1]}"),
        "fc2": linear(sd, f"{prefix}.mlp.{idx[2]}"),
        "ln": layer_norm(sd, f"{prefix}.ln"),
    }


def logistic_decoder(sd: Mapping, prefix: str, num_layers: int = 2, discrete_gripper: bool = True) -> Dict[str, Any]:
    """reference LogisticDecoderRNN (logistic_decoder_rnn.py:27)."""
    out = {
        "rnn": rnn(sd, f"{prefix}.rnn", num_layers),
        "mean_fc": linear(sd, f"{prefix}.mean_fc"),
        "log_scale_fc": linear(sd, f"{prefix}.log_scale_fc"),
        "prob_fc": linear(sd, f"{prefix}.prob_fc"),
    }
    if discrete_gripper:
        out["gripper_fc"] = linear(sd, f"{prefix}.gripper_fc")
    return out


def proj_vis_lang(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "im_fc0": linear(sd, f"{prefix}.mlp_im.0"),
        "im_fc1": linear(sd, f"{prefix}.mlp_im.2"),
        "lang_fc0": linear(sd, f"{prefix}.mlp_lang.0"),
        "lang_fc1": linear(sd, f"{prefix}.mlp_lang.2"),
    }


def convert_hulc2_checkpoint(state_dict: Mapping, model_cfg: dict) -> Dict[str, Any]:
    """Full reference Hulc2 LightningModule state_dict -> flax params tree.

    Handles the default CALVIN architecture (VisionNetwork static +
    nature_cnn gripper + transformer posterior + logistic RNN decoder).
    Lightning checkpoints store this under ckpt["state_dict"].
    """
    sd = {k: v for k, v in state_dict.items()}
    pe_cfg = model_cfg["perceptual_encoder"]
    pe: Dict[str, Any] = {
        "rgb_static": vision_network(sd, "perceptual_encoder.rgb_static_encoder")
    }
    if pe_cfg.get("rgb_gripper"):
        pe["rgb_gripper"] = vision_network_gripper(
            sd, "perceptual_encoder.rgb_gripper_encoder",
            pe_cfg["rgb_gripper"].get("conv_encoder", "nature_cnn"),
        )
    if pe_cfg.get("depth_static"):
        pe["depth_static"] = vision_network(sd, "perceptual_encoder.depth_static_encoder")
    if pe_cfg.get("depth_gripper"):
        pe["depth_gripper"] = vision_network_gripper(
            sd, "perceptual_encoder.depth_gripper_encoder",
            pe_cfg["depth_gripper"].get("conv_encoder", "nature_cnn"),
        )

    pr_kind = model_cfg["plan_recognition"].get("kind", "transformers")
    if pr_kind == "transformers":
        pr_params = plan_recognition_transformer(
            sd, "plan_recognition", model_cfg["plan_recognition"].get("num_layers", 2)
        )
    elif pr_kind == "bilstm":
        pr_params = plan_recognition_bilstm(
            sd, "plan_recognition", model_cfg["plan_recognition"].get("num_layers", 2)
        )
    elif pr_kind == "birnn":
        pr_params = plan_recognition_birnn(
            sd, "plan_recognition", model_cfg["plan_recognition"].get("num_layers", 2)
        )
    else:
        raise ValueError(pr_kind)

    params: Dict[str, Any] = {
        "perceptual_encoder": pe,
        "plan_proposal": plan_proposal(sd, "plan_proposal"),
        "plan_recognition": pr_params,
        "visual_goal": goal_encoder(sd, "visual_goal", has_dropout_front=False),
        "action_decoder": logistic_decoder(
            sd, "action_decoder",
            model_cfg["action_decoder"].get("num_layers", 2),
            model_cfg["action_decoder"].get("discrete_gripper", True),
        ),
    }
    if any(k.startswith("language_goal.") for k in sd):
        params["language_goal"] = goal_encoder(sd, "language_goal", has_dropout_front=True)
    if any(k.startswith("lang_encoder.mlp.") for k in sd):
        # model/language_encoder=default: the trainable LanguageEncoder MLP
        # (reference: hulc2/models/encoders/lang_encoder.py:16-23 — Sequential
        # [dropout, fc, act, fc, act, fc], nested via language_goal.lang_net)
        params["lang_net"] = {
            "fc0": linear(sd, "lang_encoder.mlp.1"),
            "fc1": linear(sd, "lang_encoder.mlp.3"),
            "fc2": linear(sd, "lang_encoder.mlp.5"),
        }
    if "logit_scale" in sd:
        params["logit_scale"] = _t(sd["logit_scale"]).reshape(())
        params["proj_vis_lang"] = proj_vis_lang(sd, "proj_vis_lang")
    return {"params": params}


def load_clip_text_into_lang_net(params: Dict[str, Any], clip_sd: Mapping) -> Dict[str, Any]:
    """Insert an OpenAI CLIP checkpoint's text tower into a policy params
    tree as ``lang_net`` (model/language_encoder=clip). ``clip_sd`` is the
    full CLIP state_dict (visual.* keys ignored); returns the updated tree."""
    from hulc2_tpu.models.clip_text import convert_clip_text

    text_sd = {k: v for k, v in clip_sd.items() if not k.startswith("visual.")}
    tower_params, _ = convert_clip_text(text_sd)
    out = dict(params)
    out["params"] = dict(params["params"])
    out["params"]["lang_net"] = tower_params
    return out


def load_lightning_checkpoint(path: str):
    """Load a .ckpt written by the reference trainer (torch.save format)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("state_dict", ckpt), ckpt.get("hyper_parameters", {})
