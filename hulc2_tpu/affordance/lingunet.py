"""Language-fused U-Net affordance stream.

TPU-native counterpart of the reference's RNLingunet / UnetLangFusionDecoder
(reference: hulc2/affordance/models/visual_lang_encoders/rn_lingunet.py:9,
hulc2/affordance/models/core/unet_decoder.py:33-140): a (frozen) ResNet
feature pyramid + a U-Net decoder whose first three blocks fuse a language
embedding (tile-mult by default) with a per-scale linear projection, nearest
upsampling, double conv+BN+ReLU, then a 3x3 segmentation head producing one
logit per pixel.

All convs NHWC; BN is torch-style with live batch stats when training the
decoder (the encoder stays frozen with running stats).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc2_tpu.affordance.fusion import FUSERS
from hulc2_tpu.models.layers import Dense
from hulc2_tpu.models.resnet import ResNet


class Conv2dBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding=self.kernel // 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, momentum=0.9,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class DecoderBlock(nn.Module):
    out_channels: int
    fuse: Optional[str] = None  # fusion module name or None
    lang_embed_dim: int = 1024
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, lang=None, skip=None, out_hw=None, train: bool = False):
        if self.fuse is not None and lang is not None:
            proj = Dense(x.shape[-1], dtype=self.dtype, name="lang_proj")
            x = FUSERS[self.fuse](name="fuser")(x, lang, lang_proj=proj)
        # nearest upsample to the skip's (or requested) resolution
        if skip is not None:
            factor = skip.shape[1] // x.shape[1]
        elif out_hw is not None:
            factor = out_hw[0] // x.shape[1]
        else:
            factor = 2
        if factor > 1:
            # nearest upsample as broadcast+reshape (exactly jnp.repeat along h
            # then w, but lowers to one broadcast whose backward is a single
            # contiguous reduction — measurably faster than repeat's
            # gather/scatter pair on TPU)
            n, h, w, c = x.shape
            x = jnp.broadcast_to(
                x[:, :, None, :, None, :], (n, h, factor, w, factor, c)
            ).reshape(n, h * factor, w * factor, c)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = Conv2dBNReLU(self.out_channels, dtype=self.dtype, name="conv1")(x, train)
        x = Conv2dBNReLU(self.out_channels, dtype=self.dtype, name="conv2")(x, train)
        return x


class UnetLangFusionDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    fusion_type: str = "mult"
    lang_embed_dim: int = 1024
    n_fused_blocks: int = 3  # language fusion on the deepest 3 blocks
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, lang, features: List[jnp.ndarray], train: bool = False):
        out_hw = features[0].shape[1:3]
        feats = features[1:][::-1]  # deepest first, drop input-resolution echo
        x, skips = feats[0], feats[1:]
        for i, ch in enumerate(self.decoder_channels):
            fuse = self.fusion_type if i < self.n_fused_blocks else None
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(ch, fuse, self.lang_embed_dim, dtype=self.dtype,
                             name=f"block{i}")(x, lang, skip, out_hw, train)
        return x


class LingUNet(nn.Module):
    """encoder pyramid -> lang-fused decoder -> per-pixel affordance logits."""

    encoder_name: str = "resnet18"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    fusion_type: str = "mult"
    lang_embed_dim: int = 1024
    n_classes: int = 1
    freeze_encoder: bool = True
    # bf16 decoder compute (params/BN stats stay fp32); the frozen encoder
    # runs fp32 — opt-in perf knob, default exact-fp32
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img, lang, train: bool = False):
        """img (B, H, W, 3) float; lang (B, E). Returns (logits (B,H,W,1),
        bottleneck features)."""
        if self.encoder_name == "clip_rn50":
            # CLIP ModifiedResNet prepool pyramid (the reference CLIPLingUNet
            # stream, rn50_clip_lingunet.py:36); attention-pool output unused
            # here — the text side supplies the language embedding
            from hulc2_tpu.models.clip_resnet import ClipModifiedResNet

            _, pyramid = ClipModifiedResNet(name="encoder")(img)
            feats = [img] + pyramid
            if self.freeze_encoder:
                feats = [jax.lax.stop_gradient(f) for f in feats]
        elif self.encoder_name == "r3m_rn18":
            # R3M ResNet18 stream (reference: visual_lang_encoders/
            # r3m_rn18.py:10-43): stem+layer1..3 are ALWAYS frozen; layer4
            # trains when freeze_encoder=False. Weights load from an R3M
            # checkpoint via pretrained_vision.convert_r3m_checkpoint.
            feats = ResNet("resnet18",
                           frozen_stages=5 if self.freeze_encoder else 4,
                           name="encoder")(img)
        else:
            feats = ResNet(self.encoder_name, name="encoder")(img)
            if self.freeze_encoder:
                feats = [jax.lax.stop_gradient(f) for f in feats]
        dec = UnetLangFusionDecoder(
            tuple(self.decoder_channels), self.fusion_type, self.lang_embed_dim,
            dtype=self.compute_dtype, name="decoder"
        )(lang, feats, train)
        logits = nn.Conv(self.n_classes, (3, 3), padding=1, dtype=self.compute_dtype,
                         name="seg_head")(dec)
        return logits.astype(jnp.float32), feats[-1]
