"""Auxiliary-loss networks.

(reference: hulc2/models/auxiliary_loss_networks/proj_vis_lang.py:7,
 state_decoder.py:7, bc_z_lang_decoder.py:5, mia_lang_discriminator.py:5,
 hulc2/models/decoders/clip_proj.py:7)
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc2_tpu.models.layers import Dense


class ProjVisLang(nn.Module):
    """Two small MLPs projecting seq visual features and language goals into a
    shared space for the CLIP-style contrastive auxiliary loss."""

    output_dim: int = 32
    proj_lang: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, vis_emb, lang_emb) -> Tuple[jnp.ndarray, jnp.ndarray]:
        v = Dense(128, dtype=self.dtype, name="im_fc0")(vis_emb)
        v = Dense(self.output_dim, dtype=self.dtype, name="im_fc1")(jax.nn.relu(v))
        if self.proj_lang:
            l = Dense(128, dtype=self.dtype, name="lang_fc0")(lang_emb)
            l = Dense(self.output_dim, dtype=self.dtype, name="lang_fc1")(jax.nn.relu(l))
        else:
            l = lang_emb
        return v, l


class StateDecoder(nn.Module):
    """Reconstruct proprioceptive state from the visual embedding (aux loss,
    reference: state_decoder.py:7)."""

    n_state_obs: int = 8
    hidden_size: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, visual_emb):
        x = jax.nn.relu(Dense(self.hidden_size, dtype=self.dtype, name="fc0")(visual_emb))
        return Dense(self.n_state_obs, dtype=self.dtype, name="fc1")(x)


class BCZLangDecoder(nn.Module):
    """Predict the language embedding from visual seq features (BC-Z style
    aux loss, reference: bc_z_lang_decoder.py:5)."""

    lang_dim: int = 384
    hidden_size: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, seq_vis_feat):
        x = jax.nn.relu(Dense(self.hidden_size, dtype=self.dtype, name="fc0")(seq_vis_feat))
        return Dense(self.lang_dim, dtype=self.dtype, name="fc1")(x)


class MIALangDiscriminator(nn.Module):
    """Vision/language agreement discriminator (MIA-style aux loss,
    reference: mia_lang_discriminator.py:5)."""

    hidden_size: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, vis_feat, lang_emb):
        x = jnp.concatenate([vis_feat, lang_emb], axis=-1)
        x = jax.nn.relu(Dense(self.hidden_size, dtype=self.dtype, name="fc0")(x))
        return Dense(1, dtype=self.dtype, name="fc1")(x)


class LangTaskHead(nn.Module):
    """Task-classification head over the language-encoder output.

    The reference conditions on FROZEN pretrained sentence embeddings (SBERT,
    language_network.py:13), which arrive already task-separable. A
    from-scratch in-graph tower trained only by behavior cloning + the CLIP
    aux loss does not learn word-level distinctions ("left"/"right",
    "on"/"off", block colors) from ~10k windows — measured: paraphrase ->
    canonical task retrieval 45% in the trained tower's embedding space, and
    the online policy half-ignores language. This head adds the missing
    sentence-level supervision (same aux-loss family as BC-Z/MIA,
    gcbc.py:95-180): cross-entropy to the auto-annotator's task label, which
    the data pipeline already carries. Training-only; inference never calls
    it."""

    n_tasks: int = 34
    hidden_size: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, lang_emb):
        x = jax.nn.relu(Dense(self.hidden_size, dtype=self.dtype, name="fc0")(lang_emb))
        return Dense(self.n_tasks, dtype=jnp.float32, name="fc1")(x)


class ClipProj(nn.Module):
    """Linear projection head used by CLIP-feature decoders
    (reference: hulc2/models/decoders/clip_proj.py:7)."""

    output_dim: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return Dense(self.output_dim, dtype=self.dtype, name="proj")(x)
