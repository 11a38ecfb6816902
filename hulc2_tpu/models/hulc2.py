"""HULC2 policy model: goal-conditioned latent-plan CVAE, TPU-native.

Re-design of the reference LightningModule (reference: hulc2/models/hulc2.py:27)
as a pure flax module + pure loss functions:

- **Fused multi-modal pass.** The reference iterates {vis, lang} dataset
  batches sequentially through the encoders (hulc2.py:379-404). Here both
  modalities are concatenated along the batch axis and encoded in ONE pass —
  shared weights, twice-as-large MXU matmuls — then per-modality losses are
  recovered by splitting per-sample loss vectors. With equal sub-batch sizes
  this reproduces the reference's ``total_loss / len(batch)`` exactly.
- **Stateful rollout as explicit carry.** ``reset``/``step`` with mutable
  ``self.plan``/``self.hidden_state`` (hulc2.py:600-653) become a functional
  ``policy_step`` whose carry (plan, latent goal, RNN hidden, step counter)
  threads through one jitted function; replanning every ``replan_freq`` steps
  is a ``lax.cond`` — so a whole rollout never leaves the device except for
  the simulator round-trip.
- **Masked CLIP aux loss.** The reference boolean-indexes the masked subset
  (hulc2.py:489-507) — a dynamic shape. We compute the same quantity with
  static shapes by masking logits columns to -inf and averaging row CE over
  valid rows (exact: softmax over the valid subset only).

GCBC (reference: hulc2/models/gcbc.py:11) is this module with
``use_plan=False``: empty plan fed to the decoder, no KL term.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc2_tpu.models.decoders import DecoderOutput, LogisticPolicyDecoder
from hulc2_tpu.models.distributions import PlanDistribution, State
from hulc2_tpu.models.goal_encoders import LanguageGoalEncoder, VisualGoalEncoder
from hulc2_tpu.models.perceptual import ConcatEncoders
from hulc2_tpu.models.plan_nets import PlanProposalNetwork


class PolicyCarry(NamedTuple):
    """Device-resident rollout state."""

    plan: jnp.ndarray  # (B, plan_features)
    latent_goal: jnp.ndarray  # (B, goal_features)
    hidden: Any  # decoder RNN carry pytree
    step: jnp.ndarray  # (B,) int32 rollout step counters


class Hulc2(nn.Module):
    perceptual_encoder: ConcatEncoders
    plan_proposal: PlanProposalNetwork
    plan_recognition: nn.Module
    visual_goal: VisualGoalEncoder
    language_goal: Optional[LanguageGoalEncoder]
    action_decoder: LogisticPolicyDecoder
    proj_vis_lang: Optional[nn.Module]
    dist: PlanDistribution
    # optional in-graph language network applied to the batch "lang" value
    # BEFORE the goal encoder (reference: hulc2.py:87-89 lang_encoder nested
    # into LanguageGoalEncoder; model/language_encoder group): the trainable
    # MLP over precomputed embeddings, or the CLIP text tower over BPE token
    # ids (backprop through the tower — BASELINE config #3)
    lang_net: Optional[nn.Module] = None
    kl_balancing_mix: float = 0.8
    use_clip_auxiliary_loss: bool = True
    use_plan: bool = True  # False => GCBC baseline
    replan_freq: int = 30
    # optional auxiliary losses (reference: hulc2/models/gcbc.py:95-180 —
    # state_recons / lang_recons (BC-Z) / lang_contrastive (MIA)); betas are
    # applied by the training step from the loss config
    state_decoder: Optional[nn.Module] = None
    bcz_lang_decoder: Optional[nn.Module] = None
    mia_discriminator: Optional[nn.Module] = None
    # task-CE supervision on the language tower output — the from-scratch
    # substitute for the task separability the reference inherits from frozen
    # SBERT embeddings (aux_nets.LangTaskHead)
    lang_task_head: Optional[nn.Module] = None

    def setup(self):
        if self.use_clip_auxiliary_loss:
            self.logit_scale = self.param(
                "logit_scale", lambda k: jnp.asarray(jnp.log(1.0 / 0.07), jnp.float32)
            )

    # ------------------------------------------------------------------ #
    # building blocks                                                     #
    # ------------------------------------------------------------------ #
    def encode(self, rgb_obs, depth_obs, robot_obs, deterministic: bool = True):
        return self.perceptual_encoder(rgb_obs, depth_obs, robot_obs, deterministic)

    def apply_lang_net(self, lang_value, deterministic: bool = True):
        """Batch "lang" value -> language embedding: identity for precomputed
        embeddings, or the in-graph language network (MLP over embeddings /
        CLIP text tower over token ids)."""
        if lang_value is None or self.lang_net is None:
            return lang_value
        return self.lang_net(lang_value, deterministic=deterministic)

    def encode_goals(self, perceptual_emb, lang_emb, n_vis: int, deterministic: bool = True):
        """Visual goals for the first ``n_vis`` rows, language goals for the rest."""
        vis_goal = self.visual_goal(perceptual_emb[:n_vis, -1], deterministic=deterministic)
        if lang_emb is None or self.language_goal is None:
            return vis_goal
        lang_goal = self.language_goal(lang_emb, deterministic=deterministic)
        return jnp.concatenate([vis_goal, lang_goal], axis=0)

    # ------------------------------------------------------------------ #
    # training forward                                                    #
    # ------------------------------------------------------------------ #
    def __call__(
        self,
        batch: Dict[str, Dict],
        kl_beta: float = 0.01,
        deterministic: bool = False,
        fused_n_vis: Optional[int] = None,
    ):
        """Fused multi-modal training/val forward. Returns a metrics dict.

        Two input forms:
        - per-modality: ``batch`` holds "vis"/"lang" sub-batches with keys
          rgb_obs / depth_obs / robot_obs / actions / robot_obs_raw (+ lang /
          use_for_aux_lang_loss for lang); obs are concatenated here.
        - pre-fused (``fused_n_vis`` given): ``batch`` is ONE dict whose obs
          already stack [vis; lang] along the batch axis (the training step
          concatenates raw uint8 frames BEFORE the device transform — 4x less
          HBM traffic than concatenating transformed floats).
        """
        if fused_n_vis is not None:
            n_vis = fused_n_vis
            mods = (["vis"] if n_vis else []) + (["lang"] if "lang" in batch else [])
            rgb_obs, depth_obs = batch["rgb_obs"], batch["depth_obs"]
            robot_obs, actions = batch["robot_obs"], batch["actions"]
            robot_obs_raw = batch["robot_obs_raw"]
            lang_emb = batch.get("lang")
            total_b = actions.shape[0]
            splits = {}
            if n_vis:
                splits["vis"] = (0, n_vis)
            if "lang" in mods:
                splits["lang"] = (n_vis, total_b)
        else:
            mods = [m for m in ("vis", "lang") if m in batch]
            n_vis = batch["vis"]["actions"].shape[0] if "vis" in batch else 0

            def cat(key):
                parts = [batch[m][key] for m in mods]
                return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

            rgb_obs = {k: cat_dict(batch, mods, "rgb_obs", k) for k in batch[mods[0]]["rgb_obs"]}
            depth_obs = {k: cat_dict(batch, mods, "depth_obs", k) for k in batch[mods[0]]["depth_obs"]}
            robot_obs = cat("robot_obs")
            actions = cat("actions")
            robot_obs_raw = cat("robot_obs_raw")
            lang_emb = batch["lang"]["lang"] if "lang" in batch else None
            splits = _split_sizes(batch, mods)

        lang_emb = self.apply_lang_net(lang_emb, deterministic)
        perceptual_emb = self.encode(rgb_obs, depth_obs, robot_obs, deterministic)
        latent_goal = self.encode_goals(perceptual_emb, lang_emb, n_vis, deterministic)

        # ---- plan networks ----
        pp_state = self.plan_proposal(perceptual_emb[:, 0], latent_goal)
        pr_state, seq_feat = self.plan_recognition(perceptual_emb, deterministic=deterministic)

        if self.use_plan:
            sampled_plan = self.dist.rsample(self.make_rng("sample"), pr_state)
            kl_per_sample = self._balanced_kl_per_sample(pp_state, pr_state)
        else:
            sampled_plan = jnp.zeros((perceptual_emb.shape[0], 0), perceptual_emb.dtype)
            kl_per_sample = jnp.zeros((perceptual_emb.shape[0],), jnp.float32)

        # ---- action decoder ----
        dec_out = self.action_decoder(sampled_plan, perceptual_emb, latent_goal)
        act_per_sample = self._action_loss_per_sample(dec_out, actions, robot_obs_raw)

        metrics: Dict[str, jnp.ndarray] = {}
        for m, (lo, hi) in splits.items():
            metrics[f"kl_loss_{m}"] = kl_beta * jnp.mean(kl_per_sample[lo:hi])
            metrics[f"action_loss_{m}"] = jnp.mean(act_per_sample[lo:hi])
        kl_loss = sum(metrics[f"kl_loss_{m}"] for m in mods) / len(mods)
        action_loss = sum(metrics[f"action_loss_{m}"] for m in mods) / len(mods)
        total = kl_loss + action_loss

        aux_mask = (
            batch.get("use_for_aux_lang_loss")
            if fused_n_vis is not None
            else (batch["lang"]["use_for_aux_lang_loss"] if "lang" in batch else None)
        )
        has_lang = lang_emb is not None

        # ---- CLIP-style contrastive auxiliary loss (lang rows only) ----
        if self.use_clip_auxiliary_loss and has_lang:
            clip_loss = self._clip_auxiliary_loss(
                seq_feat[n_vis:], latent_goal[n_vis:], aux_mask
            )
            metrics["lang_clip_loss"] = clip_loss

        # ---- optional aux losses (gcbc.py variants) ----
        if self.state_decoder is not None:
            recon = self.state_decoder(perceptual_emb)
            metrics["proprio_loss"] = jnp.mean((recon - robot_obs) ** 2)
        if self.bcz_lang_decoder is not None and has_lang:
            mask = aux_mask.astype(jnp.float32)
            pred = self.bcz_lang_decoder(seq_feat[n_vis:])
            cos = _cosine_similarity(pred, lang_emb)
            metrics["lang_pred_loss"] = jnp.sum((1.0 - cos) * mask) / jnp.maximum(mask.sum(), 1.0)
        if self.mia_discriminator is not None and has_lang:
            mask = aux_mask.astype(jnp.float32)
            vis_feat = seq_feat[n_vis:]
            pos = self.mia_discriminator(vis_feat, lang_emb)[..., 0]
            neg = self.mia_discriminator(vis_feat, jnp.roll(lang_emb, 1, axis=0))[..., 0]
            bce = jax.nn.softplus(-pos) + jax.nn.softplus(neg)  # -log(sig(pos)) - log(1-sig(neg))
            metrics["lang_contrastive_loss"] = jnp.sum(bce * mask) / jnp.maximum(mask.sum(), 1.0)
        task_ids = (
            batch.get("lang_task_id")
            if fused_n_vis is not None
            else (batch["lang"].get("lang_task_id") if "lang" in batch else None)
        )
        if self.lang_task_head is not None and has_lang and task_ids is not None:
            logits = self.lang_task_head(lang_emb)
            valid = (task_ids >= 0).astype(jnp.float32)
            labels = jnp.maximum(task_ids, 0)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            denom = jnp.maximum(valid.sum(), 1.0)
            metrics["lang_task_loss"] = jnp.sum(ce * valid) / denom
            acc = (logits.argmax(-1) == labels).astype(jnp.float32)
            metrics["lang_task_acc"] = jnp.sum(acc * valid) / denom
        metrics.update(kl_loss=kl_loss, action_loss=action_loss, total_loss=total)
        return metrics

    def _balanced_kl_per_sample(self, pp_state: State, pr_state: State) -> jnp.ndarray:
        alpha = self.kl_balancing_mix
        lhs = self.dist.kl_divergence(self.dist.detach_state(pr_state), pp_state)
        rhs = self.dist.kl_divergence(pr_state, self.dist.detach_state(pp_state))
        return alpha * lhs + (1 - alpha) * rhs

    def _action_loss_per_sample(self, dec_out: DecoderOutput, actions, robot_obs_raw) -> jnp.ndarray:
        """Per-sample version of LogisticPolicyDecoder.compute_loss (mean over
        seq & action dims within each sample)."""
        from hulc2_tpu.ops import logistic
        from hulc2_tpu.ops.gripper_frame import world_to_tcp_frame

        dec = self.action_decoder
        if dec.gripper_control:
            actions = world_to_tcp_frame(actions, robot_obs_raw)
        amin, amax = dec._bounds()
        cont = actions[..., :-1] if dec.discrete_gripper else actions
        lp = logistic.logistic_mixture_log_prob(
            dec_out.logit_probs, dec_out.log_scales, dec_out.means, cont,
            amin, amax, dec.num_classes, dec.log_scale_min,
        )  # (B, S, A)
        nll = -jnp.mean(jnp.sum(lp, axis=-1), axis=-1)  # (B,)
        if not dec.discrete_gripper:
            return nll
        labels = (actions[..., -1] > 0).astype(jnp.int32)
        logp = jax.nn.log_softmax(dec_out.gripper_logits, axis=-1)
        ce = -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0], axis=-1)
        return nll + dec.gripper_alpha * ce

    def _clip_auxiliary_loss(self, seq_vis_feat, encoded_lang, mask) -> jnp.ndarray:
        """Static-shape masked CLIP contrastive loss
        (reference: hulc2.py:472-508)."""
        img, txt = self.proj_vis_lang(seq_vis_feat, encoded_lang)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits = scale * (img @ txt.T)  # (B, B)

        mask = mask.astype(bool)
        neg_inf = jnp.asarray(-1e9, logits.dtype)
        masked = jnp.where(mask[None, :], logits, neg_inf)  # valid columns only
        diag = jnp.diagonal(masked)
        row_ce = jax.nn.logsumexp(masked, axis=-1) - diag
        masked_t = jnp.where(mask[None, :], logits.T, neg_inf)
        col_ce = jax.nn.logsumexp(masked_t, axis=-1) - jnp.diagonal(masked_t)
        n_valid = jnp.maximum(jnp.sum(mask), 1)
        loss = (jnp.sum(jnp.where(mask, row_ce, 0.0)) + jnp.sum(jnp.where(mask, col_ce, 0.0))) / (
            2 * n_valid
        )
        return jnp.where(jnp.any(mask), loss, 0.0)

    # ------------------------------------------------------------------ #
    # validation forward (both pp- and pr-conditioned action metrics)     #
    # ------------------------------------------------------------------ #
    def val_forward(self, batch: Dict[str, Dict], kl_beta: float = 0.01):
        """Mirror of the reference lmp_val (hulc2.py:247-334): evaluate the
        decoder under both the proposal- and recognition-sampled plan, report
        MAE / gripper success metrics."""
        mods = [m for m in ("vis", "lang") if m in batch]
        n_vis = batch["vis"]["actions"].shape[0] if "vis" in batch else 0
        rgb_obs = {k: cat_dict(batch, mods, "rgb_obs", k) for k in batch[mods[0]]["rgb_obs"]}
        depth_obs = {k: cat_dict(batch, mods, "depth_obs", k) for k in batch[mods[0]]["depth_obs"]}

        def cat(key):
            parts = [batch[m][key] for m in mods]
            return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

        robot_obs, actions, robot_obs_raw = cat("robot_obs"), cat("actions"), cat("robot_obs_raw")
        lang_emb = batch["lang"]["lang"] if "lang" in batch else None

        lang_emb = self.apply_lang_net(lang_emb)
        emb = self.encode(rgb_obs, depth_obs, robot_obs, deterministic=True)
        latent_goal = self.encode_goals(emb, lang_emb, n_vis, deterministic=True)
        pp_state = self.plan_proposal(emb[:, 0], latent_goal)
        pr_state, seq_feat = self.plan_recognition(emb, deterministic=True)

        metrics: Dict[str, jnp.ndarray] = {}
        splits = _split_sizes(batch, mods)
        for tag, state in (("pp", pp_state), ("pr", pr_state)):
            plan = (
                self.dist.sample(self.make_rng("sample"), state)
                if self.use_plan
                else jnp.zeros((emb.shape[0], 0), emb.dtype)
            )
            dec_out = self.action_decoder(plan, emb, latent_goal)
            act_ps = self._action_loss_per_sample(dec_out, actions, robot_obs_raw)
            sampled = self.action_decoder.sample_actions(self.make_rng("sample"), dec_out, robot_obs_raw)
            mae = jnp.mean(jnp.abs(sampled[..., :-1] - actions[..., :-1]), axis=1)  # (B, A-1)
            grip_pred = jnp.where(sampled[..., -1] > 0, 1.0, -1.0)
            grip_sr = jnp.mean((grip_pred == actions[..., -1]).astype(jnp.float32), axis=-1)
            for m, (lo, hi) in splits.items():
                metrics[f"{m}_act_loss_{tag}"] = jnp.mean(act_ps[lo:hi])
                metrics[f"{m}_total_mae_{tag}"] = jnp.mean(mae[lo:hi])
                metrics[f"{m}_pos_mae_{tag}"] = jnp.mean(mae[lo:hi, :3])
                metrics[f"{m}_orn_mae_{tag}"] = jnp.mean(mae[lo:hi, 3:6])
                metrics[f"{m}_grip_sr_{tag}"] = jnp.mean(grip_sr[lo:hi])
        if self.use_plan:
            kl_ps = self._balanced_kl_per_sample(pp_state, pr_state)
            for m, (lo, hi) in splits.items():
                metrics[f"{m}_kl_loss"] = kl_beta * jnp.mean(kl_ps[lo:hi])
        if self.use_clip_auxiliary_loss and "lang" in batch:
            metrics["val_pred_clip_loss"] = self._clip_auxiliary_loss(
                seq_feat[n_vis:], latent_goal[n_vis:], batch["lang"]["use_for_aux_lang_loss"]
            )
        return metrics

    # ------------------------------------------------------------------ #
    # inference                                                           #
    # ------------------------------------------------------------------ #
    def init_carry(self, batch_size: int, dtype=jnp.float32) -> PolicyCarry:
        dec = self.action_decoder
        if dec.rnn_model == "lstm_decoder":
            hidden = (
                jnp.zeros((dec.num_layers, batch_size, dec.hidden_size), dtype),
                jnp.zeros((dec.num_layers, batch_size, dec.hidden_size), dtype),
            )
        else:
            hidden = jnp.zeros((dec.num_layers, batch_size, dec.hidden_size), dtype)
        return PolicyCarry(
            plan=jnp.zeros((batch_size, self.dist.plan_features if self.use_plan else 0), dtype),
            latent_goal=jnp.zeros((batch_size, self.visual_goal.latent_goal_features), dtype),
            hidden=hidden,
            step=jnp.zeros((batch_size,), jnp.int32),
        )

    def policy_step(
        self,
        rgb_obs: Dict[str, jnp.ndarray],
        depth_obs: Dict[str, jnp.ndarray],
        robot_obs: jnp.ndarray,
        robot_obs_raw: jnp.ndarray,
        goal: Dict[str, jnp.ndarray],
        carry: PolicyCarry,
    ) -> Tuple[jnp.ndarray, PolicyCarry]:
        """One rollout step (reference: hulc2.py:608-653), fully jittable.

        Replans every ``replan_freq`` steps via the plan-proposal prior
        (clearing the decoder hidden state), then decodes one action with the
        stateful RNN. Observations are single-frame: (B, 1, H, W, C).
        ``goal`` holds either {"lang": (B, E)} embeddings or
        {"visual": per-camera goal images + "robot_obs"} for visual goals.

        Replanning is a branchless PER-ENV masked select (envs in a batched
        farm reset/replan at different steps), so the whole batched rollout
        stays one jitted program with no data-dependent control flow.
        """
        emb = self.encode(rgb_obs, depth_obs, robot_obs, deterministic=True)

        if "lang" in goal:
            lang_emb = self.apply_lang_net(goal["lang"])
            latent_goal = self.language_goal(lang_emb, deterministic=True)
        else:
            g_rgb = {k: goal["rgb_obs"][k] for k in rgb_obs}
            g_depth = {k: goal["depth_obs"][k] for k in depth_obs}
            g_emb = self.encode(g_rgb, g_depth, goal.get("robot_obs"), deterministic=True)
            latent_goal = self.visual_goal(g_emb[:, -1], deterministic=True)
        pp_state = self.plan_proposal(emb[:, 0], latent_goal)
        new_plan = (
            self.dist.sample(self.make_rng("sample"), pp_state) if self.use_plan else carry.plan
        )

        replan_mask = (carry.step % self.replan_freq) == 0  # (B,)
        m = replan_mask[:, None]
        plan = jnp.where(m, new_plan.astype(carry.plan.dtype), carry.plan)
        latent_goal = jnp.where(m, latent_goal.astype(carry.latent_goal.dtype), carry.latent_goal)
        hidden = jax.tree_util.tree_map(
            lambda h: jnp.where(replan_mask[None, :, None], jnp.zeros_like(h), h), carry.hidden
        )

        dec = self.action_decoder
        h0 = hidden
        dec_out = dec(plan, emb, latent_goal, h0=h0)
        action = dec.sample_actions(self.make_rng("sample"), dec_out, robot_obs_raw)
        new_carry = PolicyCarry(plan, latent_goal, dec_out.hidden, carry.step + 1)
        return action[:, -1], new_carry


def _cosine_similarity(a, b, eps=1e-8):
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.sum(a * b, axis=-1)


def cat_dict(batch, mods, outer: str, key: str):
    parts = [batch[m][outer][key] for m in mods]
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _split_sizes(batch, mods) -> Dict[str, Tuple[int, int]]:
    out, lo = {}, 0
    for m in mods:
        b = batch[m]["actions"].shape[0]
        out[m] = (lo, lo + b)
        lo += b
    return out
