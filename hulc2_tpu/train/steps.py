"""Jitted train / val step factories.

The whole per-step pipeline — uint8 augmentation, both modality encoders,
plan nets, decoder, losses, backward, Adam update, gradient psum over the
``dp`` mesh axis — is ONE jit-compiled XLA program. The reference splits this
across DataLoader workers (CPU transforms), Lightning hooks, and NCCL
allreduce (reference: hulc2/training.py:72-82, SURVEY.md §3.1 hot loop);
here XLA schedules and fuses it end to end, and collectives are inserted from
sharding annotations.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from hulc2_tpu.core import prng
from hulc2_tpu.models.hulc2 import Hulc2
from hulc2_tpu.train.state import TrainState


def make_train_step(
    model: Hulc2,
    tx,
    transforms: Dict[str, Callable],
    clip_loss_beta: float = 3.0,
    donate: bool = True,
    aux_betas: Optional[Dict[str, float]] = None,
) -> Callable:
    """Returns jitted fn(state, raw_batch, root_key, kl_beta) -> (state, metrics).

    ``transforms`` maps modality name -> device transform fn(rng, raw)->batch.
    """

    def step_fn(state: TrainState, raw_batch: Dict, root_key: jax.Array, kl_beta: jnp.ndarray):
        key = jax.random.fold_in(root_key, state.step)
        rngs = {"sample": prng.stream(key, "sample"), "dropout": prng.stream(key, "dropout")}

        mods = None if "actions" in raw_batch else [m for m in ("vis", "lang") if m in raw_batch]
        if mods is None:
            # host-prefused [vis; lang] batch (data.loader.fuse_batch_host):
            # the uint8 concat already happened in the prefetch thread
            batch = transforms["vis"](prng.stream(key, "aug"), raw_batch)
            n_lang = raw_batch["lang"].shape[0] if "lang" in raw_batch else 0
            fused_n_vis = raw_batch["actions"].shape[0] - n_lang
        elif len(mods) == 2 and transforms["vis"] is transforms["lang"]:
            # fuse BEFORE the transform: concatenating raw uint8 frames is 4x
            # cheaper than concatenating transformed bf16 activations
            n_vis = raw_batch["vis"]["actions"].shape[0]
            shared = [k for k in raw_batch["vis"] if k in raw_batch["lang"]
                      and k not in ("idx", "seq_len")]
            raw_fused = {
                k: jnp.concatenate([raw_batch["vis"][k], raw_batch["lang"][k]], axis=0)
                for k in shared
            }
            batch = transforms["vis"](prng.stream(key, "aug"), raw_fused)
            batch["lang"] = raw_batch["lang"]["lang"]
            batch["use_for_aux_lang_loss"] = raw_batch["lang"]["use_for_aux_lang_loss"]
            fused_n_vis = n_vis
        else:
            batch = {
                mod: transforms[mod](prng.stream(key, f"aug_{mod}"), raw_batch[mod])
                for mod in raw_batch
            }
            fused_n_vis = None

        def loss_fn(params):
            metrics = model.apply(params, batch, kl_beta, False, fused_n_vis, rngs=rngs)
            loss = metrics["total_loss"]
            if "lang_clip_loss" in metrics:
                loss = loss + clip_loss_beta * metrics["lang_clip_loss"]
            for key, beta in (aux_betas or {}).items():
                if key in metrics:
                    loss = loss + beta * metrics[key]
            metrics["loss"] = loss
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads))
        )
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_val_step(model: Hulc2, transforms: Dict[str, Callable]) -> Callable:
    def step_fn(params, raw_batch: Dict, root_key: jax.Array, batch_idx: jnp.ndarray):
        key = jax.random.fold_in(root_key, batch_idx)
        batch = {mod: transforms[mod](prng.stream(key, mod), raw_batch[mod]) for mod in raw_batch}
        return model.apply(
            params, batch, rngs={"sample": prng.stream(key, "sample")}, method=Hulc2.val_forward
        )

    return jax.jit(step_fn)


def make_plan_sampler(model: Hulc2, transforms: Dict[str, Callable]) -> Callable:
    """Jitted fn(params, raw_batch, key) -> (plans (B_total, P), modality ids)
    for plan-space diagnostics (t-SNE; reference: visualization/tsne_plot.py)."""

    def sample_fn(params, raw_batch: Dict, root_key: jax.Array):
        key = jax.random.fold_in(root_key, 0)
        batch = {mod: transforms[mod](prng.stream(key, mod), raw_batch[mod]) for mod in raw_batch}

        def encode(mod_batch, mod_id):
            emb = model.apply(
                params, mod_batch["rgb_obs"], mod_batch["depth_obs"], mod_batch["robot_obs"],
                method=Hulc2.encode,
            )
            pr_state, _ = model.apply(
                params, emb, rngs={"dropout": key},
                method=lambda m, e: m.plan_recognition(e, deterministic=True),
            )
            plan = model.dist.sample(prng.stream(key, f"plan_{mod_id}"), pr_state)
            return plan

        plans, labels = [], []
        for i, mod in enumerate(sorted(raw_batch)):
            p = encode(batch[mod], i)
            plans.append(p)
            labels.append(jnp.full((p.shape[0],), i, jnp.int32))
        return jnp.concatenate(plans), jnp.concatenate(labels)

    return jax.jit(sample_fn)


def make_policy_step(model: Hulc2) -> Callable:
    """Jitted rollout step: fn(params, obs, goal, carry, key) -> (action, carry)."""

    @jax.jit
    def step_fn(params, rgb_obs, depth_obs, robot_obs, robot_obs_raw, goal, carry, key):
        return model.apply(
            params, rgb_obs, depth_obs, robot_obs, robot_obs_raw, goal, carry,
            rngs={"sample": key},
            method=Hulc2.policy_step,
        )

    return step_fn


def make_fused_policy_step(model: Hulc2, transform: Callable) -> Callable:
    """ONE dispatch per env step: obs transform + policy step + gripper
    binarization in a single jitted program.

    The reference's rollout path round-trips per-op (obs transforms on the
    CPU, tensor conversion, model.step, action post-processing —
    reference: hulc2/agents/lmp_agent.py:253-288, wrappers/hulc2_wrapper.py:64);
    on a (possibly remote) TPU every eager op submission costs dispatch
    latency, so the agent submits exactly one program per step and fetches
    one small (B, 7) action array.

    fn(params, raw_obs, goal, carry, key, step_idx) -> (action, new_carry)
    """

    @jax.jit
    def step_fn(params, raw, goal, carry, key, step_idx):
        key = jax.random.fold_in(key, step_idx)
        tfd = transform(prng.stream(key, "obs"), raw)
        action, new_carry = model.apply(
            params, tfd["rgb_obs"], tfd["depth_obs"], tfd["robot_obs"],
            tfd["robot_obs_raw"], goal, carry,
            rngs={"sample": prng.stream(key, "sample")},
            method=Hulc2.policy_step,
        )
        # binarize the gripper on device (reference: hulc2_wrapper.py:64-84)
        grip = jnp.where(action[..., -1] > 0, 1.0, -1.0).astype(action.dtype)
        action = jnp.concatenate([action[..., :-1], grip[..., None]], axis=-1)
        return action, new_carry

    return step_fn


def make_fused_render_policy_step(model: Hulc2, transform: Callable,
                                  render_fn: Callable, rgb_keys, depth_keys) -> Callable:
    """ONE dispatch per env step with the OBSERVATION RENDER inside the graph.

    The fake env's frames are a pure function of (scene_obs, robot_obs), so
    instead of the host rendering K frames (~8 ms/env on the 1-core eval
    harness — the measured wall-clock floor of the r4 protocol run) and
    shipping ~K·30 KiB over the tunnel per step, the host ships K·39 floats and
    this program renders, preprocesses, and runs the policy in one XLA
    computation (envs/render_jax.py; byte-identical to the host renderer that
    produced the training frames).

    fn(params, state, goal, carry, key, step_idx) -> (action, new_carry)
    where state = {"robot_obs": (K, 15) f32, "scene_obs": (K, 24) f32}.
    """

    @jax.jit
    def step_fn(params, state, goal, carry, key, step_idx):
        robot = state["robot_obs"].astype(jnp.float32)
        frames = render_fn(state["scene_obs"].astype(jnp.float32), robot)
        raw = {k: frames[k][:, None] for k in rgb_keys if k in frames}
        raw.update({k: frames[k][:, None] for k in depth_keys if k in frames})
        raw["robot_obs_raw"] = robot[:, None]
        raw["actions"] = jnp.zeros(robot.shape[:1] + (1, 7), jnp.float32)
        key = jax.random.fold_in(key, step_idx)
        tfd = transform(prng.stream(key, "obs"), raw)
        action, new_carry = model.apply(
            params, tfd["rgb_obs"], tfd["depth_obs"], tfd["robot_obs"],
            tfd["robot_obs_raw"], goal, carry,
            rngs={"sample": prng.stream(key, "sample")},
            method=Hulc2.policy_step,
        )
        grip = jnp.where(action[..., -1] > 0, 1.0, -1.0).astype(action.dtype)
        action = jnp.concatenate([action[..., :-1], grip[..., None]], axis=-1)
        return action, new_carry

    return step_fn
