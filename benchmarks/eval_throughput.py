"""Measure batched/pipelined eval throughput on the real TPU (fake envs).

Knobs (env vars):
  K        total env instances (default 64)
  COHORTS  comma list of cohort counts to sweep (default "1,2,4")
  DELAY    per-step fake sim delay in seconds, emulating PyBullet cost
           (default 0 — pure dispatch-path measurement)
  FARM     "inproc" (serial EnvFarm, default) or "proc" (ProcessEnvFarm:
           one worker process per env, parallel stepping; needs a
           multi-core host to show gains)
  DEVICE_RENDER  "1": render observations inside the policy's jitted
           program (envs/render_jax.py) — envs run state-only and the host
           ships 39 floats/env instead of rendering ~30 KiB/env frames
  HW       "static,gripper" render resolution (default "200,84"; the r5
           flagship preset is "96,64")

Measured (tunneled v5e, single-core host, DELAY=0): K=64 cohorts=1
~445 env-steps/s end-to-end — 2.4x the pre-fused-dispatch figure (185).
With DELAY>0 (sim-bound regime) cohort pipelining + the process farm keep
the TPU round-trip hidden behind sim time.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
from functools import partial

import numpy as np
import hulc2_tpu.configs  # noqa
from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.agents.hulc2_agent import Hulc2Agent
from hulc2_tpu.envs.calvin_wrapper import EnvFarm
from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.envs.process_farm import ProcessEnvFarm
from hulc2_tpu.evaluation.batched_eval import PipelinedEvaluator
from hulc2_tpu.evaluation.loading import init_params
from hulc2_tpu.evaluation.sequences import get_sequences
from hulc2_tpu.evaluation.tasks import TASK_NAMES
from hulc2_tpu.tools.auto_lang_annotator import hash_embed
from hulc2_tpu.models.build import build_policy

def main():
    K = int(os.environ.get("K", "64"))
    DELAY = float(os.environ.get("DELAY", "0"))
    FARM = os.environ.get("FARM", "inproc")
    DEVICE_RENDER = os.environ.get("DEVICE_RENDER", "") == "1"
    static_hw, gripper_hw = (int(x) for x in os.environ.get("HW", "200,84").split(","))

    cfg = cfg_lib.compose("cfg_low_level")
    model = build_policy(cfg["model"])
    params = init_params(model, cfg)
    lang = {t: hash_embed([t])[0] for t in TASK_NAMES}
    sequences = get_sequences(40)


    env_kw = dict(static_hw=static_hw, gripper_hw=gripper_hw,
                  render_obs=not DEVICE_RENDER)

    def make_farm(c: int, per: int):
        if FARM == "proc":
            return ProcessEnvFarm(
                [partial(FakeCalvinEnv, seed=100 * c + i, step_delay_s=DELAY, **env_kw)
                 for i in range(per)]
            )
        return EnvFarm([FakeCalvinEnv(seed=100 * c + i, step_delay_s=DELAY, **env_kw)
                        for i in range(per)])


    for n_cohorts in [int(x) for x in os.environ.get("COHORTS", "1,2,4").split(",")]:
        per = K // n_cohorts
        cohorts, shared = [], None
        for c in range(n_cohorts):
            farm = make_farm(c, per)
            agent = Hulc2Agent(
                farm, model, params, cfg["datamodule"], n_envs=per, fused_step=shared,
                device_render=(dict(static_hw=static_hw, gripper_hw=gripper_hw)
                               if DEVICE_RENDER else None))
            shared = shared or agent._fused_step
            cohorts.append((farm, agent))
        ev = PipelinedEvaluator(cohorts, lang, ep_len=30)
        g = np.stack([lang[TASK_NAMES[0]]] * per)
        for farm, agent in cohorts:  # compile warmup: one dispatch per cohort
            agent.step(farm.get_obs(), {"lang": g})
        t0 = time.time()
        ev.evaluate(sequences=sequences, progress=False)
        dt = time.time() - t0
        # each chain: 5 subtasks x 30 steps budget (untrained -> always times out)
        n_steps = len(sequences) * 5 * 30
        print(f"K={K} farm={FARM} delay={DELAY} cohorts={n_cohorts} "
              f"render={'device' if DEVICE_RENDER else 'host'}@{static_hw}: "
              f"{dt:6.1f} s  ~{n_steps/dt:7.0f} env-steps/s", flush=True)
        if FARM == "proc":
            for farm, _ in cohorts:
                farm.close()


if __name__ == "__main__":
    main()
