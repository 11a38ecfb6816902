"""Measure batched/pipelined eval throughput on the real TPU (fake envs)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import hulc2_tpu.configs  # noqa
from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.agents.hulc2_agent import Hulc2Agent
from hulc2_tpu.envs.calvin_wrapper import EnvFarm
from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.evaluation.batched_eval import PipelinedEvaluator
from hulc2_tpu.evaluation.loading import init_params
from hulc2_tpu.evaluation.sequences import get_sequences
from hulc2_tpu.evaluation.tasks import TASK_NAMES
from hulc2_tpu.tools.auto_lang_annotator import hash_embed
from hulc2_tpu.models.build import build_policy

K = int(os.environ.get("K", "64"))
cfg = cfg_lib.compose("cfg_low_level")
model = build_policy(cfg["model"])
params = init_params(model, cfg)
lang = {t: hash_embed([t])[0] for t in TASK_NAMES}
sequences = get_sequences(40)

for n_cohorts in [int(x) for x in os.environ.get('COHORTS', '1,2,4').split(',')]:
    per = K // n_cohorts
    cohorts, shared = [], None
    for c in range(n_cohorts):
        farm = EnvFarm([FakeCalvinEnv(static_hw=200, gripper_hw=84, seed=100 * c + i)
                        for i in range(per)])
        agent = Hulc2Agent(farm, model, params, cfg["datamodule"], n_envs=per,
                           fused_step=shared)
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
    print(f"K={K} cohorts={n_cohorts}: {dt:6.1f} s  ~{n_steps/dt:7.0f} env-steps/s", flush=True)
