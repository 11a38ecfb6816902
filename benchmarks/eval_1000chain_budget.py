"""Full-protocol-budget eval wall-clock measurement (BASELINE north star:
1000-chain CALVIN eval < 1 h).

Runs N chains (default 100) at the reference protocol budget (ep_len=360,
5 subtasks/chain) against the symbolic fake env with an untrained policy --
the WORST case: every subtask exhausts its full 360-step budget, so measured
wall-clock upper-bounds a real eval of the same chain count.

Measured (tunneled v5e, K=64): 100 chains in 4.1 min (733 env-steps/s)
-> ~41 min extrapolated for 1000 chains, under the 1 h target even with
~60 ms/dispatch tunnel latency; a locally attached chip (~2 ms dispatch)
is sim-bound instead (use --process-envs there).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import hulc2_tpu.configs
from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.agents.hulc2_agent import Hulc2Agent
from hulc2_tpu.envs.calvin_wrapper import EnvFarm
from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.evaluation.batched_eval import BatchedEvaluator
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
farm = EnvFarm([FakeCalvinEnv(static_hw=200, gripper_hw=84, seed=i) for i in range(K)])
agent = Hulc2Agent(farm, model, params, cfg["datamodule"], n_envs=K)
g = np.stack([lang[TASK_NAMES[0]]] * K)
agent.step(farm.get_obs(), {"lang": g})  # compile

# AFF=1: the full HULC++ hierarchical protocol — a full-size affordance
# detector (random weights; same compute) predicts per subtask, approaches
# run through the PD state machine inside the batched evaluator
affordance = None
aff_lang = None
if os.environ.get("AFF", "") == "1":
    import jax, jax.numpy as jnp
    from hulc2_tpu.affordance.detector import AffordanceDetector, AffordancePredictor

    det = AffordanceDetector(lang_embed_dim=1024, depth_dist="gaussian")
    variables = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
                         jnp.zeros((1, 1024)), False)
    affordance = AffordancePredictor(det, variables)
    rng = np.random.default_rng(0)
    aff_lang = {t: rng.standard_normal(1024).astype(np.float32) for t in TASK_NAMES}
    # pre-compile the pow2 buckets the run will hit (initial wave = K, then
    # singleton waves) so the timed section measures eval, not compiles
    dummy_img = np.zeros((200, 200, 3), np.uint8)
    dummy_lang = aff_lang[TASK_NAMES[0]]
    for bucket in {K, 1}:
        affordance.predict_batch([dummy_img] * bucket, [dummy_lang] * bucket)

ev = BatchedEvaluator(farm, agent, lang, ep_len=360,
                      affordance=affordance, aff_lang_embeddings=aff_lang)
seqs = get_sequences(int(os.environ.get("CHAINS", "100")))
t0 = time.time()
results = ev.evaluate(sequences=seqs, progress=True)
dt = time.time() - t0
n_steps = len(seqs) * 5 * 360  # worst case: untrained policy always times out
mode = "hierarchical" if affordance is not None else "policy-only"
print(f"{len(seqs)} chains, ep_len=360, K={K} [{mode}]: {dt/60:.1f} min "
      f"({n_steps/dt:.0f} env-steps/s) -> 1000-chain extrapolation ~{dt*(1000/len(seqs))/60:.0f} min",
      flush=True)
if affordance is not None:
    print(f"  {ev.n_aff_predictions} affordance predictions, {ev.n_approaches} approaches, "
          f"{ev.n_approach_steps} approach steps", flush=True)
