import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
import hulc2_tpu.configs
from hulc2_tpu.core import config as cfg_lib
from hulc2_tpu.data.device_transforms import make_batch_transform
from hulc2_tpu.data.statistics import DatasetStatistics
from hulc2_tpu.models.build import build_policy
from hulc2_tpu.train import optim
from hulc2_tpu.train.state import create_train_state
from hulc2_tpu.train.steps import make_train_step

def make_all(overrides, use_aug=True):
    cfg = cfg_lib.compose("cfg_low_level", overrides)
    dm_cfg = cfg["datamodule"]
    model = build_policy(cfg["model"])
    b, s = 32, 32
    rng = np.random.RandomState(0)
    def raw_mod(with_lang):
        d = {"rgb_static": jnp.asarray(rng.randint(0,256,(b,s,200,200,3)), jnp.uint8),
             "rgb_gripper": jnp.asarray(rng.randint(0,256,(b,s,84,84,3)), jnp.uint8),
             "robot_obs_raw": jnp.asarray(rng.randn(b,s,15), jnp.float32),
             "actions": jnp.asarray(np.concatenate([np.clip(rng.randn(b,s,6)*.3,-1,1), np.sign(rng.randn(b,s,1))],-1), jnp.float32)}
        if with_lang:
            d["lang"] = jnp.asarray(rng.randn(b,384), jnp.float32)
            d["use_for_aux_lang_loss"] = jnp.asarray(rng.rand(b)>.3)
        return d
    raw = {"vis": raw_mod(False), "lang": raw_mod(True)}
    tfname = "rand_shift" if use_aug else "play_basic"
    tf = make_batch_transform(dm_cfg["observation_space"], dm_cfg["proprioception_dims"], DatasetStatistics(), tfname, use_aug)
    tx = optim.make_optimizer(cfg["model"]["optimizer"], None, 100000)
    def init_fn():
        key = jax.random.PRNGKey(0)
        return model.init({"params": key, "sample": key, "dropout": key}, {m: tf(key, raw[m]) for m in raw})
    state = create_train_state(init_fn, tx)
    step = make_train_step(model, tx, {"vis": tf, "lang": tf}, 3.0)
    return state, step, raw

def bench(name, overrides, use_aug=True, iters=15):
    state, step, raw = make_all(overrides, use_aug)
    key = jax.random.PRNGKey(0); klb = jnp.asarray(0.01)
    for _ in range(3):
        state, m = step(state, raw, key, klb)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, raw, key, klb)
    float(m["loss"])
    dt = (time.perf_counter()-t0)/iters*1000
    print(f"{name:34s} {dt:7.1f} ms/step")

bench("baseline (full)", [])
bench("no augmentation", [], use_aug=False)



