"""Multiprocess env farm: N simulator instances stepping in PARALLEL.

The in-process ``EnvFarm`` steps its envs serially — fine for cheap symbolic
envs, but a PyBullet CALVIN instance costs ~10-20 ms per step (physics +
TinyRenderer/EGL camera render), so 64 serial envs would take ~1 s per
lockstep round and the TPU would idle. This farm gives each env its own
worker process (the reference gets sim parallelism only *across* eval jobs
via taskset pinning — reference: hulc2/evaluation/run_multiple.py:24-43;
here one evaluation parallelizes internally).

``step_all``/``reset_all`` broadcast commands to every worker and then
collect results, so N simulators advance concurrently on N host cores while
the policy runs on TPU. Combined with cohort pipelining
(``evaluation.batched_eval.PipelinedEvaluator``) the eval loop approaches
max(sim time / cores, TPU dispatch time) per round.

Workers are fresh interpreters launched with fork+exec (``subprocess``), NOT
``multiprocessing`` children: plain fork is unsafe once JAX's thread pools
exist in the parent, and both spawn and forkserver re-import the parent's
``__main__`` module in every child (hazardous for unguarded scripts,
impossible for stdin/-c parents). Each worker runs ``python -m
hulc2_tpu.envs.process_farm``, connects back over a Unix socket, receives its
pickled env factory, and serves (method, args, kwargs) RPCs. Factories must
be picklable (a top-level callable plus kwargs, e.g.
``partial(make_wrapped_calvin_env, dataset_path)``).
"""
from __future__ import annotations

import logging
import os
import secrets
import subprocess
import sys
import tempfile
from multiprocessing.connection import Client, Listener
from typing import Callable, Dict, List, Sequence

import numpy as np

from hulc2_tpu.envs.calvin_wrapper import EnvFarm

logger = logging.getLogger(__name__)

_CLOSE = "__close__"
_ADDR_ENV = "HULC2_ENV_WORKER_ADDR"
_KEY_ENV = "HULC2_ENV_WORKER_KEY"


def _worker_main() -> None:
    """Entry point inside a worker interpreter (via ``-m``): connect back to
    the farm, build the env from the pickled factory, serve RPCs."""
    addr = os.environ[_ADDR_ENV]
    key = bytes.fromhex(os.environ[_KEY_ENV])
    conn = Client(addr, family="AF_UNIX", authkey=key)
    try:
        factory = conn.recv()
        try:
            env = factory()
            conn.send(("ok", None))
        except Exception as e:  # noqa: BLE001 — report construction failure
            conn.send(("error", repr(e)))
            return
        while True:
            try:
                method, args, kwargs = conn.recv()
            except EOFError:
                break
            if method == _CLOSE:
                conn.send(("ok", None))
                break
            try:
                result = getattr(env, method)(*args, **kwargs)
                conn.send(("ok", result))
            except Exception as e:  # noqa: BLE001 — surface remote errors
                conn.send(("error", repr(e)))
    finally:
        conn.close()


class RemoteEnv:
    """Proxy for one env living in a worker process. Split send/recv lets the
    farm broadcast a command to all workers before collecting any result."""

    def __init__(self, factory: Callable, _tmpdir: str):
        addr = os.path.join(_tmpdir, f"env_{secrets.token_hex(4)}.sock")
        key = secrets.token_bytes(16)
        listener = Listener(addr, family="AF_UNIX", authkey=key)
        env = dict(os.environ, **{_ADDR_ENV: addr, _KEY_ENV: key.hex()})
        # fresh interpreter via fork+exec: no JAX thread-pool hazards, no
        # __main__ re-import. Workers must not grab the TPU: pin them to CPU.
        env["JAX_PLATFORMS"] = "cpu"
        # make the package importable regardless of the worker's cwd
        import hulc2_tpu

        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(hulc2_tpu.__file__)))
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        self._proc = subprocess.Popen(
            [sys.executable, "-m", "hulc2_tpu.envs.process_farm"], env=env
        )
        self._conn = listener.accept()
        listener.close()
        self._conn.send(factory)
        status, err = self._conn.recv()
        if status != "ok":
            raise RuntimeError(f"env worker failed to construct env: {err}")

    def call_async(self, method: str, *args, **kwargs) -> None:
        self._conn.send((method, args, kwargs))

    def call_wait(self):
        status, result = self._conn.recv()
        if status != "ok":
            raise RuntimeError(f"env worker error: {result}")
        return result

    def call(self, method: str, *args, **kwargs):
        self.call_async(method, *args, **kwargs)
        return self.call_wait()

    # env-like surface (synchronous RPCs), so per-env code paths still work
    def reset(self, **kwargs):
        return self.call("reset", **kwargs)

    def step(self, action):
        return self.call("step", action)

    def get_obs(self):
        return self.call("get_obs")

    def get_info(self):
        return self.call("get_info")

    def get_camera_params(self):
        return self.call("get_camera_params")

    def close(self) -> None:
        if self._proc.poll() is None:
            try:
                self.call(_CLOSE)
            except (RuntimeError, EOFError, BrokenPipeError, OSError):
                pass
            try:
                self._proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                # escalate: SIGTERM, then SIGKILL for workers stuck in native
                # sim code; always reap so the tmpdir (live socket) can go
                self._proc.terminate()
                try:
                    self._proc.wait(timeout=5)
                except subprocess.TimeoutExpired:
                    self._proc.kill()
                    self._proc.wait()
        self._conn.close()


class ProcessEnvFarm:
    """EnvFarm-compatible farm whose envs live in worker processes and step
    in parallel. ``factories`` is one picklable zero-arg callable per env."""

    def __init__(self, factories: Sequence[Callable]):
        self._tmpdir = tempfile.mkdtemp(prefix="hulc2_envfarm_")
        self.envs: List[RemoteEnv] = [RemoteEnv(f, self._tmpdir) for f in factories]

    def __len__(self):
        return len(self.envs)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- parallel collective ops --------------------------------------- #
    def step_all(self, actions: np.ndarray):
        """Step every env concurrently. Returns (obs_list, infos)."""
        for e, a in zip(self.envs, actions):
            e.call_async("step", a)
        obs_list, infos = [], []
        for e in self.envs:
            o, _, _, info = e.call_wait()
            obs_list.append(o)
            infos.append(info)
        return obs_list, infos

    def step(self, actions: np.ndarray):
        """EnvFarm-compatible lockstep step (stacked obs)."""
        obs_list, infos = self.step_all(actions)
        return (self.stack_obs(obs_list), np.zeros(len(self.envs)),
                np.zeros(len(self.envs), bool), infos)

    def reset_all(self, robot_obs=None, scene_obs=None) -> List[Dict]:
        for i, e in enumerate(self.envs):
            e.call_async(
                "reset",
                robot_obs=None if robot_obs is None else robot_obs[i],
                scene_obs=None if scene_obs is None else scene_obs[i],
            )
        return [e.call_wait() for e in self.envs]

    def reset(self, robot_obs=None, scene_obs=None):
        return self.stack_obs(self.reset_all(robot_obs, scene_obs))

    def get_obs(self):
        for e in self.envs:
            e.call_async("get_obs")
        return self.stack_obs([e.call_wait() for e in self.envs])

    def get_infos(self) -> List[Dict]:
        for e in self.envs:
            e.call_async("get_info")
        return [e.call_wait() for e in self.envs]

    stack_obs = staticmethod(EnvFarm.stack_obs)

    def close(self) -> None:
        import shutil

        for e in self.envs:
            e.close()
        shutil.rmtree(self._tmpdir, ignore_errors=True)


if __name__ == "__main__":
    _worker_main()
