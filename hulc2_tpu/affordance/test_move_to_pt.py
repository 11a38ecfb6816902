"""Deproject + move-to sanity check.

Counterpart of the reference's deprojection sanity script
(reference: hulc2/affordance/test_move_to_pt.py): pick a pixel + depth,
deproject through the camera model to a 3D world point, command the agent's
staged ``move_to`` toward it in the (fake or real) env, and report the final
TCP position error. Verifies the camera calibration convention, the
project/deproject round trip, and the motion-primitive plumbing end to end —
without any learned model in the loop.

    python -m hulc2_tpu.affordance.test_move_to_pt            # fake env
    python -m hulc2_tpu.affordance.test_move_to_pt --px 120 90 --depth 1.7
"""
from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger(__name__)


def default_static_camera(hw: int = 200):
    """A plausible CALVIN-like static camera: above the table, looking down
    (rot_x(pi) flips the optical axis to -z world)."""
    from hulc2_tpu.envs.camera import PinholeCamera

    T = np.eye(4)
    T[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    T[:3, 3] = [0.0, 0.0, 2.2]
    return PinholeCamera.from_params(hw, hw, fx=hw * 1.2, fy=hw * 1.2,
                                     cx=hw / 2, cy=hw / 2, T_world_cam=T)


def run(px=(100, 100), depth: float = 1.7, max_err: float = 0.02, env=None, camera=None):
    from hulc2_tpu.agents.base_agent import BaseAgent
    from hulc2_tpu.envs.fake_env import FakeCalvinEnv

    env = env or FakeCalvinEnv()
    env.reset()
    camera = camera or default_static_camera()

    target = camera.deproject_single_depth(px, depth)
    roundtrip = camera.project(target)
    logger.info("pixel %s + depth %.3f -> world %s (reproject %s)",
                tuple(px), depth, np.round(target, 4), np.round(roundtrip, 2))
    assert np.allclose(roundtrip, np.asarray(px, np.float64), atol=1e-6), \
        "project(deproject(px)) must round-trip"

    agent = BaseAgent(env)
    agent.move_to(target)
    tcp_pos = env.get_info()["robot_obs"][:3]
    err = float(np.linalg.norm(tcp_pos - target))
    logger.info("final TCP %s, target %s, err %.4f m", np.round(tcp_pos, 4),
                np.round(target, 4), err)
    return err, err <= max_err


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--px", type=int, nargs=2, default=(100, 100))
    p.add_argument("--depth", type=float, default=1.7)
    p.add_argument("--max-err", type=float, default=0.02)
    args = p.parse_args(argv)
    err, ok = run(tuple(args.px), args.depth, args.max_err)
    print(f"move_to_pt: err={err:.4f} m -> {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
