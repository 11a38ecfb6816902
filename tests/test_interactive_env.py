"""Interactive fake env: action-dependent dynamics, scene-dependent rendering,
and the scripted expert that closes the learning loop (VERDICT r3 #1).

The reference's quality signal is task success from real rollouts
(reference: hulc2/rollout/rollout.py:61, evaluation/evaluation.py:69-94);
these tests pin the property that makes that signal *attainable* here: the
env responds to policy actions and shows its state in pixels.
"""
import numpy as np
import pytest

from hulc2_tpu.envs import scene_layout as L
from hulc2_tpu.envs.fake_env import FakeCalvinEnv
from hulc2_tpu.envs.scripted_expert import ScriptedExpert
from hulc2_tpu.envs.task_oracle import SceneObsTaskOracle
from hulc2_tpu.evaluation.initial_states import get_env_state_for_initial_condition
from hulc2_tpu.evaluation.sequences import enumerate_initial_states, get_sequences
from hulc2_tpu.evaluation.tasks import TASK_NAMES, successor_states


def make_env(state_idx=0, **kw):
    kw.setdefault("static_hw", 32)
    kw.setdefault("gripper_hw", 32)
    env = FakeCalvinEnv(**kw)
    init = dict(enumerate_initial_states()[state_idx])
    robot_obs, scene_obs = get_env_state_for_initial_condition(init)
    env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
    return env, init


class TestRendering:
    def test_obs_shapes_dtypes(self):
        env, _ = make_env(static_hw=48, gripper_hw=24)
        obs = env.get_obs()
        assert obs["rgb_obs"]["rgb_static"].shape == (48, 48, 3)
        assert obs["rgb_obs"]["rgb_static"].dtype == np.uint8
        assert obs["rgb_obs"]["rgb_gripper"].shape == (24, 24, 3)
        assert obs["depth_obs"]["depth_static"].shape == (48, 48)

    def test_deterministic_function_of_state(self):
        env, _ = make_env()
        a = env.get_obs()["rgb_obs"]["rgb_static"]
        b = env.get_obs()["rgb_obs"]["rgb_static"]
        np.testing.assert_array_equal(a, b)
        assert a.std() > 5  # an actual scene, not a constant

    def test_pixels_reflect_scene_state(self):
        """The SAME robot pose must render differently when the scene differs
        (this is what the r3 noise frames could not do)."""
        env, _ = make_env(static_hw=64)
        off = env.get_obs()["rgb_obs"]["rgb_static"].astype(int)
        env.scene_obs[5] = 1.0  # led on
        on = env.get_obs()["rgb_obs"]["rgb_static"].astype(int)
        assert np.abs(on - off).max() > 50
        env.scene_obs[1] = 0.15  # drawer out -> larger change
        drawer = env.get_obs()["rgb_obs"]["rgb_static"].astype(int)
        assert (np.abs(drawer - on).sum(-1) > 30).sum() > 20  # many pixels moved

    def test_depth_deproject_roundtrip(self):
        """Rendered depth + PinholeCamera.deproject returns the true surface
        point of the block under the pixel (the hierarchical agent's pixel→3D
        path, reference lmp_agent.py:174-194)."""
        env, _ = make_env(static_hw=96)
        obs = env.get_obs()
        cam = env.cameras[0]
        bp = env.scene_obs[6:9]
        px = cam.project(np.append(bp, 1.0))
        world = cam.deproject(px, obs["depth_obs"]["depth_static"])
        np.testing.assert_allclose(world[:2], bp[:2], atol=0.02)
        # the ray hits the block's TOP face: center + render lift + half height
        assert abs(world[2] - (bp[2] + 0.012 + L.BLOCK_HALF[2])) < 0.02


class TestDynamics:
    def test_button_press_toggles_led(self):
        env, _ = make_env()
        env.robot_obs[:3] = [*L.BUTTON_POS[:2], 0.58]
        led0 = env.scene_obs[5]
        for _ in range(10):  # descend onto the button
            env.step(np.array([0, 0, -1, 0, 0, 0, 1.0]))
        assert env.scene_obs[5] == 1.0 - led0
        for _ in range(10):  # rise; edge trigger must not re-toggle
            env.step(np.array([0, 0, 1, 0, 0, 0, 1.0]))
        assert env.scene_obs[5] == 1.0 - led0

    def test_lever_drags_lightbulb(self):
        env, _ = make_env()
        env.robot_obs[:3] = L.switch_lever_pos(env.scene_obs[3])
        bulb0 = env.scene_obs[4]
        direction = 1.0 if bulb0 == 0 else -1.0
        for _ in range(12):
            env.step(np.array([0, 0, direction, 0, 0, 0, 1.0]))
        assert env.scene_obs[4] == 1.0 - bulb0

    def test_grasp_carry_release(self):
        env, _ = make_env()
        b0 = env.scene_obs[6:9].copy()  # red block
        env.robot_obs[:3] = b0 + [0, 0, 0.002]
        env.step(np.array([0, 0, 0, 0, 0, 0, -1.0]))  # close -> grasp
        assert env._held == "red"
        for _ in range(8):
            env.step(np.array([0, 0, 1, 0, 0, 0, -1.0]))  # lift
        assert env.scene_obs[8] > b0[2] + 0.05
        env.step(np.array([0, 0, 0, 0, 0, 0, 1.0]))  # release -> falls back
        assert env._held is None
        assert abs(env.scene_obs[8] - b0[2]) < 0.02

    def test_push_displaces_block(self):
        env, _ = make_env()
        b0 = env.scene_obs[6:9].copy()
        env.robot_obs[:3] = [b0[0] - 0.08, b0[1], b0[2]]
        for _ in range(8):
            env.step(np.array([1, 0, 0, 0, 0, 0, -1.0]))
        assert env.scene_obs[6] - b0[0] > 0.03

    def test_slider_follows_grasped_handle(self):
        env, _ = make_env()
        s0 = env.scene_obs[0]
        env.robot_obs[:3] = L.slider_handle_pos(s0)
        env.step(np.array([0, 0, 0, 0, 0, 0, -1.0]))
        direction = 1.0 if s0 < 0.14 else -1.0
        for _ in range(20):
            env.step(np.array([direction, 0, 0, 0, 0, 0, -1.0]))
        assert abs(env.scene_obs[0] - s0) > 0.15

    def test_ungrasped_handle_does_not_move(self):
        env, _ = make_env()
        s0 = env.scene_obs[0]
        env.robot_obs[:3] = L.slider_handle_pos(s0)
        for _ in range(10):  # gripper open -> no drag
            env.step(np.array([1, 0, 0, 0, 0, 0, 1.0]))
        assert env.scene_obs[0] == s0

    def test_perform_still_available_for_tooling(self):
        env, _ = make_env()
        led0 = env.scene_obs[5]
        env.perform("turn_on_led" if led0 == 0 else "turn_off_led")
        assert env.scene_obs[5] == 1.0 - led0


class TestScriptedExpert:
    @pytest.mark.parametrize("task", [
        "turn_on_led", "turn_on_lightbulb", "move_slider_left", "open_drawer",
        "push_red_block_right", "rotate_blue_block_left", "lift_pink_block_table",
    ])
    def test_single_tasks(self, task):
        oracle = SceneObsTaskOracle()
        for idx in range(len(enumerate_initial_states())):
            init = dict(enumerate_initial_states()[idx])
            if len(successor_states(init, task)) != 1:
                continue
            env, _ = make_env(idx, static_hw=16, gripper_hw=16)
            assert ScriptedExpert(env).solve(task), task
            return
        pytest.skip(f"no initial state admits {task}")

    def test_full_chain(self):
        """One real benchmark chain end to end through step() — the full
        learning-loop substrate (grasp, carry, place, articulated joints)."""
        init, chain = get_sequences(3)[1]
        robot_obs, scene_obs = get_env_state_for_initial_condition(dict(init))
        env = FakeCalvinEnv(static_hw=16, gripper_hw=16)
        env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
        ex = ScriptedExpert(env)
        assert all(ex.solve(t) for t in chain), chain

    def test_every_task_family_has_a_plan(self):
        """plan() covers all 34 protocol tasks (given a state where the task
        is symbolically feasible)."""
        covered = set()
        for task in TASK_NAMES:
            for st in enumerate_initial_states():
                if len(successor_states(dict(st), task)) == 1:
                    env, _ = make_env(0, static_hw=16, gripper_hw=16)
                    robot_obs, scene_obs = get_env_state_for_initial_condition(dict(st))
                    env.reset(robot_obs=robot_obs, scene_obs=scene_obs)
                    assert ScriptedExpert(env).plan(task)
                    covered.add(task)
                    break
        # the other 7 (lift_*_drawer, place_in_*, stack, unstack) need
        # mid-chain preconditions; they are exercised in test_full_chain and
        # the 64-chain sweep (docs/runs)
        assert len(covered) == 27

    def test_infeasible_plan_is_clean_failure(self):
        """An infeasible draw (unstack with nothing stacked) returns False
        from solve() instead of crashing — one bad draw must never kill a
        dataset-generation run (round-4 gen_big regression)."""
        env, _ = make_env(0, static_hw=16, gripper_hw=16)
        assert ScriptedExpert(env).solve("unstack_block") is False


class TestSymbolicResync:
    def test_roundtrip_from_initial_states(self):
        """Physical state synthesized FROM a symbolic state must re-derive
        back to it (for the keys the physical layout can represent)."""
        from hulc2_tpu.envs.task_oracle import symbolic_state_from_scene

        for init in enumerate_initial_states()[:8]:
            sym = dict(init)
            _, scene_obs = get_env_state_for_initial_condition(dict(sym))
            got = symbolic_state_from_scene(scene_obs, held=None)
            for k in ("slider", "drawer", "lightbulb", "led"):
                assert got[k] == sym[k], (k, got[k], sym[k])
            for c in ("red", "blue", "pink"):
                assert got[f"{c}_block"] == sym[f"{c}_block"], c
            assert got["grasped"] == 0

    def test_tracks_interactive_changes(self):
        from hulc2_tpu.envs.task_oracle import symbolic_state_from_scene

        env, _ = make_env(0, static_hw=16, gripper_hw=16)
        before = symbolic_state_from_scene(env.scene_obs, held=env._held)
        task = "open_drawer" if before["drawer"] == "closed" else "close_drawer"
        assert ScriptedExpert(env).solve(task)
        after = symbolic_state_from_scene(env.scene_obs, held=env._held)
        assert after["drawer"] != before["drawer"]
