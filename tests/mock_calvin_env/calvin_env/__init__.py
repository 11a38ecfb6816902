"""Mock of the upstream ``calvin_env`` package — CONTRACT PIN ONLY.

The real CALVIN simulator (github.com/mees/calvin_env, vendored as an empty
submodule in the reference checkout) is not installable in this environment;
this package reproduces the exact import paths, constructor signatures, and
info-dict shapes that the reference consumes
(reference: hulc2/evaluation/utils.py:218-240 ``get_env``,
hulc2/evaluation/manager_aff_lmp.py:41-74 ``env.get_info()`` +
``task_oracle.get_task_info_for_set``,
conf/callbacks/rollout/tasks/new_playtable_tasks.yaml ``Tasks`` target),
so the real-simulator branch of hulc2_tpu (CalvinTaskOracle, make_calvin_env,
CalvinEnvWrapper, get_camera_params) executes in CI instead of being dead
code until first contact with the actual simulator.

Behavior is simplified (kinematic scene-state bookkeeping, no physics); the
API surface is the contract.
"""
