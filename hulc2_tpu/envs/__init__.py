"""Environment layer: CALVIN PyBullet wrapper (host CPU), task oracle,
batched env farm, symbolic fake env for tests."""
