"""CALVIN long-horizon evaluation harness: symbolic task model, deterministic
chain generation, policy evaluation, results aggregation."""
