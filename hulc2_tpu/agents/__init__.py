"""Inference agents: model-based PD motion primitives + model-free policy,
composed hierarchically (affordance -> move_to -> HULC policy)."""
