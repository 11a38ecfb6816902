"""Utilities: checkpoint conversion, logging helpers, misc tooling."""
