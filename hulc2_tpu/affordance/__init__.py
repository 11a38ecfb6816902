"""Visuo-lingual affordance subsystem: pixel-heatmap + depth prediction from
an image and a language instruction."""
