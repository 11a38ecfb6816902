"""Offline data tooling: splitting, statistics, annotation, preprocessing,
dataset merging — the producers of the on-disk formats the data layer reads."""
