"""Partial pretrained-weight initialization.

Counterpart of the reference's ``initialize_pretrained_weights``
(reference: hulc2/utils/utils.py:36-45): load a pretrained parameter tree into
a freshly initialized model, skipping missing/mismatched leaves and
*truncating position embeddings* when the new window size is shorter than the
pretraining one (the reference's position-embedding surgery). Also provides
``get_portion_of_batch_ids`` (reference: utils/utils.py:144-163), the
deterministic batch-subset selector the rollout callbacks use.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List

import numpy as np

logger = logging.getLogger(__name__)


def merge_pretrained_params(init_tree: Any, pretrained_tree: Any) -> Any:
    """Copy every compatible leaf of ``pretrained_tree`` over ``init_tree``.

    - identical shapes: taken as is
    - position embeddings (leaf path contains "position_embeddings") with a
      longer first axis: truncated to the target length
    - anything else incompatible: kept from init (with a warning)
    """
    import jax

    flat_init = jax.tree_util.tree_flatten_with_path(init_tree)

    def path_str(path):
        return "/".join(str(getattr(p, "key", p)) for p in path)

    pre_by_path = {path_str(p): leaf for p, leaf in jax.tree_util.tree_flatten_with_path(pretrained_tree)[0]}

    out_leaves = []
    n_loaded, n_skipped = 0, 0
    for path, leaf in flat_init[0]:
        key = path_str(path)
        if key in pre_by_path:
            cand = np.asarray(pre_by_path[key])
            tgt_shape = np.shape(leaf)
            if cand.shape == tgt_shape:
                out_leaves.append(cand.astype(np.asarray(leaf).dtype))
                n_loaded += 1
                continue
            if "position_embeddings" in key and cand.shape[1:] == tgt_shape[1:] and cand.shape[0] >= tgt_shape[0]:
                out_leaves.append(cand[: tgt_shape[0]].astype(np.asarray(leaf).dtype))
                logger.info("truncated %s %s -> %s", key, cand.shape, tgt_shape)
                n_loaded += 1
                continue
            logger.warning("shape mismatch for %s: %s vs %s — keeping init", key, cand.shape, tgt_shape)
        n_skipped += 1
        out_leaves.append(leaf)
    logger.info("pretrained init: %d leaves loaded, %d kept from init", n_loaded, n_skipped)
    return jax.tree_util.tree_unflatten(flat_init[1], out_leaves)


def get_portion_of_batch_ids(percentage: float, batch_size: int) -> np.ndarray:
    """Deterministic evenly-spread subset of batch indices
    (reference: utils/utils.py:144-163): e.g. 0.5, 8 -> [0, 2, 4, 6]."""
    if percentage <= 0:
        return np.array([], dtype=int)
    if percentage >= 1:
        return np.arange(batch_size)
    step = 1.0 / percentage
    return np.unique((np.arange(0, batch_size, step)).astype(int))
