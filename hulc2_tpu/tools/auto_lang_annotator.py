"""Automatic language annotation of play data.

Counterpart of the reference's annotator pipeline
(reference: hulc2/utils/automatic_lang_annotator_mp.py:29-120,
conf/lang_ann.yaml): scan play episodes for windows where the task oracle
detects a completed task (here directly from the stored ``scene_obs`` vectors
— no simulator replay needed, unlike the reference's env-reset approach),
sample a sentence from the annotation bank, embed it, and write
``auto_lang_ann.npy`` + ``embeddings.npy`` in the exact format the language
dataset and evaluation consume (npz_dataset.py:145-194,
evaluation/utils.py:88-96).
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from hulc2_tpu.data.episode_index import load_ep_start_end_ids
from hulc2_tpu.data.frame_store import NpzFrameStore
from hulc2_tpu.envs.task_oracle import SceneObsTaskOracle
from hulc2_tpu.evaluation.tasks import TASK_NAMES
from hulc2_tpu.tools.annotations import VALIDATION_BANK, sample_annotation

logger = logging.getLogger(__name__)


def detect_task_windows(
    store: NpzFrameStore,
    ep_ids: np.ndarray,
    window: int = 64,
    stride: int = 16,
    tasks: Sequence[str] = TASK_NAMES,
    align_end: bool = True,
    tail: int = 8,
) -> List[dict]:
    """Slide a window over each episode; keep windows where exactly ONE task
    completed (unambiguous annotation, like the reference's oracle check).

    ``align_end`` (default): refine each hit to the EARLIEST frame where the
    oracle fires and re-anchor the window to end ``tail`` frames after it —
    the reference annotator's end-at-completion convention
    (automatic_lang_annotator_mp.py:78-97 collects the window *behind* the
    detected completion). Without alignment the completion can sit anywhere
    inside the 64-frame range, so training sub-windows sampled from the tail
    of the range contain ONLY post-task retreat/idle yet carry the task's
    sentence — which teaches the policy to retreat mid-task (the r5 flagship
    push/stack failure mode: contact + correct direction, then retreat at
    the replan boundary). Near-duplicate refinements of the same completion
    event (overlapping slide positions) are collapsed."""
    oracle = SceneObsTaskOracle()
    hits = []
    for start, end in ep_ids:
        start, end = int(start), int(end)
        last_end: Dict[str, int] = {}  # task -> last aligned end kept
        for s in range(start, end - window + 1, stride):
            info_a = {"scene_obs": store.load_frame(s)["scene_obs"]}
            info_b = {"scene_obs": store.load_frame(s + window - 1)["scene_obs"]}
            done = oracle.get_task_info_for_set(info_a, info_b, tasks)
            if len(done) != 1:
                continue
            task = next(iter(done))
            if not align_end:
                hits.append({"task": task, "indx": (s, s + window - 1)})
                continue
            # earliest f in (s, s+window-1] with oracle(s -> f) firing
            lo, hi = s + 1, s + window - 1
            while lo < hi:
                mid = (lo + hi) // 2
                dm = oracle.get_task_info_for_set(
                    info_a, {"scene_obs": store.load_frame(mid)["scene_obs"]}, [task])
                if task in dm:
                    hi = mid
                else:
                    lo = mid + 1
            w_end = min(end, lo + tail)
            if task in last_end and abs(w_end - last_end[task]) <= window // 2:
                continue  # same completion event seen from an earlier slide
            # Longest unambiguous lookback: the full 64-frame history usually
            # spans the PREVIOUS task's completion too (play tasks run
            # ~30-60 frames back to back), so shrink the start until exactly
            # this one task completes in range rather than dropping the hit.
            db = {"scene_obs": store.load_frame(w_end)["scene_obs"]}
            for w_start in range(max(start, w_end - window + 1), w_end - 26, 6):
                da = {"scene_obs": store.load_frame(w_start)["scene_obs"]}
                if oracle.get_task_info_for_set(da, db, tasks) == {task}:
                    last_end[task] = w_end
                    hits.append({"task": task, "indx": (w_start, w_end)})
                    break
    return hits


def annotate_dataset(
    data_dir,
    lang_folder: str = "lang_annotations",
    window: int = 64,
    stride: int = 16,
    embed_fn: Optional[Callable[[List[str]], np.ndarray]] = None,
    seed: int = 0,
    with_embeddings_lookup: bool = True,
    canonical: bool = False,
    holdout_k: int = 0,
) -> dict:
    """Write <data_dir>/<lang_folder>/auto_lang_ann.npy (+ embeddings.npy).

    ``embed_fn="tokens"`` stores CLIP-BPE token ids (int32) as the "emb"
    field instead of float embeddings — the stub-free representation for
    pipelines whose models carry their own in-graph text tower (policy
    ``model/language_encoder=clip_scratch``, affordance ``text_tower``);
    such models only read the annotation STRINGS / token ids, never a
    precomputed embedding. ``holdout_k`` excludes the last K paraphrases of
    every task from sampling (see tools.annotations.heldout_annotations) so
    evaluation can use instructions the policy has never seen."""
    data_dir = Path(data_dir)
    split = data_dir.name if data_dir.name in ("training", "validation") else "training"
    ep_ids = load_ep_start_end_ids(data_dir, split)
    store = NpzFrameStore(data_dir, ["scene_obs"])
    hits = detect_task_windows(store, ep_ids, window, stride)
    logger.info("%d annotated windows in %s", len(hits), data_dir)

    rng = np.random.default_rng(seed)
    # Validation split: one fixed phrasing per task (reference binds the
    # new_playtable_validation bank for the val split, conf/lang_ann.yaml:10);
    # training split samples from the full paraphrase bank. ``canonical``
    # forces the fixed phrasing everywhere — required when embeddings are
    # hash stubs (paraphrases then share no structure, so training must see
    # the exact vectors evaluation will use).
    anns = [sample_annotation(h["task"], rng,
                              validation=canonical or split == "validation",
                              holdout_k=holdout_k)
            for h in hits]
    tasks = [h["task"] for h in hits]
    if embed_fn == "tokens":
        from hulc2_tpu.utils.clip_tokenizer import tokenize

        embed_fn = lambda ss: tokenize(ss).astype(np.int32)  # noqa: E731
        embs = embed_fn(anns)[:, None, :]  # (N, 1, L) int32
    else:
        if embed_fn is None:  # deterministic hash-based stub embedding (384-d)
            require_stub_embeddings_ok("auto_lang_annotator")
            embed_fn = hash_embed
        embs = np.asarray(embed_fn(anns), np.float32)[:, None, :]  # (N, 1, E)

    lang_data = {
        "language": {"ann": anns, "task": tasks, "emb": embs},
        "info": {"episodes": [], "indx": [h["indx"] for h in hits]},
    }
    out = data_dir / lang_folder
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "auto_lang_ann.npy", lang_data)

    if with_embeddings_lookup:
        # canonical validation sentence per task -> embedding (evaluation
        # lookup format; the reference builds this from the validation bank);
        # token-mode tables stay int32
        canonical_bank = {t: VALIDATION_BANK[t] for t in TASK_NAMES}
        emb_lookup = {
            t: {"ann": [s], "emb": _keep_dtype(embed_fn([s]))}
            for t, s in canonical_bank.items()
        }
        np.save(out / "embeddings.npy", emb_lookup)
    return lang_data


def _keep_dtype(a) -> np.ndarray:
    a = np.asarray(a)
    return a if np.issubdtype(a.dtype, np.integer) else a.astype(np.float32)


def relabel_dataset(
    data_dir,
    src_folder: str = "lang_annotations",
    dst_folder: str = "lang_annotations_relabeled",
    embed_fn: Optional[Callable[[List[str]], np.ndarray]] = None,
    resample: bool = False,
    seed: int = 0,
) -> dict:
    """Re-embed (and optionally re-sample) an existing ``auto_lang_ann.npy``
    with a different language model — the reference's
    relabel_with_new_lang_model.py role (hulc2/utils/relabel_with_new_lang_model.py:12-21):
    swap the NLP backbone of an annotated dataset without replaying it.
    Writes ``<data_dir>/<dst_folder>/auto_lang_ann.npy`` + ``embeddings.npy``."""
    data_dir = Path(data_dir)
    split = data_dir.name if data_dir.name in ("training", "validation") else "training"
    src = np.load(data_dir / src_folder / "auto_lang_ann.npy", allow_pickle=True).item()
    tasks = list(src["language"]["task"])
    if resample:
        rng = np.random.default_rng(seed)
        anns = [sample_annotation(t, rng, validation=split == "validation") for t in tasks]
    else:
        anns = list(src["language"]["ann"])
    if embed_fn is None:
        require_stub_embeddings_ok("relabel_dataset")
        embed_fn = hash_embed
    embs = np.asarray(embed_fn(anns), np.float32)[:, None, :]
    lang_data = {
        "language": {"ann": anns, "task": tasks, "emb": embs},
        "info": dict(src["info"]),
    }
    out = data_dir / dst_folder
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "auto_lang_ann.npy", lang_data)
    # canonical lookup for EVERY task (matching annotate_dataset) so eval /
    # rollout callbacks never hit a missing-task KeyError on rare tasks
    emb_lookup = {
        t: {"ann": [s], "emb": np.asarray(embed_fn([s]), np.float32)}
        for t, s in ((t, VALIDATION_BANK[t]) for t in TASK_NAMES)
    }
    np.save(out / "embeddings.npy", emb_lookup)
    return lang_data


def dataset_task_statistics(data_dir, window: int = 64, stride: int = 16) -> Dict[str, int]:
    """Per-task occurrence counts over a play dataset via the scene-obs
    oracle — the reference's dataset_task_statistics.py role
    (hulc2/utils/dataset_task_statistics.py:12-25, which replays each episode
    through the simulator; here the stored scene_obs vectors suffice)."""
    data_dir = Path(data_dir)
    split = data_dir.name if data_dir.name in ("training", "validation") else "training"
    ep_ids = load_ep_start_end_ids(data_dir, split)
    store = NpzFrameStore(data_dir, ["scene_obs"])
    hits = detect_task_windows(store, ep_ids, window, stride)
    counts: Dict[str, int] = {}
    for h in hits:
        counts[h["task"]] = counts.get(h["task"], 0) + 1
    return dict(sorted(counts.items(), key=lambda kv: -kv[1]))


def require_stub_embeddings_ok(context: str) -> None:
    """Refuse silent hash-embedding fallbacks (VERDICT r1: stub embeddings
    produce metrics that are noise that looks like signal). Call sites that
    would *implicitly* fall back to ``hash_embed`` must pass through this
    gate; direct, intentional ``hash_embed`` calls (tests, smoke CLIs) need
    not."""
    import os

    if os.environ.get("HULC2_ALLOW_STUB_EMBEDDINGS", "") not in ("1", "true", "yes"):
        raise RuntimeError(
            f"{context}: no real language embeddings available, and stub hash "
            "embeddings were not explicitly allowed. Success rates computed "
            "from stub embeddings are meaningless. Provide an embeddings "
            "table (embeddings.npy / --lang-model), or set "
            "HULC2_ALLOW_STUB_EMBEDDINGS=1 to proceed knowingly (tests/smoke)."
        )


def hash_embed(sentences: List[str], dim: int = 384) -> np.ndarray:
    """Deterministic fallback embedding (per-sentence seeded gaussian) used
    when no language tower weights are available. Distinct sentences map to
    distinct, reproducible vectors — sufficient for pipeline tests, NOT a
    semantic embedding."""
    import hashlib

    out = np.empty((len(sentences), dim), np.float32)
    for i, s in enumerate(sentences):
        # digest of the WHOLE sentence — an earlier prefix-seeded variant
        # collided 26 of the 34 canonical task sentences into 8 vectors
        # ("turn on the led" == "turn on the light bulb"), silently removing
        # language conditioning from any pipeline built on this fallback
        h = hashlib.blake2b(s.encode(), digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        out[i] = rng.standard_normal(dim).astype(np.float32)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_dir")
    p.add_argument("--lang-folder", default="lang_annotations")
    p.add_argument("--window", type=int, default=64)
    p.add_argument("--stride", type=int, default=16)
    p.add_argument("--lang-model", default=None, help="path to a local sbert/clip tower; hash stub if omitted")
    p.add_argument("--relabel", action="store_true",
                   help="re-embed the EXISTING --lang-folder annotations with "
                        "--lang-model into --dst-folder instead of replaying "
                        "(reference relabel_with_new_lang_model.py)")
    p.add_argument("--dst-folder", default="lang_annotations_relabeled")
    p.add_argument("--resample", action="store_true",
                   help="with --relabel: also re-draw sentences from the bank")
    p.add_argument("--stats", action="store_true",
                   help="only print per-task window counts "
                        "(reference dataset_task_statistics.py)")
    args = p.parse_args(argv)
    if args.stats:
        for task, n in dataset_task_statistics(args.data_dir, args.window, args.stride).items():
            print(f"{task}: {n}")
        return
    embed_fn = None
    if args.lang_model:
        from hulc2_tpu.models.language import SBertEncoder

        enc = SBertEncoder(args.lang_model)
        embed_fn = lambda anns: np.asarray(enc(anns))
    if args.relabel:
        relabel_dataset(args.data_dir, args.lang_folder, args.dst_folder, embed_fn,
                        resample=args.resample)
    else:
        annotate_dataset(args.data_dir, args.lang_folder, args.window, args.stride, embed_fn)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
