"""Affordance-training config groups
(reference: conf/affordance/train_affordance.yaml + aff_detection variants)."""
from hulc2_tpu.core.config import register

register(
    "aff_detection",
    "rn18_pixel",
    {
        "encoder_name": "resnet18",
        "decoder_channels": [256, 128, 64, 32, 16],
        "fusion_type": "mult",
        "lang_embed_dim": 1024,
        "depth_dist": "gaussian",  # gaussian | logistic | none
        "normalize_depth": True,
        "freeze_encoder": True,
        "optimizer": {"kind": "adam", "lr": 1e-4},
        "loss_weights": {"aff": 0.1, "depth": 0.9},
        "dataset": {
            "data_dir": "data/calvin_lang_MoCEndPt",
            "cam": "static",
            "data_percent": 1.0,
            "img_resize": {"static": 224, "gripper": 96, "all": 100},
        },
    },
)
register(
    "aff_detection",
    "rn50_pixel",
    {
        "encoder_name": "resnet50",
        "decoder_channels": [256, 128, 64, 32, 16],
        "fusion_type": "mult",
        "lang_embed_dim": 1024,
        "depth_dist": "logistic",
        "normalize_depth": True,
        "freeze_encoder": True,
        "optimizer": {"kind": "adam", "lr": 1e-4},
        "loss_weights": {"aff": 0.1, "depth": 0.9},
        "dataset": {
            "data_dir": "data/calvin_lang_MoCEndPt",
            "cam": "static",
            "data_percent": 1.0,
            "img_resize": {"static": 224, "gripper": 96, "all": 100},
        },
    },
)

register(
    "aff_detection",
    "rn50_clip_pixel",
    {
        "encoder_name": "clip_rn50",
        "decoder_channels": [256, 128, 64, 32, 16],
        "fusion_type": "mult",
        "lang_embed_dim": 1024,
        "depth_dist": "gaussian",
        "normalize_depth": True,
        "freeze_encoder": True,
        "optimizer": {"kind": "adam", "lr": 1e-4},
        "loss_weights": {"aff": 0.1, "depth": 0.9},
        "dataset": {
            "data_dir": "data/calvin_lang_MoCEndPt",
            "cam": "static",
            "data_percent": 1.0,
            "img_resize": {"static": 224, "gripper": 96, "all": 100},
        },
    },
)

register(
    "aff_detection",
    "r3m_pixel",
    {
        # real-world configuration (reference: visual_lang_encoders/
        # r3m_rn18.py:53 forces decoder_channels (512, 256, 128, 64, 32);
        # layer4 trains when freeze_encoder=False, layers 1-3 stay frozen)
        "encoder_name": "r3m_rn18",
        "decoder_channels": [512, 256, 128, 64, 32],
        "fusion_type": "mult",
        "lang_embed_dim": 1024,
        "depth_dist": "gaussian",
        "normalize_depth": True,
        "freeze_encoder": False,
        "optimizer": {"kind": "adam", "lr": 1e-4},
        "loss_weights": {"aff": 0.1, "depth": 0.9},
        "dataset": {
            "data_dir": "data/real_world_lang_MoCEndPt",
            "cam": "static",
            "data_percent": 1.0,
            "img_resize": {"static": 224, "gripper": 96, "all": 100},
        },
    },
)

# --------------------------------------------------------------------------- #
# reference-named stream x language x label-type variants
# (reference: conf/affordance/aff_detection/{rn18_bert_pixel,rn18_clip_pixel,
#  rn18_sbert_pixel,rn50_bert_pixel,rn18_bert_mask,rn18_clip_mask,clip}.yaml).
# The language encoder itself lives outside the detector (embeddings are
# precomputed by models/language.py or the dataset); the variant fixes the
# embedding width: clip=1024, bert/distilbert=768, sbert=384.
# --------------------------------------------------------------------------- #
def _aff_variant(encoder_name, lang_dim, label_type="pixel", **extra):
    cfg = {
        "encoder_name": encoder_name,
        "decoder_channels": [256, 128, 64, 32, 16],
        "fusion_type": "mult",
        "lang_embed_dim": lang_dim,
        "depth_dist": "gaussian",
        "normalize_depth": True,
        "freeze_encoder": True,
        "optimizer": {"kind": "adam", "lr": 1e-4},
        "loss_weights": {"aff": 0.1, "depth": 0.9},
        "dataset": {
            "data_dir": "data/calvin_lang_MoCEndPt",
            "cam": "static",
            "data_percent": 1.0,
            "label_type": label_type,
            "img_resize": {"static": 224, "gripper": 96, "all": 100},
        },
    }
    cfg.update(extra)
    return cfg


register("aff_detection", "rn18_bert_pixel", _aff_variant("resnet18", 768))
# in-graph token tower (detector.text_tower): the detector embeds CLIP-BPE
# token ids with its own small trainable text transformer — no external (or
# stub) embedding table in the pipeline; the affordance analogue of the
# policy's model/language_encoder=clip_scratch path
register(
    "aff_detection",
    "rn18_tokens_pixel",
    _aff_variant("resnet18", 384, text_tower=True, tower_width=256,
                 tower_heads=4, tower_layers=2),
)
register("aff_detection", "rn18_clip_pixel", _aff_variant("resnet18", 1024))
register("aff_detection", "rn18_sbert_pixel", _aff_variant("resnet18", 384))
register("aff_detection", "rn50_bert_pixel", _aff_variant("resnet50", 768))
register("aff_detection", "rn18_bert_mask", _aff_variant("resnet18", 768, "mask"))
register("aff_detection", "rn18_clip_mask", _aff_variant("resnet18", 1024, "mask"))
register("aff_detection", "clip", _aff_variant("clip_rn50", 1024))

register(
    "root",
    "train_affordance",
    {
        "_defaults_": [("aff_detection", "rn18_pixel")],
        "batch_size": 32,
        "num_workers": 4,
        "max_epochs": 30,
        "seed": 42,
        "log_dir": "runs/affordance",
        "rand_shift_pad": 8,
    },
)
