"""Pretrained model registry: model_id -> architecture + checkpoint file.

Behavioral contract (reference: speakerlab/bin/infer_sv.py:42-211 `supports`
dict): the same modelscope model ids map to our Flax architectures; torch
checkpoints convert mechanically (speaker3d_tpu.compat). This container has
no network egress, so checkpoints must already exist under
``local_model_dir/<model_id>/<model_pt>`` (the layout modelscope's
snapshot_download produces).
"""

from __future__ import annotations

import os
from typing import Any, Dict

CAMPPLUS_VOX = {"obj": "speaker3d_tpu.models.campplus.CAMPPlus",
                "args": {"feat_dim": 80, "embedding_size": 512}}
CAMPPLUS_COMMON = {"obj": "speaker3d_tpu.models.campplus.CAMPPlus",
                   "args": {"feat_dim": 80, "embedding_size": 192}}
ERes2Net_VOX = {"obj": "speaker3d_tpu.models.eres2net.ERes2Net",
                "args": {"feat_dim": 80, "embedding_size": 192}}
ERes2NetV2_COMMON = {"obj": "speaker3d_tpu.models.eres2netv2.ERes2NetV2",
                     "args": {"feat_dim": 80, "embedding_size": 192,
                              "base_width": 26, "scale": 2, "expansion": 2}}
ERes2NetV2_w24s4ep4_COMMON = {
    "obj": "speaker3d_tpu.models.eres2netv2.ERes2NetV2",
    "args": {"feat_dim": 80, "embedding_size": 192,
             "base_width": 24, "scale": 4, "expansion": 4}}
ERes2Net_COMMON = {  # the "huge" block variant (reference: ERes2Net_huge.py)
    "obj": "speaker3d_tpu.models.eres2net.ERes2Net",
    "args": {"feat_dim": 80, "embedding_size": 192, "m_channels": 64,
             "base_width": 24, "scale": 3, "expansion": 4}}
ERes2Net_base_COMMON = {"obj": "speaker3d_tpu.models.eres2net.ERes2Net",
                        "args": {"feat_dim": 80, "embedding_size": 512,
                                 "m_channels": 32}}
ERes2Net_Base_3D_Speaker = ERes2Net_base_COMMON
ERes2Net_Large_3D_Speaker = {"obj": "speaker3d_tpu.models.eres2net.ERes2Net",
                             "args": {"feat_dim": 80, "embedding_size": 512,
                                      "m_channels": 64}}
ECAPA_CNCeleb = {"obj": "speaker3d_tpu.models.ecapa_tdnn.ECAPA_TDNN",
                 "args": {"input_size": 80, "lin_neurons": 192,
                          "channels": (1024, 1024, 1024, 1024, 3072)}}

# (reference: bin/infer_sv.py:132-211)
SUPPORTS: Dict[str, Dict[str, Any]] = {
    "iic/speech_campplus_sv_zh-cn_16k-common": {
        "revision": "v1.0.0", "model": CAMPPLUS_COMMON,
        "model_pt": "campplus_cn_common.bin"},
    "iic/speech_eres2net_sv_zh-cn_16k-common": {
        "revision": "v1.0.5", "model": ERes2Net_COMMON,
        "model_pt": "pretrained_eres2net_aug.ckpt"},
    "iic/speech_eres2netv2_sv_zh-cn_16k-common": {
        "revision": "v1.0.1", "model": ERes2NetV2_COMMON,
        "model_pt": "pretrained_eres2netv2.ckpt"},
    "iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common": {
        "revision": "v1.0.1", "model": ERes2NetV2_w24s4ep4_COMMON,
        "model_pt": "pretrained_eres2netv2w24s4ep4.ckpt"},
    "iic/speech_eres2net_base_200k_sv_zh-cn_16k-common": {
        "revision": "v1.0.0", "model": ERes2Net_base_COMMON,
        "model_pt": "pretrained_eres2net.pt"},
    "iic/speech_campplus_sv_zh_en_16k-common_advanced": {
        "revision": "v1.0.0", "model": CAMPPLUS_COMMON,
        "model_pt": "campplus_cn_en_common.pt"},
    "iic/speech_campplus_sv_en_voxceleb_16k": {
        "revision": "v1.0.2", "model": CAMPPLUS_VOX,
        "model_pt": "campplus_voxceleb.bin"},
    "iic/speech_eres2net_sv_en_voxceleb_16k": {
        "revision": "v1.0.2", "model": ERes2Net_VOX,
        "model_pt": "pretrained_eres2net.ckpt"},
    "iic/speech_eres2net_base_sv_zh-cn_3dspeaker_16k": {
        "revision": "v1.0.1", "model": ERes2Net_Base_3D_Speaker,
        "model_pt": "eres2net_base_model.ckpt"},
    "iic/speech_eres2net_large_sv_zh-cn_3dspeaker_16k": {
        "revision": "v1.0.0", "model": ERes2Net_Large_3D_Speaker,
        "model_pt": "eres2net_large_model.ckpt"},
    "iic/speech_ecapa-tdnn_sv_zh-cn_cnceleb_16k": {
        "revision": "v1.0.0", "model": ECAPA_CNCeleb,
        "model_pt": "ecapa-tdnn.ckpt"},
    "iic/speech_ecapa-tdnn_sv_zh-cn_3dspeaker_16k": {
        "revision": "v1.0.0", "model": ECAPA_CNCeleb,
        "model_pt": "ecapa-tdnn.ckpt"},
    "iic/speech_ecapa-tdnn_sv_en_voxceleb_16k": {
        "revision": "v1.0.1", "model": ECAPA_CNCeleb,
        "model_pt": "ecapa_tdnn.bin"},
}


def build_model(model_id: str):
    """Instantiate the (uninitialized) Flax model for a registry id."""
    from speaker3d_tpu.utils.builder import dynamic_import

    if model_id not in SUPPORTS:
        raise KeyError(f"model id {model_id!r} not supported; "
                       f"known: {sorted(SUPPORTS)}")
    spec = SUPPORTS[model_id]["model"]
    return dynamic_import(spec["obj"])(**spec["args"])


def load_pretrained(model_id: str, local_model_dir: str = "pretrained"):
    """Build the model and load+convert its torch checkpoint -> variables."""
    import numpy as np

    from speaker3d_tpu.compat import load_into_model, load_torch_checkpoint

    model = build_model(model_id)
    ckpt_path = os.path.join(local_model_dir, model_id,
                             SUPPORTS[model_id]["model_pt"])
    if not os.path.isfile(ckpt_path):
        raise FileNotFoundError(
            f"checkpoint not found at {ckpt_path}; this environment has no "
            f"network egress — place the modelscope snapshot there")
    sd = load_torch_checkpoint(ckpt_path)
    feat_dim = SUPPORTS[model_id]["model"]["args"].get(
        "feat_dim", SUPPORTS[model_id]["model"]["args"].get("input_size", 80))
    example = np.zeros((1, 100, feat_dim), np.float32)
    variables = load_into_model(model, sd, example)
    return model, variables
