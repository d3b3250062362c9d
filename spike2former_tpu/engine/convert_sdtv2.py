"""torch state_dict → flax variables converter for the SDTv2 backbone.

Maps the reference's parameter names (Spiking_vit_MetaFormer, sdtv2.py
:424-655 — e.g. ``downsample1_1.encode_conv.weight``,
``block3.2.attn.q_conv.0.body.1.bn.running_mean``) onto this framework's
flax tree (``down1_1/Conv_0/kernel`` etc.), transposing conv kernels
OIHW→HWIO.  Used after the prefix-strip loading of
``engine/checkpoint.py:load_torch_state_dict`` (the reference's
``init_weights`` prefix handling, sdtv2.py:601-607).
"""
from __future__ import annotations

from typing import Any

import numpy as np

from .checkpoint import convert_torch_conv


def _set(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv(sd, key, params, path):
    _set(params, path + ["kernel"], convert_torch_conv(sd[key + ".weight"]))
    if key + ".bias" in sd:
        _set(params, path + ["bias"], np.asarray(sd[key + ".bias"]))


def _bn(sd, key, params, stats, path):
    """torch BN → our BatchNorm wrapper (inner nn.BatchNorm 'BatchNorm_0')."""
    inner = path + ["BatchNorm_0"]
    _set(params, inner + ["scale"], np.asarray(sd[key + ".weight"]))
    _set(params, inner + ["bias"], np.asarray(sd[key + ".bias"]))
    _set(stats, inner + ["mean"], np.asarray(sd[key + ".running_mean"]))
    _set(stats, inner + ["var"], np.asarray(sd[key + ".running_var"]))


def _bn_raw(sd, key, params, stats, path):
    """torch BN → a bare flax param/stat group (BNAndPad stores directly)."""
    _set(params, path + ["scale"], np.asarray(sd[key + ".weight"]))
    _set(params, path + ["bias"], np.asarray(sd[key + ".bias"]))
    _set(stats, path + ["mean"], np.asarray(sd[key + ".running_mean"]))
    _set(stats, path + ["var"], np.asarray(sd[key + ".running_var"]))


def _convbn(sd, conv_key, bn_key, params, stats, path):
    _conv(sd, conv_key, params, path + ["Conv_0"])
    _bn(sd, bn_key, params, stats, path + ["BatchNorm_0"])


def _sepconv(sd, pfx, params, stats, path):
    """sdtv2 SepConv (:135-180): pwconv1+bn1, dwconv (no BN), pwconv2+bn2."""
    _convbn(sd, f"{pfx}.pwconv1", f"{pfx}.bn1", params, stats,
            path + ["ConvBN_0"])
    _conv(sd, f"{pfx}.dwconv", params, path + ["Conv_0"])
    _convbn(sd, f"{pfx}.pwconv2", f"{pfx}.bn2", params, stats,
            path + ["ConvBN_1"])


def _convblock(sd, pfx, params, stats, path):
    """MS_ConvBlock (:183-219)."""
    _sepconv(sd, f"{pfx}.Conv", params, stats, path + ["SepConv_0"])
    _convbn(sd, f"{pfx}.conv1", f"{pfx}.bn1", params, stats,
            path + ["ConvBN_0"])
    _convbn(sd, f"{pfx}.conv2", f"{pfx}.bn2", params, stats,
            path + ["ConvBN_1"])


def _repconv(sd, pfx, params, stats, path):
    """RepConv (:112-132): body.0 conv1x1, body.1 BNAndPad, body.2.{0 dw,
    1 pw, 2 BN}."""
    _conv(sd, f"{pfx}.body.0", params, path + ["Conv_0"])
    _bn_raw(sd, f"{pfx}.body.1.bn", params, stats, path + ["BNAndPad_0"])
    _conv(sd, f"{pfx}.body.2.0", params, path + ["Conv_1"])
    _conv(sd, f"{pfx}.body.2.1", params, path + ["Conv_2"])
    _bn(sd, f"{pfx}.body.2.2", params, stats, path + ["BatchNorm_0"])


def _downsample(sd, pfx, params, stats, path):
    _conv(sd, f"{pfx}.encode_conv", params, path + ["Conv_0"])
    _bn(sd, f"{pfx}.encode_bn", params, stats, path + ["BatchNorm_0"])


def _attention(sd, pfx, params, stats, path):
    """MS_Attention_RepConv_qkv_id (:258-344): q/k/v/proj = RepConv + BN."""
    for name in ("q", "k", "v"):
        _repconv(sd, f"{pfx}.{name}_conv.0", params, stats,
                 path + [f"{name}_rep"])
        _bn(sd, f"{pfx}.{name}_conv.1", params, stats,
            path + [f"{name}_bn"])
    _repconv(sd, f"{pfx}.proj_conv.0", params, stats, path + ["proj_rep"])
    _bn(sd, f"{pfx}.proj_conv.1", params, stats, path + ["proj_bn"])


def _mlp(sd, pfx, params, stats, path):
    """MS_MLP (:222-255): fc1_conv(Conv1d)+fc1_bn, fc2_conv+fc2_bn.

    Conv1d weight [O, I, 1] → flax Conv kernel [1, I, O]."""

    def conv1d(key, sub):
        # torch Conv1d weight [O, I, 1] → our MSMLP pointwise 2-D conv
        # kernel [1, 1, I, O] (MSMLP folds spatial dims, layers.py).
        w = np.asarray(sd[key + ".weight"])
        _set(params, path + [sub, "kernel"],
             np.transpose(w, (2, 1, 0))[None])
        _set(params, path + [sub, "bias"], np.asarray(sd[key + ".bias"]))

    conv1d(f"{pfx}.fc1_conv", "Conv_0")
    _bn(sd, f"{pfx}.fc1_bn", params, stats, path + ["BatchNorm_0"])
    conv1d(f"{pfx}.fc2_conv", "Conv_1")
    _bn(sd, f"{pfx}.fc2_bn", params, stats, path + ["BatchNorm_1"])


def _block(sd, pfx, params, stats, path):
    """MS_Block (:347-383): attn + mlp."""
    _attention(sd, f"{pfx}.attn", params, stats, path + ["SpikeAttention_0"])
    _mlp(sd, f"{pfx}.mlp", params, stats, path + ["MSMLP_0"])


def convert_sdtv2_backbone(sd: dict[str, np.ndarray],
                           depths_stage3: int = 6, depths_stage4: int = 2
                           ) -> dict[str, Any]:
    """Returns {'params': ..., 'batch_stats': ...} for SpikingMetaFormer
    (variant='sdtv2') from a reference torch state_dict (prefix-stripped)."""
    params: dict = {}
    stats: dict = {}
    _downsample(sd, "downsample1_1", params, stats, ["down1_1"])
    _convblock(sd, "ConvBlock1_1.0", params, stats, ["conv1_1"])
    _downsample(sd, "downsample1_2", params, stats, ["down1_2"])
    _convblock(sd, "ConvBlock1_2.0", params, stats, ["conv1_2"])
    _downsample(sd, "downsample2", params, stats, ["down2"])
    _convblock(sd, "ConvBlock2_1.0", params, stats, ["conv2_1"])
    _convblock(sd, "ConvBlock2_2.0", params, stats, ["conv2_2"])
    _downsample(sd, "downsample3", params, stats, ["down3"])
    for i in range(depths_stage3):
        _block(sd, f"block3.{i}", params, stats, [f"block3_{i}"])
    _downsample(sd, "downsample4", params, stats, ["down4"])
    for i in range(depths_stage4):
        _block(sd, f"block4.{i}", params, stats, [f"block4_{i}"])
    return {"params": params, "batch_stats": stats}
