"""torch state_dict → flax variables converter for the SDTv3-family
backbones: Spiking_vit_MetaFormerv2 (E-SpikeFormer, sdtv3.py:401-616) and
the MAE-pretrain flavor Spiking_vit_MetaFormerv3 (sdtv3MAE.py:526-750).

Key-name map (reference → flax tree of ``SpikingMetaFormer``):
  downsample{1_1,1_2,2,3,4}.encode_{conv,bn}      → down*/Conv_0,BatchNorm_0
  ConvBlock*.0.{Conv,conv1,bn1,conv2,bn2}          → conv*/SepConv_0,ConvBN_*
    (Conv = SepConv_Spike: pwconv1.{0,1}, dwconv.{0,1}, pwconv2.{0,1},
     sdtv3.py:99-148 — structurally identical to SNN_core.py:11-63, so the
     head's ``_sepconv_spike`` mapping is reused)
  block*.{i}.conv                                  → block*_{i}/SepConv_0
  block*.{i}.attn.{q,k,v,proj}_conv.{0,1}          → .../SpikeAttention_0/
    {q,k,v,proj}_conv/{Conv_0,BatchNorm_0}  (MS_Attention_linear,
    sdtv3.py:229-313: plain conv1x1+BN — unlike v2's RepConv stacks)
  block*.{i}.mlp.fc{1,2}_{conv,bn}                 → .../MSMLP_0/...
  block*.{i}.layer_scale{1,2,3}  (MAE only)        → MS_Block_cswin's
    layer-scale gammas (sdtv3MAE.py:475-477)

The MAE variant has NO downsample4 (sdtv3MAE.py:620-666: both deep stages
run at embed_dim[2]) and its attention path is CSWin
(``CSWinSpikeAttention_0``); the conv1x1/BN key layout is identical
(MS_Attention_linear_cswin, sdtv3MAE.py:349-436).
"""
from __future__ import annotations

from typing import Any

import numpy as np

from .convert import _sepconv_spike
from .convert_sdtv2 import _bn, _convbn, _set


def _mlp_v3(sd, pfx, params, stats, path):
    """MS_MLP (sdtv3.py:192-225): Conv1d(k=1)+BN1d pairs → MSMLP
    {Conv_0, BatchNorm_0, Conv_1, BatchNorm_1}; Conv1d weight [O, I, 1] →
    pointwise 2-D conv kernel [1, 1, I, O] (MSMLP folds spatial dims)."""

    def conv1d(key, sub):
        w = np.asarray(sd[key + ".weight"])
        _set(params, path + [sub, "kernel"], np.transpose(w, (2, 1, 0))[None])
        _set(params, path + [sub, "bias"], np.asarray(sd[key + ".bias"]))

    conv1d(f"{pfx}.fc1_conv", "Conv_0")
    _bn(sd, f"{pfx}.fc1_bn", params, stats, path + ["BatchNorm_0"])
    conv1d(f"{pfx}.fc2_conv", "Conv_1")
    _bn(sd, f"{pfx}.fc2_bn", params, stats, path + ["BatchNorm_1"])


def _downsample(sd, pfx, params, stats, path):
    from .convert_sdtv2 import _conv
    _conv(sd, f"{pfx}.encode_conv", params, path + ["Conv_0"])
    _bn(sd, f"{pfx}.encode_bn", params, stats, path + ["BatchNorm_0"])


def _convblock_v3(sd, pfx, params, stats, path):
    """MS_ConvBlock_spike_SepConv (sdtv3.py:153-189) / the MAE file's
    MS_ConvBlock (sdtv3MAE.py:172-209) — same key layout."""
    _sepconv_spike(sd, f"{pfx}.Conv", params, stats, path + ["SepConv_0"])
    _convbn(sd, f"{pfx}.conv1", f"{pfx}.bn1", params, stats,
            path + ["ConvBN_0"])
    _convbn(sd, f"{pfx}.conv2", f"{pfx}.bn2", params, stats,
            path + ["ConvBN_1"])


def _attention_v3(sd, pfx, params, stats, path):
    """MS_Attention_linear (sdtv3.py:229-313) / MS_Attention_linear_cswin
    (sdtv3MAE.py:349-436): q/k/v/proj are Sequential(Conv2d 1x1, BN2d)."""
    for name in ("q", "k", "v", "proj"):
        _convbn(sd, f"{pfx}.{name}_conv.0", f"{pfx}.{name}_conv.1",
                params, stats, path + [f"{name}_conv"])


def _block_v3(sd, pfx, params, stats, path, *, mae: bool):
    """MS_Block_Spike_SepConv (sdtv3.py:321-360) or MS_Block_cswin
    (sdtv3MAE.py:439-483, + layer_scale1/2/3)."""
    if mae:
        for g in ("layer_scale1", "layer_scale2", "layer_scale3"):
            _set(params, path + [g], np.asarray(sd[f"{pfx}.{g}"]))
    _sepconv_spike(sd, f"{pfx}.conv", params, stats, path + ["SepConv_0"])
    attn_name = "CSWinSpikeAttention_0" if mae else "SpikeAttention_0"
    _attention_v3(sd, f"{pfx}.attn", params, stats, path + [attn_name])
    _mlp_v3(sd, f"{pfx}.mlp", params, stats, path + ["MSMLP_0"])


def convert_sdtv3_backbone(sd: dict[str, np.ndarray],
                           depths_stage3: int = 6, depths_stage4: int = 2,
                           *, mae: bool = False) -> dict[str, Any]:
    """Returns {'params', 'batch_stats'} for SpikingMetaFormer
    (variant='sdtv3' / 'sdtv3mae') from a reference torch state_dict
    (prefix-stripped, as after checkpoint.load_torch_state_dict)."""
    params: dict = {}
    stats: dict = {}
    _downsample(sd, "downsample1_1", params, stats, ["down1_1"])
    _convblock_v3(sd, "ConvBlock1_1.0", params, stats, ["conv1_1"])
    _downsample(sd, "downsample1_2", params, stats, ["down1_2"])
    _convblock_v3(sd, "ConvBlock1_2.0", params, stats, ["conv1_2"])
    _downsample(sd, "downsample2", params, stats, ["down2"])
    _convblock_v3(sd, "ConvBlock2_1.0", params, stats, ["conv2_1"])
    _convblock_v3(sd, "ConvBlock2_2.0", params, stats, ["conv2_2"])
    _downsample(sd, "downsample3", params, stats, ["down3"])
    for i in range(depths_stage3):
        _block_v3(sd, f"block3.{i}", params, stats, [f"block3_{i}"], mae=mae)
    if not mae:
        # the MAE variant keeps stage 4 at embed_dim[2] with no extra
        # downsample (sdtv3MAE.py:649-666)
        _downsample(sd, "downsample4", params, stats, ["down4"])
    for i in range(depths_stage4):
        _block_v3(sd, f"block4.{i}", params, stats, [f"block4_{i}"], mae=mae)
    return {"params": params, "batch_stats": stats}
