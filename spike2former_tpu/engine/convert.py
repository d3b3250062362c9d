"""Full-model torch→flax checkpoint converter for Spike2Former.

Extends the backbone converter (``convert_sdtv2.py``) to the whole model:
the DCN pixel decoder (mmdet/models/layers/pixel_decoder.py:316-472 —
note the *reversed* lateral indexing, :455-466), the DCNv3 blocks
(ops_dcnv3/modules/dcnv3.py:96-233), the spiking DETR decoder layers
(mmcv_spike/transformer.py:196-361 — Conv1d q/k/v + BN), and the head/SDME
parameters (mmdet/models/dense_heads/maskformer_head.py:133-155: query/level
embeds, cls_embed, 3-layer mask_embed MLP, shortcut conv, ``w``).

Checkpoints converted here must be run with ``Spike2Former(compat=True)``:
the reference computes through fixed layout reinterpretations (MSDA_FFN
reshape shuffle transformer.py:777-781; MS_MLP output reshape :831; DCNv3
offset/mask reshape dcnv3.py:213-215) that the trained weights encode.
"""
from __future__ import annotations

from typing import Any

import numpy as np

from .checkpoint import convert_torch_linear
from .convert_sdtv2 import (
    _bn, _conv, _convbn, _set, convert_sdtv2_backbone)


def _conv1d(sd, key, params, path):
    """torch Conv1d weight [O, I, 1] → flax kernel [1, I, O]."""
    w = np.asarray(sd[key + ".weight"])
    _set(params, path + ["kernel"], np.transpose(w, (2, 1, 0)))
    if key + ".bias" in sd:
        _set(params, path + ["bias"], np.asarray(sd[key + ".bias"]))


def _dense(sd, key, params, path):
    _set(params, path + ["kernel"],
         convert_torch_linear(np.asarray(sd[key + ".weight"])))
    if key + ".bias" in sd:
        _set(params, path + ["bias"], np.asarray(sd[key + ".bias"]))


def _sepconv_spike(sd, pfx, params, stats, path):
    """SepConv_Spike (SNN_core.py:11-63): pwconv1.{0 conv,1 bn},
    dwconv.{0,1}, pwconv2.{0,1} → flax SepConv(dw_bn=True)."""
    _convbn(sd, f"{pfx}.pwconv1.0", f"{pfx}.pwconv1.1", params, stats,
            path + ["ConvBN_0"])
    _conv(sd, f"{pfx}.dwconv.0", params, path + ["Conv_0"])
    _bn(sd, f"{pfx}.dwconv.1", params, stats, path + ["BatchNorm_0"])
    _convbn(sd, f"{pfx}.pwconv2.0", f"{pfx}.pwconv2.1", params, stats,
            path + ["ConvBN_1"])


def _token_convbn(sd, pfx, params, stats, path):
    """Conv1d(k=1)+BatchNorm1d pair (``q_conv``-style nn.Sequential)."""
    _conv1d(sd, f"{pfx}.0", params, path + ["Conv_0"])
    _bn(sd, f"{pfx}.1", params, stats, path + ["BatchNorm_0"])


def _spike_mha(sd, pfx, params, stats, path):
    """MultiHeadAttentionBlock / CrossMultiHeadAttentionBlock
    (transformer.py:196-361): q/k/v/out Conv1d+BN stacks."""
    for name in ("q", "k", "v"):
        _token_convbn(sd, f"{pfx}.{name}_conv", params, stats, path + [name])
    _token_convbn(sd, f"{pfx}.out_conv", params, stats, path)


def _msda_ffn(sd, pfx, params, stats, path, style: str):
    """MSDA_FFN (fc1/bn1/fc2/bn2, :760-766) or MS_MLP (fc1_conv/fc1_bn/...,
    :810-816) → flax MSDAFFN {Conv_0, BatchNorm_0, Conv_1, BatchNorm_1}."""
    if style == "msda":
        keys = ("fc1", "bn1", "fc2", "bn2")
    else:
        keys = ("fc1_conv", "fc1_bn", "fc2_conv", "fc2_bn")
    _conv1d(sd, f"{pfx}.{keys[0]}", params, path + ["Conv_0"])
    _bn(sd, f"{pfx}.{keys[1]}", params, stats, path + ["BatchNorm_0"])
    _conv1d(sd, f"{pfx}.{keys[2]}", params, path + ["Conv_1"])
    _bn(sd, f"{pfx}.{keys[3]}", params, stats, path + ["BatchNorm_1"])


def _dcnv3(sd, pfx, params, stats, path):
    """DCNv3_pytorch (modules/dcnv3.py:96-233)."""
    _conv(sd, f"{pfx}.dw_conv.0", params, path + ["dw_conv"])
    _bn(sd, f"{pfx}.dw_conv.1", params, stats, path + ["dw_bn"])
    _conv(sd, f"{pfx}.offset.0", params, path + ["offset_conv"])
    _bn(sd, f"{pfx}.offset.1", params, stats, path + ["offset_bn"])
    _conv(sd, f"{pfx}.mask.0", params, path + ["mask_conv"])
    _bn(sd, f"{pfx}.mask.1", params, stats, path + ["mask_bn"])
    _sepconv_spike(sd, f"{pfx}.input_proj", params, stats,
                   path + ["input_proj"])
    _sepconv_spike(sd, f"{pfx}.output_proj", params, stats,
                   path + ["output_proj"])


def _dcn_encoder_layer(sd, pfx, params, stats, path):
    """DCNDetrTransformerEncoderLayer (detr_layers.py:263-339)."""
    for g in ("gamma1", "gamma2", "gamma3"):
        _set(params, path + [g], np.asarray(sd[f"{pfx}.{g}"]))
    _sepconv_spike(sd, f"{pfx}.Conv", params, stats, path + ["conv"])
    _dcnv3(sd, f"{pfx}.dcn", params, stats, path + ["dcn"])
    _msda_ffn(sd, f"{pfx}.ffn", params, stats, path + ["ffn"], style="msmlp")


def convert_pixel_decoder(sd, params, stats, path, *, num_inputs: int = 4,
                          num_encoder_layers: int = 6,
                          pfx: str = "pixel_decoder"):
    """DCNTransformerEncoderPixelDecoder (pixel_decoder.py:316-472).

    The reference's forward walks its lateral/output ModuleLists from the
    HIGHEST index down (:455-466), while this framework enumerates top-down
    as 0..n — hence the reversed index mapping.
    """
    _convbn(sd, f"{pfx}.encoder_in_proj.0", f"{pfx}.encoder_in_proj.1",
            params, stats, path + ["encoder_in_proj"])
    _convbn(sd, f"{pfx}.encoder_out_proj.0", f"{pfx}.encoder_out_proj.1",
            params, stats, path + ["encoder_out_proj"])
    for j in range(num_inputs - 1):
        idx = num_inputs - 2 - j  # reversed (see docstring)
        _convbn(sd, f"{pfx}.lateral_convs.{j}.0",
                f"{pfx}.lateral_convs.{j}.1", params, stats,
                path + [f"lateral_{idx}"])
        _conv(sd, f"{pfx}.output_convs.{j}.0", params,
              path + [f"output_conv_{idx}"])
        _bn(sd, f"{pfx}.output_convs.{j}.1", params, stats,
            path + [f"output_bn_{idx}"])
    _conv(sd, f"{pfx}.mask_feature", params, path + ["mask_feature"])
    for i in range(num_encoder_layers):
        _dcn_encoder_layer(sd, f"{pfx}.encoder.layers.{i}", params, stats,
                           path + [f"encoder_{i}"])


def convert_maskformer_head(sd: dict[str, np.ndarray], *,
                            num_inputs: int = 4,
                            num_encoder_layers: int = 6,
                            num_decoder_layers: int = 6,
                            pfx: str = "decode_head.") -> dict[str, Any]:
    """decode_head.* keys → flax {'params', 'batch_stats'} for
    MaskFormerHead (mmdet maskformer_head.py:68-168)."""
    params: dict = {}
    stats: dict = {}
    sd = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}
    if not sd:
        raise KeyError(
            f"no '{pfx}*' keys found — this looks like a backbone-only "
            "checkpoint; use load_reference_backbone / convert_sdtv2_backbone "
            "for those")

    convert_pixel_decoder(sd, params, stats, ["pixel_decoder"],
                          num_inputs=num_inputs,
                          num_encoder_layers=num_encoder_layers)

    for i in range(num_decoder_layers):
        dpfx = f"transformer_decoder.layers.{i}"
        dpath = [f"decoder_{i}"]
        _spike_mha(sd, f"{dpfx}.self_attn.attn", params, stats,
                   dpath + ["self_attn"])
        _spike_mha(sd, f"{dpfx}.cross_attn.attn", params, stats,
                   dpath + ["cross_attn"])
        _msda_ffn(sd, f"{dpfx}.ffn", params, stats, dpath + ["ffn"],
                  style="msda")

    for emb in ("query_embed", "query_feat", "level_embed"):
        _set(params, [emb], np.asarray(sd[f"{emb}.weight"]))
    _dense(sd, "cls_embed", params, ["cls_embed"])
    _dense(sd, "mask_embed.fc1", params, ["mask_embed", "Dense_0"])
    _dense(sd, "mask_embed.fc2", params, ["mask_embed", "Dense_1"])
    _dense(sd, "mask_embed.fc_out", params, ["mask_embed", "Dense_2"])
    # Conv1d over the query axis, weight [nq, nq, 1] → [nq, nq]
    _set(params, ["shortcut_kernel"],
         np.asarray(sd["shortcut_conv.0.weight"])[:, :, 0])
    _bn(sd, "shortcut_conv.1", params, stats, ["shortcut_bn"])
    _set(params, ["w"], np.asarray(sd["w"]).reshape(1))
    return {"params": params, "batch_stats": stats}


def convert_spike2former(sd: dict[str, np.ndarray], *,
                         variant: str = "sdtv2",
                         depths_stage3: int = 6, depths_stage4: int = 2,
                         num_inputs: int = 4, num_encoder_layers: int = 6,
                         num_decoder_layers: int = 6) -> dict[str, Any]:
    """Full EncoderDecoder checkpoint (backbone.* + decode_head.*) →
    flax variables for ``Spike2Former(compat=True, variant=variant)``.

    ``variant`` selects the backbone key map: 'sdtv2'
    (Spiking_vit_MetaFormer, sdtv2.py:424-655), 'sdtv3'
    (Spiking_vit_MetaFormerv2 / E-SpikeFormer, sdtv3.py:401-616 — the
    published Cityscapes checkpoint family, tools/test.sh:7), or
    'sdtv3mae' (Spiking_vit_MetaFormerv3, sdtv3MAE.py:526-750).  The
    decode_head key layout is backbone-independent.
    """
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}
    if variant == "sdtv2":
        backbone = convert_sdtv2_backbone(bb_sd, depths_stage3, depths_stage4)
    elif variant in ("sdtv3", "sdtv3mae"):
        from .convert_sdtv3 import convert_sdtv3_backbone
        backbone = convert_sdtv3_backbone(
            bb_sd, depths_stage3, depths_stage4, mae=variant == "sdtv3mae")
    else:
        raise ValueError(f"unknown backbone variant {variant!r}")
    head = convert_maskformer_head(
        sd, num_inputs=num_inputs, num_encoder_layers=num_encoder_layers,
        num_decoder_layers=num_decoder_layers)
    return {
        "params": {"backbone": backbone["params"], "head": head["params"]},
        "batch_stats": {"backbone": backbone["batch_stats"],
                        "head": head["batch_stats"]},
    }
