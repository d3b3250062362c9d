"""Pinned reference state_dict key manifest for the flagship configs.

This is a THIRD, independent transcription of the reference checkpoint
format — written by enumerating the reference module definitions directly
(file:line cited per section), separate from both the torch golden
(tests/torch_golden.py) and the converter (engine/convert*.py).  The tests
in test_manifest.py assert:
  (a) the golden's state_dict == this manifest (keys AND shapes), and
  (b) the converter consumes exactly this key set,
which kills the "golden and converter drift together" failure mode: a
transcription error would now have to be made identically in three
independently-written places.

Flagship config: SDTv2_maskformer_DCNpixelDecoder_ade20k.py —
backbone embed_dim [64,128,256,360], heads 8, depths (6,2);
head in_channels [32,64,128,360], feat=out=256, 100 queries,
6 encoder layers (group 32, dw_kernel 5, ffn 1024),
6 decoder layers (ffn 2048), 150 classes.
"""
from __future__ import annotations


def _bn(m, key, c):
    """nn.BatchNorm1d/2d with affine + track_running_stats (defaults)."""
    m[f"{key}.weight"] = (c,)
    m[f"{key}.bias"] = (c,)
    m[f"{key}.running_mean"] = (c,)
    m[f"{key}.running_var"] = (c,)
    m[f"{key}.num_batches_tracked"] = ()


def _conv2d(m, key, cout, cin, kh, kw, bias=True, groups=1):
    m[f"{key}.weight"] = (cout, cin // groups, kh, kw)
    if bias:
        m[f"{key}.bias"] = (cout,)


def _conv1d(m, key, cout, cin, bias=True):
    m[f"{key}.weight"] = (cout, cin, 1)
    if bias:
        m[f"{key}.bias"] = (cout,)


def _linear(m, key, cout, cin, bias=True):
    m[f"{key}.weight"] = (cout, cin)
    if bias:
        m[f"{key}.bias"] = (cout,)


# --------------------------------------------------------------------------
# Backbone: Spiking_vit_MetaFormer (sdtv2.py:424-655)
# --------------------------------------------------------------------------

def _sdtv2_sepconv(m, pfx, dim, e=2, k=7):
    """SepConv (sdtv2.py:135-180): pwconv1/dwconv/pwconv2 all bias=False,
    bn1 after pwconv1, bn2 after pwconv2, NO BN after dwconv."""
    med = e * dim
    _conv2d(m, f"{pfx}.pwconv1", med, dim, 1, 1, bias=False)
    _bn(m, f"{pfx}.bn1", med)
    _conv2d(m, f"{pfx}.dwconv", med, med, k, k, bias=False, groups=med)
    _conv2d(m, f"{pfx}.pwconv2", dim, med, 1, 1, bias=False)
    _bn(m, f"{pfx}.bn2", dim)


def _sdtv2_convblock(m, pfx, dim, r=4):
    """MS_ConvBlock (sdtv2.py:183-219)."""
    _sdtv2_sepconv(m, f"{pfx}.Conv", dim)
    _conv2d(m, f"{pfx}.conv1", dim * r, dim, 3, 3, bias=False)
    _bn(m, f"{pfx}.bn1", dim * r)
    _conv2d(m, f"{pfx}.conv2", dim, dim * r, 3, 3, bias=False)
    _bn(m, f"{pfx}.bn2", dim)


def _repconv(m, pfx, c):
    """RepConv (sdtv2.py:112-132): body.0 1x1 (no bias), body.1 BNAndPad,
    body.2.{0 dw3x3, 1 pw1x1, 2 BN} (no biases)."""
    _conv2d(m, f"{pfx}.body.0", c, c, 1, 1, bias=False)
    _bn(m, f"{pfx}.body.1.bn", c)
    _conv2d(m, f"{pfx}.body.2.0", c, c, 3, 3, bias=False, groups=c)
    _conv2d(m, f"{pfx}.body.2.1", c, c, 1, 1, bias=False)
    _bn(m, f"{pfx}.body.2.2", c)


def _sdtv2_block(m, pfx, dim, r=4):
    """MS_Block (sdtv2.py:347-383): attn (MS_Attention_RepConv_qkv_id,
    :258-344 — q/k/v/proj RepConv + BN) + mlp (MS_MLP, :222-255 —
    Conv1d k=1 with default bias + BN1d)."""
    for n in ("q", "k", "v", "proj"):
        _repconv(m, f"{pfx}.attn.{n}_conv.0", dim)
        _bn(m, f"{pfx}.attn.{n}_conv.1", dim)
    _conv1d(m, f"{pfx}.mlp.fc1_conv", dim * r, dim)
    _bn(m, f"{pfx}.mlp.fc1_bn", dim * r)
    _conv1d(m, f"{pfx}.mlp.fc2_conv", dim, dim * r)
    _bn(m, f"{pfx}.mlp.fc2_bn", dim)


def _downsample(m, pfx, cin, cout, k):
    """MS_DownSampling (sdtv2.py:386-421): Conv2d with DEFAULT bias."""
    _conv2d(m, f"{pfx}.encode_conv", cout, cin, k, k, bias=True)
    _bn(m, f"{pfx}.encode_bn", cout)


def sdtv2_backbone_manifest(embed=(64, 128, 256, 360), depths=(6, 2),
                            pfx="backbone."):
    m: dict = {}
    e = embed
    _downsample(m, f"{pfx}downsample1_1", 3, e[0] // 2, 7)
    _sdtv2_convblock(m, f"{pfx}ConvBlock1_1.0", e[0] // 2)
    _downsample(m, f"{pfx}downsample1_2", e[0] // 2, e[0], 3)
    _sdtv2_convblock(m, f"{pfx}ConvBlock1_2.0", e[0])
    _downsample(m, f"{pfx}downsample2", e[0], e[1], 3)
    _sdtv2_convblock(m, f"{pfx}ConvBlock2_1.0", e[1])
    _sdtv2_convblock(m, f"{pfx}ConvBlock2_2.0", e[1])
    _downsample(m, f"{pfx}downsample3", e[1], e[2], 3)
    for i in range(depths[0]):
        _sdtv2_block(m, f"{pfx}block3.{i}", e[2])
    _downsample(m, f"{pfx}downsample4", e[2], e[3], 3)
    for i in range(depths[1]):
        _sdtv2_block(m, f"{pfx}block4.{i}", e[3])
    return m


# --------------------------------------------------------------------------
# Backbone: Spiking_vit_MetaFormerv2 / E-SpikeFormer (sdtv3.py:401-616)
# --------------------------------------------------------------------------

def _sdtv3_sepconv(m, pfx, dim, e=2, k=7):
    """SepConv_Spike (sdtv3.py:99-150): Sequential(conv, BN) triplets —
    pwconv1.{0,1}, dwconv.{0,1}, pwconv2.{0,1}; convs bias=False."""
    med = e * dim
    _conv2d(m, f"{pfx}.pwconv1.0", med, dim, 1, 1, bias=False)
    _bn(m, f"{pfx}.pwconv1.1", med)
    _conv2d(m, f"{pfx}.dwconv.0", med, med, k, k, bias=False, groups=med)
    _bn(m, f"{pfx}.dwconv.1", med)
    _conv2d(m, f"{pfx}.pwconv2.0", dim, med, 1, 1, bias=False)
    _bn(m, f"{pfx}.pwconv2.1", dim)


def _sdtv3_convblock(m, pfx, dim, r=4):
    """MS_ConvBlock_spike_SepConv (sdtv3.py:153-189)."""
    _sdtv3_sepconv(m, f"{pfx}.Conv", dim)
    _conv2d(m, f"{pfx}.conv1", dim * r, dim, 3, 3, bias=False)
    _bn(m, f"{pfx}.bn1", dim * r)
    _conv2d(m, f"{pfx}.conv2", dim, dim * r, 3, 3, bias=False)
    _bn(m, f"{pfx}.bn2", dim)


def _sdtv3_block(m, pfx, dim, r=4, lamda=4, mae=False):
    """MS_Block_Spike_SepConv (sdtv3.py:321-360) / MS_Block_cswin
    (sdtv3MAE.py:439-483): conv (SepConv_Spike k=3), attn
    (MS_Attention_linear :228-318 — Sequential(Conv2d 1x1 bias=False, BN)),
    mlp (MS_MLP :192-225), + layer_scale1-3 for the MAE flavor."""
    cv = dim * lamda
    _sdtv3_sepconv(m, f"{pfx}.conv", dim, k=3)
    _conv2d(m, f"{pfx}.attn.q_conv.0", dim, dim, 1, 1, bias=False)
    _bn(m, f"{pfx}.attn.q_conv.1", dim)
    _conv2d(m, f"{pfx}.attn.k_conv.0", dim, dim, 1, 1, bias=False)
    _bn(m, f"{pfx}.attn.k_conv.1", dim)
    _conv2d(m, f"{pfx}.attn.v_conv.0", cv, dim, 1, 1, bias=False)
    _bn(m, f"{pfx}.attn.v_conv.1", cv)
    _conv2d(m, f"{pfx}.attn.proj_conv.0", dim, cv, 1, 1, bias=False)
    _bn(m, f"{pfx}.attn.proj_conv.1", dim)
    _conv1d(m, f"{pfx}.mlp.fc1_conv", dim * r, dim)
    _bn(m, f"{pfx}.mlp.fc1_bn", dim * r)
    _conv1d(m, f"{pfx}.mlp.fc2_conv", dim, dim * r)
    _bn(m, f"{pfx}.mlp.fc2_bn", dim)
    if mae:
        for g in ("layer_scale1", "layer_scale2", "layer_scale3"):
            m[f"{pfx}.{g}"] = (dim,)


def sdtv3_backbone_manifest(embed=(64, 128, 256, 360), depths=(6, 2),
                            pfx="backbone.", mae=False):
    m: dict = {}
    e = embed
    _downsample(m, f"{pfx}downsample1_1", 3, e[0] // 2, 7)
    _sdtv3_convblock(m, f"{pfx}ConvBlock1_1.0", e[0] // 2)
    _downsample(m, f"{pfx}downsample1_2", e[0] // 2, e[0], 3)
    _sdtv3_convblock(m, f"{pfx}ConvBlock1_2.0", e[0])
    _downsample(m, f"{pfx}downsample2", e[0], e[1], 3)
    _sdtv3_convblock(m, f"{pfx}ConvBlock2_1.0", e[1])
    _sdtv3_convblock(m, f"{pfx}ConvBlock2_2.0", e[1])
    _downsample(m, f"{pfx}downsample3", e[1], e[2], 3)
    for i in range(depths[0]):
        _sdtv3_block(m, f"{pfx}block3.{i}", e[2], mae=mae)
    if mae:
        # Spiking_vit_MetaFormerv3 has NO downsample4; stage 4 stays at
        # embed_dim[2] (sdtv3MAE.py:620-666)
        for i in range(depths[1]):
            _sdtv3_block(m, f"{pfx}block4.{i}", e[2], mae=True)
    else:
        _downsample(m, f"{pfx}downsample4", e[2], e[3], 3)
        for i in range(depths[1]):
            _sdtv3_block(m, f"{pfx}block4.{i}", e[3])
    return m


# --------------------------------------------------------------------------
# Head: MaskFormerHead (maskformer_head.py:68-168)
# --------------------------------------------------------------------------

def _head_sepconv_spike(m, pfx, dim, e=2, k=7):
    """mmcv_spike SNN_core.py:11-65 SepConv_Spike — same Sequential layout
    as sdtv3's."""
    _sdtv3_sepconv(m, pfx, dim, e=e, k=k)


def _dcnv3(m, pfx, c, group, dwk=5, e=2):
    """DCNv3_pytorch (ops_dcnv3/modules/dcnv3.py:96-199): dw_conv grouped
    (bias=False)+BN; offset/mask 1x1 with DEFAULT bias +BN; input/output
    proj SepConv_Spike(expansion 2, kernel dw_kernel_size)."""
    k = 3  # sampling kernel_size (detr_layers.py:315)
    _conv2d(m, f"{pfx}.dw_conv.0", c, c, dwk, dwk, bias=False, groups=c)
    _bn(m, f"{pfx}.dw_conv.1", c)
    _conv2d(m, f"{pfx}.offset.0", group * k * k * 2, c, 1, 1, bias=True)
    _bn(m, f"{pfx}.offset.1", group * k * k * 2)
    _conv2d(m, f"{pfx}.mask.0", group * k * k, c, 1, 1, bias=True)
    _bn(m, f"{pfx}.mask.1", group * k * k)
    _head_sepconv_spike(m, f"{pfx}.input_proj", c, e=e, k=dwk)
    _head_sepconv_spike(m, f"{pfx}.output_proj", c, e=e, k=dwk)


def _dcn_encoder_layer(m, pfx, c, ffn, group, dwk=5):
    """DCNDetrTransformerEncoderLayer (detr_layers.py:263-339): Conv
    (SepConv_Spike e=2 k=3), dcn, ffn (MS_MLP transformer.py:784-831 —
    fc{1,2}_conv Conv1d default-bias + fc{1,2}_bn), gamma1-3."""
    _head_sepconv_spike(m, f"{pfx}.Conv", c, e=2, k=3)
    _dcnv3(m, f"{pfx}.dcn", c, group, dwk=dwk)
    _conv1d(m, f"{pfx}.ffn.fc1_conv", ffn, c)
    _bn(m, f"{pfx}.ffn.fc1_bn", ffn)
    _conv1d(m, f"{pfx}.ffn.fc2_conv", c, ffn)
    _bn(m, f"{pfx}.ffn.fc2_bn", c)
    for g in ("gamma1", "gamma2", "gamma3"):
        m[f"{pfx}.{g}"] = (c,)


def _spike_mha(m, pfx, c):
    """MultiHeadAttentionBlock / CrossMultiHeadAttentionBlock
    (mmcv_spike/transformer.py:196-361): q/k/v/out Sequential(Conv1d k=1
    default-bias, BN1d)."""
    for n in ("q", "k", "v", "out"):
        _conv1d(m, f"{pfx}.{n}_conv.0", c, c)
        _bn(m, f"{pfx}.{n}_conv.1", c)


def _decoder_layer(m, pfx, c, ffn):
    """DetrTransformerDecoderLayer (detr_layers.py:417-490, layer_scale
    None): self_attn/cross_attn wrappers each own ``.attn``
    (transformer.py:505-560); ffn = MSDA_FFN (:710-781 — fc1/bn1/fc2/bn2,
    Conv1d default bias)."""
    _spike_mha(m, f"{pfx}.self_attn.attn", c)
    _spike_mha(m, f"{pfx}.cross_attn.attn", c)
    _conv1d(m, f"{pfx}.ffn.fc1", ffn, c)
    _bn(m, f"{pfx}.ffn.bn1", ffn)
    _conv1d(m, f"{pfx}.ffn.fc2", c, ffn)
    _bn(m, f"{pfx}.ffn.bn2", c)


def head_manifest(in_channels=(32, 64, 128, 360), feat=256, out=256,
                  num_classes=150, num_queries=100, enc_layers=6,
                  dec_layers=6, enc_ffn=1024, dec_ffn=2048, group=32,
                  dwk=5, pfx="decode_head."):
    m: dict = {}
    p = f"{pfx}pixel_decoder"
    n = len(in_channels)
    # DCNTransformerEncoderPixelDecoder (pixel_decoder.py:316-407):
    # lateral 1x1 DEFAULT bias + BN; output 3x3 grouped bias=False + BN;
    # mask_feature 1x1 with bias (no BN); in/out proj 1x1 default bias + BN.
    for i in range(n - 1):
        _conv2d(m, f"{p}.lateral_convs.{i}.0", feat, in_channels[i], 1, 1,
                bias=True)
        _bn(m, f"{p}.lateral_convs.{i}.1", feat)
        _conv2d(m, f"{p}.output_convs.{i}.0", feat, feat, 3, 3, bias=False,
                groups=feat)
        _bn(m, f"{p}.output_convs.{i}.1", feat)
    _conv2d(m, f"{p}.mask_feature", out, feat, 1, 1, bias=True)
    _conv2d(m, f"{p}.encoder_in_proj.0", feat, in_channels[-1], 1, 1,
            bias=True)
    _bn(m, f"{p}.encoder_in_proj.1", feat)
    _conv2d(m, f"{p}.encoder_out_proj.0", feat, feat, 1, 1, bias=True)
    _bn(m, f"{p}.encoder_out_proj.1", feat)
    for i in range(enc_layers):
        _dcn_encoder_layer(m, f"{p}.encoder.layers.{i}", feat, enc_ffn,
                           group, dwk=dwk)
    for i in range(dec_layers):
        _decoder_layer(m, f"{pfx}transformer_decoder.layers.{i}", feat,
                       dec_ffn)
    # embeddings + SDME output block (maskformer_head.py:133-160);
    # decoder_input_projs are nn.Identity (decoder dims == feat_channels)
    m[f"{pfx}query_embed.weight"] = (num_queries, out)
    m[f"{pfx}query_feat.weight"] = (num_queries, out)
    m[f"{pfx}level_embed.weight"] = (3, feat)
    _linear(m, f"{pfx}cls_embed", num_classes + 1, feat)
    # MLP (SNN_core.py:95-123): fc1/fc2 bias=False, fc_out with bias
    _linear(m, f"{pfx}mask_embed.fc1", feat, feat, bias=False)
    _linear(m, f"{pfx}mask_embed.fc2", feat, feat, bias=False)
    _linear(m, f"{pfx}mask_embed.fc_out", out, feat)
    m[f"{pfx}w"] = (1,)
    _conv1d(m, f"{pfx}shortcut_conv.0", num_queries, num_queries, bias=False)
    _bn(m, f"{pfx}shortcut_conv.1", num_queries)
    return m


def flagship_manifest(variant="sdtv2"):
    """Full backbone.* + decode_head.* key manifest for the flagship ADE20K
    config (SDTv2_maskformer_DCNpixelDecoder_ade20k.py /
    SDTv3_b_Spike2former_ade20k_512x512.py)."""
    if variant == "sdtv2":
        m = sdtv2_backbone_manifest()
    else:
        m = sdtv3_backbone_manifest(mae=variant == "sdtv3mae")
    m.update(head_manifest())
    return m
