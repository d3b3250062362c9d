"""Config system: dataclass presets mirroring the reference's shipped
configs (configs/Spike2Former/*.py, configs/FPN/*.py) with dot-key
overrides (the ``--cfg-options`` equivalent).

The mmengine registry/Config machinery is intentionally replaced by plain
dataclasses — models are built directly, overrides are ``key.subkey=value``
strings, and every preset cites the reference config it reproduces.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Any

import jax.numpy as jnp


@dataclass
class ModelConfig:
    kind: str = "maskformer"          # 'maskformer' | 'fpn' | 'cascade'
    num_stages: int = 2               # cascade only
    variant: str = "sdtv2"            # backbone: 'sdtv2' | 'sdtv3'
    num_classes: int = 150
    num_things: int = 0               # panoptic: thing classes (rest stuff)
    embed_dim: tuple = (64, 128, 256, 360)
    backbone_heads: int = 8
    T: int = 1
    feat_channels: int = 256
    num_queries: int = 100
    num_decoder_layers: int = 6
    num_encoder_layers: int = 6
    depths_stage3: int = 6
    depths_stage4: int = 2
    dcn_group: int = 32
    neck_channels: int = 256          # fpn only
    head_channels: int = 128          # fpn only
    neuron: str = "lif"               # fpn only
    compat: bool = False              # reference-exact layout quirks
    norm_eval: bool = True            # freeze backbone BN in training
    collapse_t: bool = True           # skip provably-identical time steps
    masked_attention: bool = False    # Mask2Former masked cross-attention
    decoder: str = "detr"             # 'detr' | 'dab' (DAB-DETR anchors)
    eval_last_only: bool = True       # False = literal all-layers eval
    remat: bool = False               # checkpoint backbone/DCN blocks
    lazy_masks: bool = True           # factored train-time mask logits
    dtype: str = "float32"


@dataclass
class DataConfig:
    dataset: str = "ade20k"
    data_root: str = "data/ade/ADEChallengeData2016"
    crop_size: tuple = (512, 512)
    batch_size: int = 6
    num_workers: int = 8
    test_scale: tuple = (2048, 512)
    size_divisor: int = 32
    # MultiImageMixDataset-style mosaic mixing probability (0 = off; the
    # reference's RandomMosaic configs use 0.5) — data/loader.py
    mosaic_prob: float = 0.0
    # decode-once RAM cache of the raw dataset (SegDataset.cache) — for
    # few-core hosts where image decode out-costs the TPU step
    cache: bool = False


@dataclass
class TrainConfig:
    base_lr: float = 1e-3
    # mmengine auto_scale_lr (ade20k config :212): when enabled, base_lr
    # is scaled linearly by global_batch / auto_scale_lr_base_batch
    auto_scale_lr: bool = False
    auto_scale_lr_base_batch: int = 48
    weight_decay: float = 0.005
    backbone_lr_mult: float = 0.1
    clip_norm: float = 0.01
    warmup_iters: int = 1500
    total_iters: int = 160_000
    val_interval: int = 2500
    checkpoint_interval: int = 10_000
    max_keep_ckpts: int = 0           # >0: retain newest N (mmengine knob)
    max_gt: int = 64
    # EXACT loss fast path: run matching/losses with the GT axis truncated
    # to this many slots, lax.cond-ing into full max_gt width on overflow
    # (see losses.criterion.maskformer_loss).  0 disables.
    compact_gt: int = 32
    matcher: str = "auction"          # 'auction' (on-device) | 'host' (scipy)
    # Mask-loss resolution: 'gt' upsamples mask logits to GT resolution
    # before CE/dice/focal — the reference recipe exactly
    # (maskformer_head.py:475-494).  'pred' computes losses at prediction
    # resolution (downsampled GT): ~4x cheaper mask losses, quantified at
    # <=18% loss delta / grad cosine >0.9 (test_loss_at_pred_vs_gt_
    # equivalence) — the documented fast path, NOT the default.
    loss_at: str = "gt"
    accum_steps: int = 1              # grad accumulation (global batch 48)
    # Point-sampled matching/mask losses (the Mask2Former training
    # ingredient, mmdet/models/utils/point_sample.py +
    # mask2former_track_head.py:300-436).  0 = off (exact loss_at path);
    # 12544 = the upstream Mask2Former recipe.  GT-fidelity supervision at
    # ~num_points/(512^2) of the exact path's mask-loss cost.
    loss_points: int = 0
    loss_points_oversample: float = 3.0
    loss_points_importance: float = 0.75
    # Contraction dtype of the gradient-carrying point sampler (the
    # dominant MXU cost of the point path).  'float32' = mmcv-exact
    # bilinear; 'bfloat16' = the measured-speed knob for bf16 models.
    loss_points_dtype: str = "float32"
    # Fully unroll the per-decoder-layer loss/cost scans (criterion
    # maskformer_loss): removes the TPU while-loop tuple plumbing that
    # carries the LazyMasks feats through every layer iteration, at the
    # price of L=7 copies of the loss body in the compiled program.
    unroll_loss: bool = False
    # Save Spike→Conv activations for backward as packed 4-bit codes
    # instead of bf16/f32 (ops/spike_op.py — the reference spike_op.py's
    # compact spike caching).  Bit-identical gradients; cuts BPTT
    # activation memory at those sites 4-8x.
    packed_residuals: bool = False
    layer_decay_rate: float = 0.0     # >0: backbone layer-wise lr decay
    loss_decode: tuple = (("ce", 1.0),)  # fpn family: pixel-loss spec
    seed: int = 0


@dataclass
class TestConfig:
    mode: str = "whole"               # 'whole' | 'slide'
    crop_size: tuple = (512, 512)
    stride: tuple = (341, 341)
    bucket: int = 128                 # eval shape bucketing (0 = exact+pad32)


@dataclass
class Config:
    name: str = "custom"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    work_dir: str = "work_dirs"


def build_model(cfg: ModelConfig):
    from ..models.fpn import FPNSegmentor
    from ..models.segmentor import Spike2Former

    dtype = getattr(jnp, cfg.dtype)
    if cfg.kind == "cascade":
        from ..models.cascade import CascadeSegmentor

        return CascadeSegmentor(
            num_classes=cfg.num_classes, num_stages=cfg.num_stages,
            embed_dim=tuple(cfg.embed_dim),
            backbone_heads=cfg.backbone_heads, T=cfg.T, variant=cfg.variant,
            neck_channels=cfg.neck_channels, head_channels=cfg.head_channels,
            neuron=cfg.neuron, depths_stage3=cfg.depths_stage3,
            depths_stage4=cfg.depths_stage4, dtype=dtype)
    if cfg.kind == "fpn":
        return FPNSegmentor(
            num_classes=cfg.num_classes, embed_dim=tuple(cfg.embed_dim),
            backbone_heads=cfg.backbone_heads, T=cfg.T, variant=cfg.variant,
            neck_channels=cfg.neck_channels, head_channels=cfg.head_channels,
            neuron=cfg.neuron, depths_stage3=cfg.depths_stage3,
            depths_stage4=cfg.depths_stage4, dtype=dtype)
    return Spike2Former(
        num_classes=cfg.num_classes, embed_dim=tuple(cfg.embed_dim),
        backbone_heads=cfg.backbone_heads, T=cfg.T, variant=cfg.variant,
        feat_channels=cfg.feat_channels, num_queries=cfg.num_queries,
        num_decoder_layers=cfg.num_decoder_layers,
        num_encoder_layers=cfg.num_encoder_layers,
        depths_stage3=cfg.depths_stage3, depths_stage4=cfg.depths_stage4,
        dcn_group=cfg.dcn_group, compat=cfg.compat,
        norm_eval=cfg.norm_eval, collapse_t=cfg.collapse_t,
        masked_attention=cfg.masked_attention, decoder=cfg.decoder,
        eval_last_only=cfg.eval_last_only, remat=cfg.remat,
        lazy_masks=cfg.lazy_masks, dtype=dtype)


def apply_overrides(cfg: Config, options: list[str]) -> Config:
    """--cfg-options style dot-key overrides: 'model.T=4'."""
    import ast

    for opt in options:
        key, _, raw = opt.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        parts = key.split(".")
        target = cfg
        for p in parts[:-1]:
            target = getattr(target, p)
        # reject unknown keys: a typo'd knob silently measuring/training
        # the default config is worse than an error (model.remat once
        # landed on a field nothing read)
        if not hasattr(target, parts[-1]):
            raise AttributeError(
                f"unknown config key {key!r} ({type(target).__name__} "
                f"has no field {parts[-1]!r})")
        setattr(target, parts[-1], value)
    return cfg


# ---------------------------------------------------------------------------
# Presets — one per shipped reference config.
# ---------------------------------------------------------------------------

def _ade_spike2former_sdtv2() -> Config:
    """SDTv2_maskformer_DCNpixelDecoder_ade20k.py — the flagship."""
    return Config(
        name="SDTv2_maskformer_DCNpixelDecoder_ade20k",
        model=ModelConfig(T=1, num_classes=150),
        data=DataConfig(dataset="ade20k", batch_size=6),
        test=TestConfig(mode="whole"),
    )


def _cityscapes_spike2former_sdtv2() -> Config:
    """SDTv2_maskformer_DCNPixelDecoder_CityScapes.py — 512x1024 crops,
    whole-mode eval with pad-to-divisor (or slide for 1024x1024)."""
    return Config(
        name="SDTv2_maskformer_DCNPixelDecoder_CityScapes",
        model=ModelConfig(T=1, num_classes=19),
        data=DataConfig(dataset="cityscapes", crop_size=(512, 1024),
                        data_root="data/cityscapes",
                        test_scale=(2048, 1024), batch_size=2),
        test=TestConfig(mode="whole"),
    )


def _voc_spike2former_sdtv2() -> Config:
    """SDTv2_Spike2former_voc_512x512.py."""
    return Config(
        name="SDTv2_Spike2former_voc_512x512",
        model=ModelConfig(T=1, num_classes=21),
        data=DataConfig(dataset="voc2012", data_root="data/VOCdevkit/VOC2012",
                        test_scale=(2048, 512)),
    )


def _cocostuff_spike2former_sdtv2(k: str) -> Config:
    """SDTv2_maskformer_cocostuff{10k,164k}_512x512.py."""
    return Config(
        name=f"SDTv2_maskformer_cocostuff{k}_512x512",
        model=ModelConfig(T=1, num_classes=171),
        data=DataConfig(dataset="coco_stuff164k",
                        data_root="data/coco_stuff164k"),
    )


def _ade_spike2former_sdtv3() -> Config:
    """SDTv3_b_Spike2former_ade20k_512x512.py — E-SpikeFormer backbone."""
    return Config(
        name="SDTv3_b_Spike2former_ade20k_512x512",
        model=ModelConfig(variant="sdtv3", T=4, num_classes=150),
        data=DataConfig(dataset="ade20k"),
    )


def _voc_spike2former_sdtv3() -> Config:
    return Config(
        name="SDTv3_b_Spike2former_voc_512x512",
        model=ModelConfig(variant="sdtv3", T=4, num_classes=21),
        data=DataConfig(dataset="voc2012",
                        data_root="data/VOCdevkit/VOC2012"),
    )


def _cityscapes_spike2former_sdtv3() -> Config:
    return Config(
        name="SDTv3_b_Spike2former_Cityscapes_512x1024",
        model=ModelConfig(variant="sdtv3", T=4, num_classes=19),
        data=DataConfig(dataset="cityscapes", crop_size=(512, 1024),
                        data_root="data/cityscapes",
                        test_scale=(2048, 1024), batch_size=2),
    )


def _ade_spike2former_sdtv3mae() -> Config:
    """Spiking_vit_MetaFormerv3 (sdtv3MAE.py) backbone — registered in the
    reference but shipped without its own config; exposed here so the MAE
    flavor is runnable (CSWin striped attention, multispike8, no stage-4
    downsample)."""
    return Config(
        name="SDTv3MAE_Spike2former_ade20k_512x512",
        model=ModelConfig(variant="sdtv3mae", T=4, num_classes=150),
        data=DataConfig(dataset="ade20k"),
    )


def _fpn_sdtv3(size: str) -> Config:
    """fpn_sdtv3_512x512_{10M,19M}_ade20k.py — FPN family."""
    dims = (32, 64, 128, 192) if size == "10M" else (48, 96, 192, 256)
    return Config(
        name=f"fpn_sdtv3_512x512_{size}_ade20k",
        model=ModelConfig(kind="fpn", variant="sdtv3", T=4, num_classes=150,
                          embed_dim=dims, neuron="multispike"),
        data=DataConfig(dataset="ade20k"),
    )



def _coco_panoptic_spike2former() -> Config:
    """COCO panoptic via the mmdet-side mask-classification head
    (BASELINE.json configs[3]): 133 classes (80 things + 53 stuff).
    Training consumes real panoptic JSON+PNG annotations
    (data.panoptic.PanopticDataset); eval is PQ through
    panoptic_inference (tools/test.py selects both from the dataset
    name)."""
    return Config(
        name="SDTv2_maskformer_coco_panoptic",
        model=ModelConfig(T=1, num_classes=133, num_things=80),
        data=DataConfig(dataset="coco_panoptic", data_root="data/coco"),
    )


def _fpn_msresnet(depth: str) -> Config:
    """MS-ResNet spiking backbone (mmseg/models/backbones/MSResnet.py,
    present upstream but unexported) under the FPN family — strides
    4/8/16/32, width = embed_dim[0]."""
    return Config(
        name=f"fpn_msresnet{depth}_512x512_ade20k",
        model=ModelConfig(kind="fpn", variant=f"msresnet{depth}", T=1,
                          num_classes=150, embed_dim=(64, 128, 256, 512),
                          neuron="lif"),
        data=DataConfig(dataset="ade20k"),
    )


def _cascade_fpn_sdtv2() -> Config:
    """CascadeEncoderDecoder (cascade_encoder_decoder.py) over the FPN
    family: stage-0 FPNHead + refinement stages.  The reference registers
    the segmentor without shipping a config; this preset makes the cascade
    path runnable end to end."""
    return Config(
        name="cascade_fpn_sdtv2_512x512_ade20k",
        model=ModelConfig(kind="cascade", num_stages=2, T=4,
                          num_classes=150, neuron="lif"),
        data=DataConfig(dataset="ade20k"),
    )


PRESETS: dict[str, Any] = {
    "cascade_fpn_sdtv2_512x512_ade20k": _cascade_fpn_sdtv2,
    "fpn_msresnet18_512x512_ade20k": lambda: _fpn_msresnet("18"),
    "fpn_msresnet34_512x512_ade20k": lambda: _fpn_msresnet("34"),
    "fpn_msresnet104_512x512_ade20k": lambda: _fpn_msresnet("104"),
    "SDTv2_maskformer_DCNpixelDecoder_ade20k": _ade_spike2former_sdtv2,
    "SDTv2_maskformer_DCNPixelDecoder_CityScapes":
        _cityscapes_spike2former_sdtv2,
    "SDTv2_Spike2former_voc_512x512": _voc_spike2former_sdtv2,
    "SDTv2_maskformer_cocostuff10k_512x512":
        lambda: _cocostuff_spike2former_sdtv2("10k"),
    "SDTv2_maskformer_cocostuff164k_512x512":
        lambda: _cocostuff_spike2former_sdtv2("164k"),
    "SDTv3_b_Spike2former_ade20k_512x512": _ade_spike2former_sdtv3,
    "SDTv3_b_Spike2former_voc_512x512": _voc_spike2former_sdtv3,
    "SDTv3_b_Spike2former_Cityscapes_512x1024":
        _cityscapes_spike2former_sdtv3,
    "SDTv2_maskformer_coco_panoptic": _coco_panoptic_spike2former,
    "SDTv3MAE_Spike2former_ade20k_512x512": _ade_spike2former_sdtv3mae,
    "fpn_sdtv3_512x512_10M_ade20k": lambda: _fpn_sdtv3("10M"),
    "fpn_sdtv3_512x512_19M_ade20k": lambda: _fpn_sdtv3("19M"),
}


def get_config(name: str, overrides: list[str] | None = None) -> Config:
    cfg = PRESETS[name]()
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg
