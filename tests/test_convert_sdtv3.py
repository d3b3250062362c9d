"""SDTv3 / sdtv3MAE checkpoint conversion + full-model logit parity.

Round-3 item: the published reference checkpoint zoo includes v3-family
models (e.g. the Cityscapes 74.2 Multi-Spikenorm checkpoint,
reference tools/test.sh:7) — this harness proves those state_dicts load and
score through this framework at the same fidelity as the SDTv2 path:
synthetic reference-format state_dicts from an independently-written torch
golden (tests/torch_golden.py GoldenBackboneV3) are converted by
``engine/convert_sdtv3.py`` and must reproduce the torch logits end-to-end.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from spike2former_tpu.engine.convert import convert_spike2former
from spike2former_tpu.engine.convert_sdtv3 import convert_sdtv3_backbone
from spike2former_tpu.models import Spike2Former
from spike2former_tpu.models.sdtv2 import SpikingMetaFormer

from torch_golden import GoldenBackboneV3, GoldenSpike2Former, randomize_torch

CFG = dict(num_classes=5, embed_dim=(8, 16, 24, 32), backbone_heads=4,
           feat_channels=16, num_queries=4, num_decoder_layers=2,
           num_encoder_layers=2, depths_stage3=1, depths_stage4=1,
           dcn_group=4)


def _paths(tree):
    out = {}
    for p, x in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(str(getattr(k, "key", k)) for k in p)
        out[key] = np.asarray(x).shape
    return out


def _randomize_layer_scales(model, seed=0):
    """randomize_torch leaves bare nn.Parameters at init (1e-6) — bump the
    MAE layer-scale gammas so the residual branches actually contribute."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "layer_scale" in name:
                p.normal_(0, 0.5, generator=gen)


@pytest.mark.parametrize("mae", [False, True])
def test_backbone_roundtrip_tree_exact(mae):
    """Converter output must produce exactly the flax init tree: same paths,
    same shapes, nothing missing or extra."""
    variant = "sdtv3mae" if mae else "sdtv3"
    golden = GoldenBackboneV3(embed_dim=(8, 16, 24, 32), heads=4, T=1,
                              depths_stage3=2, depths_stage4=1, mae=mae)
    randomize_torch(golden, seed=7)
    sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}
    converted = convert_sdtv3_backbone(sd, depths_stage3=2, depths_stage4=1,
                                       mae=mae)

    model = SpikingMetaFormer(embed_dim=(8, 16, 24, 32), num_heads=4, T=1,
                              variant=variant, depths_stage3=2,
                              depths_stage4=1)
    init_vars = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    for col in ("params", "batch_stats"):
        want = _paths(init_vars[col])
        got = _paths(converted[col])
        assert set(got) == set(want), (
            f"{col}: missing={sorted(set(want) - set(got))[:5]} "
            f"extra={sorted(set(got) - set(want))[:5]}")
        for k in want:
            assert got[k] == want[k], f"{col}/{k}: {got[k]} vs {want[k]}"


@pytest.mark.parametrize("mae", [False, True])
@pytest.mark.parametrize("hw", [(32, 32), (64, 32)])
def test_backbone_logit_parity(mae, hw):
    """Same weights through torch golden and flax: every pyramid level must
    agree to atol 1e-3 (the VERDICT round-3 acceptance bar)."""
    variant = "sdtv3mae" if mae else "sdtv3"
    golden = GoldenBackboneV3(embed_dim=(8, 16, 24, 32), heads=4, T=1,
                              depths_stage3=2, depths_stage4=1, mae=mae)
    randomize_torch(golden, seed=13)
    _randomize_layer_scales(golden, seed=13)
    sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}
    converted = convert_sdtv3_backbone(sd, depths_stage3=2, depths_stage4=1,
                                       mae=mae)

    model = SpikingMetaFormer(embed_dim=(8, 16, 24, 32), num_heads=4, T=1,
                              variant=variant, depths_stage3=2,
                              depths_stage4=1)
    rng = np.random.default_rng(0)
    h, w = hw
    x = rng.normal(0, 1, (2, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        want = golden(torch.from_numpy(x))
    got = model.apply(converted, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    assert len(got) == 4
    for lvl, (g, t) in enumerate(zip(got, want)):
        # flax: [T, B, h, w, c]; torch: [T, B, c, h, w]
        t_np = t.numpy().transpose(0, 1, 3, 4, 2)
        np.testing.assert_allclose(np.asarray(g), t_np, atol=1e-3, rtol=1e-3,
                                   err_msg=f"pyramid level {lvl}")


@pytest.mark.parametrize("variant", ["sdtv3", "sdtv3mae"])
def test_full_model_conversion_and_parity(variant):
    """backbone.* + decode_head.* state_dict routed through
    convert_spike2former(variant=...): tree-exact vs Spike2Former init AND
    final cls/mask logits match the torch golden."""
    golden = GoldenSpike2Former(
        num_classes=CFG["num_classes"], embed_dim=CFG["embed_dim"],
        heads=CFG["backbone_heads"], T=1, feat=CFG["feat_channels"],
        num_queries=CFG["num_queries"], dec_layers=CFG["num_decoder_layers"],
        enc_layers=CFG["num_encoder_layers"], group=CFG["dcn_group"],
        depths_stage3=CFG["depths_stage3"],
        depths_stage4=CFG["depths_stage4"], variant=variant)
    randomize_torch(golden, seed=21)
    _randomize_layer_scales(golden, seed=21)
    sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}
    converted = convert_spike2former(
        sd, variant=variant, depths_stage3=CFG["depths_stage3"],
        depths_stage4=CFG["depths_stage4"],
        num_encoder_layers=CFG["num_encoder_layers"],
        num_decoder_layers=CFG["num_decoder_layers"])

    model = Spike2Former(T=1, compat=True, variant=variant, **CFG)
    init_vars = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    for col in ("params", "batch_stats"):
        want = _paths(init_vars[col])
        got = _paths(converted[col])
        assert set(got) == set(want), (
            f"{col}: missing={sorted(set(want) - set(got))[:5]} "
            f"extra={sorted(set(got) - set(want))[:5]}")

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        cls_t, mask_t = golden(torch.from_numpy(x))
    cls_j, mask_j = model.apply(converted,
                                jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    np.testing.assert_allclose(np.asarray(cls_j[-1]), cls_t[-1].numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mask_j[-1]), mask_t[-1].numpy(),
                               atol=1e-3, rtol=1e-3)


def test_v2_converter_rejects_v3_state_dict():
    """Negative compat check: feeding a v3-family state_dict to the SDTv2
    key map must FAIL loudly (KeyError on the RepConv qkv stacks), not
    silently half-convert."""
    from spike2former_tpu.engine.convert_sdtv2 import convert_sdtv2_backbone

    golden = GoldenBackboneV3(embed_dim=(8, 16, 24, 32), heads=4, T=1,
                              depths_stage3=2, depths_stage4=1)
    sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}
    with pytest.raises(KeyError):
        convert_sdtv2_backbone(sd, depths_stage3=2, depths_stage4=1)


def test_v3_converter_rejects_v2_state_dict():
    from torch_golden import GoldenBackbone

    golden = GoldenBackbone(embed_dim=(8, 16, 24, 32), heads=4, T=1,
                            depths_stage3=2, depths_stage4=1)
    sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}
    with pytest.raises(KeyError):
        convert_sdtv3_backbone(sd, depths_stage3=2, depths_stage4=1)
