"""Checkpoint converter test: reference-named torch state_dict → flax tree.

Builds a tiny SDTv2 backbone, synthesizes a torch-style state dict with the
reference's parameter names (sdtv2.py module structure) from the flax
variables, converts it back, and asserts an exact round trip — proving the
mapping covers every parameter and stays shape/layout-consistent.
"""
import jax
import jax.numpy as jnp
import numpy as np

from spike2former_tpu.engine.convert_sdtv2 import convert_sdtv2_backbone
from spike2former_tpu.models.sdtv2 import SpikingMetaFormer


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def synth(variables, d3, d4):
    """Inverse of the converter: flax variables → reference-named torch
    state dict (conv HWIO→OIHW, conv1d [1,I,O]→[O,I,1])."""
    p = variables["params"]
    s = variables["batch_stats"]
    sd = {}

    def conv(key, path, bias=True):
        sd[key + ".weight"] = _get(p, path + ["kernel"]).transpose(3, 2, 0, 1)
        if bias:
            sd[key + ".bias"] = _get(p, path + ["bias"])

    def conv1d(key, path):
        k = _get(p, path + ["kernel"])  # [1, 1, I, O]
        sd[key + ".weight"] = k[0].transpose(2, 1, 0)
        sd[key + ".bias"] = _get(p, path + ["bias"])

    def bn(key, path, wrapped=True):
        inner = path + ["BatchNorm_0"] if wrapped else path
        sd[key + ".weight"] = _get(p, inner + ["scale"])
        sd[key + ".bias"] = _get(p, inner + ["bias"])
        sd[key + ".running_mean"] = _get(s, inner + ["mean"])
        sd[key + ".running_var"] = _get(s, inner + ["var"])

    def convbn(ck, bk, path):
        conv(ck, path + ["Conv_0"], bias="bias" in p_at(path + ["Conv_0"]))
        bn(bk, path + ["BatchNorm_0"])

    def p_at(path):
        node = p
        for x in path:
            node = node[x]
        return node

    def sep(pfx, path):
        convbn(f"{pfx}.pwconv1", f"{pfx}.bn1", path + ["ConvBN_0"])
        conv(f"{pfx}.dwconv", path + ["Conv_0"],
             bias="bias" in p_at(path + ["Conv_0"]))
        convbn(f"{pfx}.pwconv2", f"{pfx}.bn2", path + ["ConvBN_1"])

    def cblock(pfx, path):
        sep(f"{pfx}.Conv", path + ["SepConv_0"])
        convbn(f"{pfx}.conv1", f"{pfx}.bn1", path + ["ConvBN_0"])
        convbn(f"{pfx}.conv2", f"{pfx}.bn2", path + ["ConvBN_1"])

    def rep(pfx, path):
        conv(f"{pfx}.body.0", path + ["Conv_0"], bias=False)
        bn(f"{pfx}.body.1.bn", path + ["BNAndPad_0"], wrapped=False)
        conv(f"{pfx}.body.2.0", path + ["Conv_1"], bias=False)
        conv(f"{pfx}.body.2.1", path + ["Conv_2"], bias=False)
        bn(f"{pfx}.body.2.2", path + ["BatchNorm_0"])

    def down(pfx, path):
        conv(f"{pfx}.encode_conv", path + ["Conv_0"])
        bn(f"{pfx}.encode_bn", path + ["BatchNorm_0"])

    def attn(pfx, path):
        for n in ("q", "k", "v"):
            rep(f"{pfx}.{n}_conv.0", path + [f"{n}_rep"])
            bn(f"{pfx}.{n}_conv.1", path + [f"{n}_bn"])
        rep(f"{pfx}.proj_conv.0", path + ["proj_rep"])
        bn(f"{pfx}.proj_conv.1", path + ["proj_bn"])

    def mlp(pfx, path):
        conv1d(f"{pfx}.fc1_conv", path + ["Conv_0"])
        bn(f"{pfx}.fc1_bn", path + ["BatchNorm_0"])
        conv1d(f"{pfx}.fc2_conv", path + ["Conv_1"])
        bn(f"{pfx}.fc2_bn", path + ["BatchNorm_1"])

    down("downsample1_1", ["down1_1"])
    cblock("ConvBlock1_1.0", ["conv1_1"])
    down("downsample1_2", ["down1_2"])
    cblock("ConvBlock1_2.0", ["conv1_2"])
    down("downsample2", ["down2"])
    cblock("ConvBlock2_1.0", ["conv2_1"])
    cblock("ConvBlock2_2.0", ["conv2_2"])
    down("downsample3", ["down3"])
    for i in range(d3):
        attn(f"block3.{i}.attn", [f"block3_{i}", "SpikeAttention_0"])
        mlp(f"block3.{i}.mlp", [f"block3_{i}", "MSMLP_0"])
    down("downsample4", ["down4"])
    for i in range(d4):
        attn(f"block4.{i}.attn", [f"block4_{i}", "SpikeAttention_0"])
        mlp(f"block4.{i}.mlp", [f"block4_{i}", "MSMLP_0"])
    return sd


def test_roundtrip_and_reference_names():
    model = SpikingMetaFormer(
        embed_dim=(8, 16, 24, 32), num_heads=4, T=1, variant="sdtv2",
        depths_stage3=2, depths_stage4=1)
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.device_get(model.init(jax.random.PRNGKey(0), x))

    sd = synth(variables, 2, 1)
    # spot-check key names exactly match the reference module structure
    for key in [
        "downsample1_1.encode_conv.weight",
        "downsample1_1.encode_bn.running_mean",
        "ConvBlock1_1.0.Conv.pwconv1.weight",
        "ConvBlock1_1.0.Conv.dwconv.weight",
        "ConvBlock2_2.0.conv2.weight",
        "block3.1.attn.q_conv.0.body.1.bn.running_var",
        "block3.0.attn.proj_conv.1.weight",
        "block4.0.mlp.fc2_conv.bias",
    ]:
        assert key in sd, key

    converted = convert_sdtv2_backbone(sd, depths_stage3=2, depths_stage4=1)

    flat_src = jax.tree_util.tree_leaves_with_path(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})
    flat_dst = dict(jax.tree_util.tree_leaves_with_path(converted))
    assert len(flat_src) == len(flat_dst)
    for path, leaf in flat_src:
        assert path in flat_dst, path
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_dst[path]),
                                   err_msg=str(path))

    # converted variables must run through the model
    out = model.apply(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]}, x)
    assert len(out) == 4
