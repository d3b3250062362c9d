"""Tests for the spikeformer attention library, BASE_Transformer decoder
layer and QueryProposal (models/spikeformer_lib.py).

Semantics pinned against independent numpy re-derivations of
mmdet/models/layers/transformer/mmcv_spike/spikeformer.py,
BASE_Transformer.py and .../transformer/utils.py QueryProposal.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spike2former_tpu.models.spikeformer_lib import (
    BaseTransformerDecoderLayer, QueryProposal, SpikeformerCrossAttention,
    SpikeformerDecoderLayer, SpikeformerMLP, SpikeformerSelfAttention,
    seek_local_maximum)

T, B, NQ, NK, C = 1, 2, 8, 16, 32


def _init_apply(mod, *args, **kwargs):
    variables = mod.init(jax.random.PRNGKey(0), *args, **kwargs)
    out = mod.apply(variables, *args, **kwargs)
    return variables, out


def test_self_attention_shape_and_residual():
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, NQ, C))
    pos = jax.random.normal(jax.random.PRNGKey(2), (T, B, NQ, C))
    mod = SpikeformerSelfAttention(embed_dims=C, num_heads=4)
    variables, out = _init_apply(mod, x, query_pos=pos)
    assert out.shape == (T, B, NQ, C)
    # residual is the pos-added query (spikeformer.py:236,:277): with all-
    # zero params the block output reduces to exactly query + query_pos
    zero = jax.tree_util.tree_map(jnp.zeros_like, variables)
    out0 = mod.apply(zero, x, query_pos=pos)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x + pos),
                               atol=1e-6)


def test_cross_attention_masks():
    q = jax.random.normal(jax.random.PRNGKey(1), (T, B, NQ, C))
    k = jax.random.normal(jax.random.PRNGKey(2), (T, B, NK, C))
    mod = SpikeformerCrossAttention(embed_dims=C, num_heads=4)
    variables, out = _init_apply(mod, q, k)
    assert out.shape == (T, B, NQ, C)
    # a fully-True bool mask zeroes every score => output == residual path
    # with scores 0 (attn output is spike(proj(spike(0-matmul))))
    mask = jnp.ones((B, 1, NQ, NK), bool)
    out_masked = mod.apply(variables, q, k, attn_mask=mask)
    assert out_masked.shape == (T, B, NQ, C)
    # float masks ADD to scores (spikeformer.py:424-425); large negative
    # mask drives every pre-spike attn value to 0 — same as the bool mask
    fmask = jnp.full((B, 1, NQ, NK), -100.0, jnp.float32)
    out_f = mod.apply(variables, q, k, attn_mask=fmask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_masked),
                               atol=1e-5)


def test_mlp_residual_inside():
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, NQ, C))
    mod = SpikeformerMLP(embed_dims=C, feedforward_channels=2 * C)
    variables, out = _init_apply(mod, x)
    assert out.shape == x.shape
    zero = jax.tree_util.tree_map(jnp.zeros_like, variables)
    np.testing.assert_allclose(np.asarray(mod.apply(zero, x)),
                               np.asarray(x), atol=1e-6)


def test_decoder_layer_forward_and_grad():
    q = jax.random.normal(jax.random.PRNGKey(1), (T, B, NQ, C))
    k = jax.random.normal(jax.random.PRNGKey(2), (T, B, NK, C))
    qp = jax.random.normal(jax.random.PRNGKey(3), (T, B, NQ, C))
    kp = jax.random.normal(jax.random.PRNGKey(4), (T, B, NK, C))
    mod = SpikeformerDecoderLayer(embed_dims=C, num_heads=4,
                                  feedforward_channels=2 * C)
    variables = mod.init(jax.random.PRNGKey(0), q, k, query_pos=qp,
                         key_pos=kp)

    def loss(v):
        return jnp.sum(mod.apply(v, q, k, query_pos=qp, key_pos=kp) ** 2)

    g = jax.grad(loss)(variables)
    norms = [float(jnp.abs(x).sum())
             for x in jax.tree_util.tree_leaves(g["params"])]
    assert any(n > 0 for n in norms)  # STE gradients flow through spikes


def test_base_decoder_layer_gamma_init_near_identity():
    tgt = jax.random.normal(jax.random.PRNGKey(1), (T, B, NQ, C))
    mem = jax.random.normal(jax.random.PRNGKey(2), (T, B, NK, C))
    mod = BaseTransformerDecoderLayer(embed_dims=C, num_heads=4,
                                      feedforward_channels=2 * C)
    variables = mod.init(jax.random.PRNGKey(0), tgt, mem, train=True)
    out = mod.apply(variables, tgt, mem, train=True,
                    mutable=["batch_stats"])[0]
    # layer-scale 1e-6 (BASE_Transformer.py:248-256): at init the layer is
    # a near-identity on tgt
    np.testing.assert_allclose(np.asarray(out), np.asarray(tgt),
                               atol=1e-3)
    assert float(jnp.abs(out - tgt).max()) > 0  # ... but not exactly


def test_seek_local_maximum_numpy_parity():
    rng = np.random.default_rng(0)
    x = rng.random((2, 5, 6, 3)).astype(np.float32)

    # independent numpy re-derivation of utils.py:900-918 (zero padding)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    expected = x >= 1e-6
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == dx == 0:
                continue
            expected &= x >= xp[:, 1 + dy:6 + dy, 1 + dx:7 + dx]
    got = np.asarray(seek_local_maximum(jnp.asarray(x)))
    np.testing.assert_array_equal(got, expected.astype(np.float32))


@pytest.mark.parametrize("train", [False, True])
def test_query_proposal(train):
    b, h, w, c, ncls, k = 2, 8, 8, 16, 5, 6
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c))
    pos = jax.random.normal(jax.random.PRNGKey(2), (1, h, w, c))
    mod = QueryProposal(num_queries=k, num_classes=ncls)
    variables = mod.init(jax.random.PRNGKey(0), x, pos, train=train)
    feats, ppos, locs, logits = mod.apply(variables, x, pos, train=train)
    assert feats.shape == (b, k, c)
    assert ppos.shape == (b, k, c)
    assert logits.shape == (b, h, w, ncls + 1)
    if train:
        assert locs.shape == (b, k, 2)
        assert float(locs.min()) >= 0 and float(locs.max()) <= 1
    else:
        assert locs is None
    # gathered features must be actual pixels of x
    xf = np.asarray(x).reshape(b, h * w, c)
    ff = np.asarray(feats)
    for bi in range(b):
        for qi in range(k):
            dists = np.abs(xf[bi] - ff[bi, qi]).sum(-1)
            assert dists.min() < 1e-6
