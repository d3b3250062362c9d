"""Spiking DAB-DETR decoder (reference: mmdet/models/layers/transformer/
dab_detr_layers.py + transformer/utils.py ConditionalAttention/
coordinate_to_encoding/inverse_sigmoid)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spike2former_tpu.models.dab_detr import (
    DABDetrDecoder, coordinate_to_encoding, inverse_sigmoid)


def _torch_formula_encoding(coord, num_feats, temperature=10000.0):
    """Independent numpy transcription of transformer/utils.py:49-97."""
    dim_t = np.arange(num_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    scale = 2 * math.pi

    def enc(v):
        pos = v[..., None] * scale / dim_t
        return np.stack([np.sin(pos[..., 0::2]), np.cos(pos[..., 1::2])],
                        axis=-1).reshape(*v.shape, num_feats)

    blocks = [enc(coord[..., 1]), enc(coord[..., 0])]
    if coord.shape[-1] == 4:
        blocks += [enc(coord[..., 2]), enc(coord[..., 3])]
    return np.concatenate(blocks, axis=-1)


def test_coordinate_to_encoding_matches_reference_formula():
    rng = np.random.default_rng(0)
    for d in (2, 4):
        coord = rng.uniform(0.05, 0.95, (2, 5, d)).astype(np.float32)
        got = np.asarray(coordinate_to_encoding(jnp.asarray(coord), 8))
        want = _torch_formula_encoding(coord, 8)
        assert got.shape == (2, 5, d * 8)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.01, 0.3, 0.5, 0.99])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x),
        atol=1e-5)
    # clamped at the boundary, finite
    assert np.isfinite(np.asarray(inverse_sigmoid(jnp.asarray([0.0, 1.0])))
                       ).all()


@pytest.mark.parametrize("scale_type", ["cond_elewise", "cond_scalar",
                                        "fix_elewise"])
def test_dab_decoder_forward_and_refinement(scale_type):
    t, b, nq, nk, c = 1, 2, 5, 16, 16
    rng = np.random.default_rng(1)
    dec = DABDetrDecoder(embed_dims=c, num_heads=4, num_layers=2,
                         feedforward_channels=32,
                         query_scale_type=scale_type)
    query = jnp.asarray(rng.normal(0, 1, (t, b, nq, c)), jnp.float32)
    key = jnp.asarray(rng.normal(0, 1, (t, b, nk, c)), jnp.float32)
    key_pos = jnp.asarray(rng.normal(0, 1, (b, nk, c)), jnp.float32)
    anchors = jnp.asarray(rng.normal(0, 0.5, (b, nq, 4)), jnp.float32)

    vs = dec.init(jax.random.PRNGKey(0), query, key, key_pos, anchors,
                  train=True)
    (outs, refs), _ = dec.apply(vs, query, key, key_pos, anchors,
                                train=True,
                                mutable=["batch_stats", "spikes"])
    assert outs.shape == (2, t, b, nq, c)
    assert refs.shape == (2, b, nq, 4)
    r = np.asarray(refs)
    assert ((r > 0) & (r < 1)).all()  # sigmoid space
    # layer 0 attends with the INITIAL anchors; refinement changes them
    np.testing.assert_allclose(
        r[0], np.asarray(jax.nn.sigmoid(anchors)), atol=1e-6)
    assert not np.allclose(r[0], r[1])


def test_dab_decoder_point_queries_and_grads():
    t, b, nq, nk, c = 1, 2, 4, 9, 16
    rng = np.random.default_rng(2)
    dec = DABDetrDecoder(embed_dims=c, num_heads=4, num_layers=2,
                         feedforward_channels=32, query_dim=2,
                         with_modulated_hw_attn=False)
    query = jnp.asarray(rng.normal(0, 1, (t, b, nq, c)), jnp.float32)
    key = jnp.asarray(rng.normal(0, 1, (t, b, nk, c)), jnp.float32)
    key_pos = jnp.asarray(rng.normal(0, 1, (b, nk, c)), jnp.float32)
    anchors = jnp.asarray(rng.normal(0, 0.5, (b, nq, 2)), jnp.float32)
    vs = dec.init(jax.random.PRNGKey(0), query, key, key_pos, anchors,
                  train=True)

    def loss(params):
        (outs, refs), _ = dec.apply(
            {"params": params, "batch_stats": vs["batch_stats"]},
            query, key, key_pos, anchors, train=True,
            mutable=["batch_stats", "spikes"])
        return (jnp.sum(outs.astype(jnp.float32) ** 2)
                + jnp.sum(refs ** 2))

    grads = jax.jit(jax.grad(loss))(vs["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0


def test_dab_decoder_knob_trains_end_to_end():
    """model.decoder='dab' must be config-reachable and trainable: one
    full train step (forward + loss + backward + update) on the tiny
    Spike2Former with the DAB decoder, and an eval forward with the
    deep-supervision layout intact."""
    from spike2former_tpu.engine import (init_state, make_optimizer,
                                         make_train_step)
    from spike2former_tpu.engine.config import get_config, build_model

    cfg = get_config("SDTv2_maskformer_DCNpixelDecoder_ade20k")
    for k, v in dict(num_classes=3, embed_dim=(8, 16, 24, 32),
                     backbone_heads=4, feat_channels=16, num_queries=4,
                     num_decoder_layers=2, num_encoder_layers=1,
                     depths_stage3=1, depths_stage4=1, dcn_group=4,
                     decoder="dab").items():
        setattr(cfg.model, k, v)
    model = build_model(cfg.model)
    assert model.decoder == "dab"

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, 3, (2, 32, 32)), jnp.int32)

    norm = (images - 127.5) / 58.0
    tx = make_optimizer(model.init(jax.random.PRNGKey(0), norm, True)
                        ["params"], base_lr=1e-3, warmup_iters=2,
                        total_iters=10)
    state = init_state(model, tx, jax.random.PRNGKey(0), norm)
    step = jax.jit(make_train_step(model, tx, num_classes=3, max_gt=4))
    state, metrics = step(state, images, sem)
    assert np.isfinite(float(metrics["total"]))

    # eval path: deep supervision collapsed to the last layer
    cls, masks = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        norm, False)
    assert cls.shape[0] == 1 and masks.shape[0] == 1
    assert cls.shape[1:] == (2, 4, 4)  # [B, nq, ncls+1]
