"""MSDeformAttn parity vs an independent torch grid_sample golden."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from spike2former_tpu.ops.msda import ms_deform_attn


def torch_msda_golden(value, shapes, locs, weights):
    """Independent torch implementation of multi-scale deformable attention
    sampling (grid_sample, align_corners=False, zero padding)."""
    value = torch.from_numpy(value)
    locs = torch.from_numpy(locs)
    weights = torch.from_numpy(weights)
    b, _, heads, dim = value.shape
    nq = locs.shape[1]
    splits = [h * w for h, w in shapes]
    vals = value.split(splits, dim=1)
    acc = torch.zeros(b, heads, nq, dim)
    for lvl, (h, w) in enumerate(shapes):
        v = vals[lvl].reshape(b, h, w, heads, dim).permute(0, 3, 4, 1, 2)
        v = v.reshape(b * heads, dim, h, w)
        g = locs[:, :, :, lvl] * 2 - 1  # [b, nq, heads, p, 2]
        g = g.permute(0, 2, 1, 3, 4).reshape(b * heads, nq, -1, 2)
        sampled = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                                align_corners=False)  # [b*h, dim, nq, p]
        wgt = weights[:, :, :, lvl].permute(0, 2, 1, 3).reshape(
            b * heads, 1, nq, -1)
        acc += (sampled * wgt).sum(-1).reshape(b, heads, dim, nq
                                               ).permute(0, 1, 3, 2)
    return acc.permute(0, 2, 1, 3).reshape(b, nq, heads * dim).numpy()


def test_msda_matches_torch():
    rng = np.random.default_rng(0)
    b, heads, dim, nq, p = 2, 4, 8, 6, 4
    shapes = ((8, 10), (4, 5))
    total = sum(h * w for h, w in shapes)
    value = rng.normal(size=(b, total, heads, dim)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1,
                       size=(b, nq, heads, len(shapes), p, 2)
                       ).astype(np.float32)
    weights = rng.uniform(0, 1, size=(b, nq, heads, len(shapes), p)
                          ).astype(np.float32)
    weights /= weights.sum(axis=(-1, -2), keepdims=True)

    want = torch_msda_golden(value, shapes, locs, weights)
    got = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs),
        jnp.asarray(weights)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_spike_deformable_encoder_end_to_end():
    """SpikeMSDeformAttention + deformable encoder
    (multi_scale_deform_attn.py:175-414, deformable_detr_layers.py:23-400):
    shapes, finiteness, and the spike-not-softmax attention-weight path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spike2former_tpu.models.deformable import (
        SpikeDeformableEncoder, SpikeMSDeformAttention,
        encoder_reference_points)

    shapes = ((8, 8), (4, 4))
    n_tok = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (1, 2, n_tok, 16)), jnp.float32)

    ref = encoder_reference_points(shapes)
    assert ref.shape == (n_tok, 2, 2)
    # first token of level 0 sits at pixel center (0.5/W, 0.5/H)
    np.testing.assert_allclose(np.asarray(ref)[0, 0], [0.5 / 8, 0.5 / 8])

    attn = SpikeMSDeformAttention(16, num_heads=4, num_levels=2,
                                  num_points=3)
    v = attn.init(jax.random.PRNGKey(0), q, q, ref, shapes)
    out = attn.apply(v, q, q, ref, shapes)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()

    enc = SpikeDeformableEncoder(num_layers=2, embed_dims=16, num_heads=4,
                                 num_points=3, feedforward_channels=32)
    v = enc.init(jax.random.PRNGKey(0), q, shapes)
    out, _ = enc.apply(v, q, shapes, True,
                       rngs={"dropout": jax.random.PRNGKey(1)},
                       mutable=["batch_stats"])
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()
    # layer-scale keeps the residual tiny at init
    assert float(jnp.abs(out - q).max()) < 1e-2
