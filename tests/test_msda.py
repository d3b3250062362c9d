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
