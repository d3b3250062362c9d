"""spike_conv / spike_linear: packed-residual ops must be bit-identical
to the plain XLA ops in both forward and gradients.

Reference semantics: Qtrick_architecture/clock_driven/spike_op.py
(spikeConvolution/spikeLinear — spike-input conv/linear with compact
activation caching)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spike2former_tpu.ops.spike_op import (
    pack_codes, spike_conv, spike_linear, unpack_codes)


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(7,), (4, 5), (2, 3, 3), (16,)]:
        k = rng.integers(0, 16, shape).astype(np.uint8)
        packed = pack_codes(jnp.asarray(k))
        assert packed.dtype == jnp.uint8
        assert packed.shape[0] == (k.size + 1) // 2
        out = unpack_codes(packed, shape)
        np.testing.assert_array_equal(np.asarray(out), k)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("scale,groups", [(8.0, 1), (4.0, 1), (1.0, 16)])
def test_spike_conv_matches_plain(dtype, scale, groups):
    rng = np.random.default_rng(1)
    n, h, w, c, co = 2, 8, 8, 16, 16
    k = rng.integers(0, min(int(scale * 1.1) + 4, 9), (n, h, w, c))
    y = jnp.asarray(k / scale, dtype)
    kern = jnp.asarray(rng.normal(0, 0.5, (3, 3, c // groups, co)), dtype)

    def plain(y, kern):
        out = jax.lax.conv_general_dilated(
            y, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups)
        return out

    def packed(y, kern):
        return spike_conv(y, kern, scale, (1, 1), "SAME",
                          feature_group_count=groups)

    np.testing.assert_array_equal(
        np.asarray(packed(y, kern), np.float32),
        np.asarray(plain(y, kern), np.float32))

    g = jnp.asarray(rng.normal(0, 1, (n, h, w, co)), dtype)
    loss_plain = lambda y, k_: jnp.sum(plain(y, k_) * g)
    loss_packed = lambda y, k_: jnp.sum(packed(y, k_) * g)
    dy0, dw0 = jax.jit(jax.grad(loss_plain, argnums=(0, 1)))(y, kern)
    dy1, dw1 = jax.jit(jax.grad(loss_packed, argnums=(0, 1)))(y, kern)
    np.testing.assert_array_equal(np.asarray(dy0, np.float32),
                                  np.asarray(dy1, np.float32))
    np.testing.assert_array_equal(np.asarray(dw0, np.float32),
                                  np.asarray(dw1, np.float32))


def test_spike_linear_matches_plain():
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.integers(0, 9, (4, 10, 32)) / 8.0, jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.5, (32, 24)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(0, 1, (4, 10, 24)), jnp.bfloat16)

    out = spike_linear(y, w, 8.0)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(y @ w, np.float32))

    dy0, dw0 = jax.grad(lambda a, b: jnp.sum((a @ b) * g), (0, 1))(y, w)
    dy1, dw1 = jax.grad(
        lambda a, b: jnp.sum(spike_linear(a, b, 8.0) * g), (0, 1))(y, w)
    np.testing.assert_allclose(np.asarray(dy0, np.float32),
                               np.asarray(dy1, np.float32), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dw0, np.float32),
                               np.asarray(dw1, np.float32), atol=1e-6)


def test_residual_is_packed_not_float():
    """The saved residual must actually be the packed uint8 codes."""
    y = jnp.asarray(np.random.default_rng(3).integers(0, 9, (2, 4, 4, 8))
                    / 8.0, jnp.bfloat16)
    kern = jnp.ones((3, 3, 8, 8), jnp.bfloat16)
    out, res = jax.eval_shape(
        lambda y, k: jax.vjp(
            lambda a: spike_conv(a, k, 8.0, (1, 1), "SAME"), y),
        y, kern)
    # vjp closure's saved state: walk the pytree for the packed array
    flat = jax.tree.leaves(res)
    assert any(l.dtype == jnp.uint8 and l.size == (y.size + 1) // 2
               for l in flat), [(l.shape, l.dtype) for l in flat]
    assert not any(l.dtype in (jnp.bfloat16, jnp.float32)
                   and l.shape == y.shape for l in flat)


def test_packed_residuals_model_wiring_identical():
    """enable_packed_residuals must not change params, outputs, or grads
    of the spiking conv blocks — only what autodiff saves."""
    from flax.core import frozen_dict

    from spike2former_tpu.models.layers import MSConvBlock
    from spike2former_tpu.ops import spike_op

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (1, 2, 8, 8, 16)), jnp.float32)
    mod = MSConvBlock(dim=16, mlp_ratio=2, dtype=jnp.float32)

    def run():
        vs = mod.init(jax.random.PRNGKey(0), x, True)

        def loss(params):
            out, _ = mod.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, True, mutable=["batch_stats", "spikes"])
            return jnp.sum(out * out)

        val, grads = jax.jit(jax.value_and_grad(loss))(vs["params"])
        return vs, val, grads

    try:
        spike_op.enable_packed_residuals(False)
        vs0, val0, g0 = run()
        spike_op.enable_packed_residuals(True)
        vs1, val1, g1 = run()
    finally:
        spike_op.enable_packed_residuals(False)

    # identical parameter tree (checkpoint compatibility)
    assert jax.tree_util.tree_structure(vs0) == jax.tree_util.tree_structure(vs1)
    assert float(val0) == float(val1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_residuals_full_model_identical():
    """Whole Spike2Former fwd+grad must be bit-identical with packing on
    (covers SepConv/MSMLP/DownSampling/DCN/MSDAFFN/RepConv wiring)."""
    from spike2former_tpu.models.segmentor import Spike2Former
    from spike2former_tpu.ops import spike_op

    tiny = dict(num_classes=5, embed_dim=(8, 16, 24, 32), backbone_heads=4,
                feat_channels=16, num_queries=4, num_decoder_layers=1,
                num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
                dcn_group=4, T=1)
    x = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (2, 32, 32, 3)), jnp.float32)

    def run():
        model = Spike2Former(**tiny)
        vs = model.init({"params": jax.random.PRNGKey(0)}, x, True)

        def loss(params):
            (cls, masks), _ = model.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, True, mutable=["batch_stats", "spikes"])
            return (jnp.sum(cls.astype(jnp.float32) ** 2)
                    + jnp.sum(masks.astype(jnp.float32) ** 2))

        val, grads = jax.jit(jax.value_and_grad(loss))(vs["params"])
        return val, grads

    try:
        spike_op.enable_packed_residuals(False)
        v0, g0 = run()
        spike_op.enable_packed_residuals(True)
        v1, g1 = run()
    finally:
        spike_op.enable_packed_residuals(False)

    assert float(v0) == float(v1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
