"""Backbone shape/structure tests (tiny inputs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spike2former_tpu.models.sdtv2 import SpikingMetaFormer


@pytest.mark.parametrize("variant", ["sdtv2", "sdtv3"])
def test_pyramid_shapes(variant):
    model = SpikingMetaFormer(
        embed_dim=(16, 32, 48, 56), num_heads=8, T=2, variant=variant,
        depths_stage3=1, depths_stage4=1)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (2, 2, 32, 32, 8), (2, 2, 16, 16, 16),
        (2, 2, 8, 8, 32), (2, 2, 4, 4, 56)]


def test_firing_rates_observable():
    model = SpikingMetaFormer(
        embed_dim=(8, 16, 24, 32), num_heads=4, T=1,
        depths_stage3=1, depths_stage4=1)
    x = jnp.ones((1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    _, aux = model.apply(vars_, x, mutable=["spikes"])
    leaves = jax.tree_util.tree_leaves(aux["spikes"])
    assert len(leaves) > 20  # one rate per spike site
    assert all(float(v) >= 0 for v in leaves)


def test_train_mode_updates_batch_stats():
    model = SpikingMetaFormer(
        embed_dim=(8, 16, 24, 32), num_heads=4, T=1,
        depths_stage3=1, depths_stage4=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    _, updated = model.apply(vars_, x, True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(vars_["batch_stats"])
    after = jax.tree_util.tree_leaves(updated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after))
    assert changed
