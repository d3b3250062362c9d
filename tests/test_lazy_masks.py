"""Factored (LazyMasks) train-time mask predictions must be numerically
equivalent to the dense [L, B, nq, h, w] stack: same losses, same
parameter gradients.  The factorization only changes WHEN the
embed x mask-feature contraction happens (per layer / per matched slot,
inside the loss scans), not WHAT is computed — reference semantics are
mmdet maskformer_head.py:571-582 (SDME einsum) + :367-495 (loss)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spike2former_tpu.engine.train import make_train_step
from spike2former_tpu.engine.optim import make_optimizer
from spike2former_tpu.engine import init_state
from spike2former_tpu.losses import LazyMasks, maskformer_loss
from spike2former_tpu.losses.criterion import semantic_to_instances
from spike2former_tpu.models import Spike2Former


def _model(lazy):
    return Spike2Former(
        num_classes=6, embed_dim=(16, 32, 48, 64), backbone_heads=8,
        T=2, feat_channels=32, num_queries=8, num_decoder_layers=2,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
        lazy_masks=lazy)


def _batch():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, 6, (2, 32, 32)), jnp.int32)
    return imgs, sem


@pytest.mark.parametrize("num_points", [0, 16])
def test_lazy_masks_matches_dense(num_points):
    imgs, sem = _batch()
    dense_m, lazy_m = _model(False), _model(True)
    variables = dense_m.init(jax.random.PRNGKey(0), imgs, True)
    gt = semantic_to_instances(sem, 6, max_gt=8)
    kw = dict(num_classes=6, matcher="auction", loss_at="gt",
              num_points=num_points,
              rng=jax.random.PRNGKey(3) if num_points else None)

    def loss_of(model, params):
        (cls, masks), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, True, mutable=["batch_stats"])
        if model is lazy_m:
            assert isinstance(masks, LazyMasks)
        else:
            assert isinstance(masks, jax.Array) and masks.ndim == 5
        losses = maskformer_loss(cls, masks, gt, **kw)
        return losses["total"], losses

    (t_dense, l_dense), g_dense = jax.value_and_grad(
        lambda p: loss_of(dense_m, p), has_aux=True)(variables["params"])
    (t_lazy, l_lazy), g_lazy = jax.value_and_grad(
        lambda p: loss_of(lazy_m, p), has_aux=True)(variables["params"])

    np.testing.assert_allclose(float(t_lazy), float(t_dense), rtol=1e-5)
    for k in l_dense:
        np.testing.assert_allclose(
            float(l_lazy[k]), float(l_dense[k]), rtol=1e-5, atol=1e-6,
            err_msg=k)
    # The factorization reassociates the f32 logit contraction; grads of
    # near-canceling reductions (e.g. BN biases: sums of O(1) terms that
    # cancel to ~1e-4) then differ at the SUMMAND ulp, not the sum scale —
    # elementwise comparison at leaf scale is ill-posed.  Compare the
    # gradient as a vector (direction + magnitude) and each leaf at the
    # global gradient scale.
    vd = np.concatenate([np.asarray(v).ravel()
                         for v in jax.tree_util.tree_leaves(g_dense)])
    vl = np.concatenate([np.asarray(v).ravel()
                         for v in jax.tree_util.tree_leaves(g_lazy)])
    vd, vl = vd.astype(np.float64), vl.astype(np.float64)
    cos = float(vd @ vl / (np.linalg.norm(vd) * np.linalg.norm(vl)))
    assert cos > 1 - 1e-6, cos
    np.testing.assert_allclose(np.linalg.norm(vl), np.linalg.norm(vd),
                               rtol=1e-4)
    gscale = float(np.max(np.abs(vd)))
    flat_l = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(g_lazy)}
    for p, v in jax.tree_util.tree_leaves_with_path(g_dense):
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(
            np.asarray(flat_l[key]), np.asarray(v), rtol=2e-3,
            atol=1e-4 * gscale, err_msg=key)


def test_lazy_masks_train_step_runs():
    imgs, sem = _batch()
    model = _model(True)
    tx = make_optimizer(model.init(jax.random.PRNGKey(0), imgs,
                                   True)["params"])
    state = init_state(model, tx, jax.random.PRNGKey(0), imgs)
    step = jax.jit(make_train_step(model, tx, num_classes=6, max_gt=8,
                                   compact_gt=4))
    new_state, metrics = step(state, imgs, sem)
    assert int(new_state.step) == 1
    assert bool(jnp.isfinite(metrics["total"]))


def test_lazy_masks_masked_attention_mode():
    imgs, sem = _batch()
    base = dict(num_classes=6, embed_dim=(16, 32, 48, 64),
                backbone_heads=8, T=1, feat_channels=32, num_queries=8,
                num_decoder_layers=2, num_encoder_layers=1,
                depths_stage3=1, depths_stage4=1, masked_attention=True)
    dense_m = Spike2Former(**base)
    lazy_m = Spike2Former(**base, lazy_masks=True)
    variables = dense_m.init(jax.random.PRNGKey(1), imgs, True)
    gt = semantic_to_instances(sem, 6, max_gt=8)

    def total(model, v):
        (cls, masks), _ = model.apply(
            v, imgs, True, mutable=["batch_stats"])
        return maskformer_loss(cls, masks, gt, num_classes=6,
                               matcher="auction")["total"]

    np.testing.assert_allclose(
        float(total(lazy_m, variables)), float(total(dense_m, variables)),
        rtol=1e-5)
