"""End-to-end learning test: the full pipeline (model + Hungarian matching
+ losses + optimizer) must actually fit a trivial segmentation task.

With ``norm_eval=True`` (the reference's frozen-backbone-BN training recipe,
sdtv2.py:571-575 / config :41 — now the default) the toy task converges to
~100% pixel accuracy from random init; round 1 could only show loss descent
because live BN statistics degenerate at toy scale.
"""
import jax
import jax.numpy as jnp
import numpy as np

from spike2former_tpu.engine import init_state, make_optimizer, make_train_step
from spike2former_tpu.models import Spike2Former


def test_overfits_two_class_task():
    model = Spike2Former(
        num_classes=2, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=1,
        feat_channels=16, num_queries=4, num_decoder_layers=1,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1, dcn_group=4)
    assert model.norm_eval  # the reference training recipe is the default

    # left half = class 0 & dark, right half = class 1 & bright
    b, hw = 2, 32
    images = np.zeros((b, hw, hw, 3), np.float32)
    images[:, :, hw // 2:] = 220.0
    images[:, :, : hw // 2] = 30.0
    sem = np.zeros((b, hw, hw), np.int32)
    sem[:, :, hw // 2:] = 1
    images_j, sem_j = jnp.asarray(images), jnp.asarray(sem)

    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), images_j, True)["params"],
        base_lr=2e-3, warmup_iters=10, total_iters=400, clip_norm=1.0)
    state = init_state(model, tx, jax.random.PRNGKey(0), images_j)
    step = jax.jit(make_train_step(model, tx, num_classes=2, max_gt=4))

    first = None
    for i in range(300):
        state, metrics = step(state, images_j, sem_j)
        if first is None:
            first = float(metrics["total"])
    last = float(metrics["total"])
    assert np.isfinite(last)
    assert last < first * 0.25, (first, last)

    # REAL convergence: the eval path must segment the toy task correctly.
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    norm = (images_j - 127.5) / 58.0
    logits = model.apply(variables, norm,
                         method=Spike2Former.predict_logits)
    acc = float((jnp.argmax(logits, -1) == sem_j).mean())
    assert acc >= 0.95, f"toy pixel accuracy {acc}"

    # Bucketed-eval mIoU neutrality: bottom-right pad to a 2x bucket with
    # valid_hw masking (mask-aware PE + masked CA keys) must reproduce the
    # exact-shape predictions on the valid region (up to conv halo bleed at
    # the pad boundary — same class of effect as the reference's
    # size_divisor=32 padding).
    padded = jnp.pad(images_j, ((0, 0), (0, hw), (0, hw), (0, 0)))
    logits_b = model.apply(
        (variables), (padded - 127.5) / 58.0,
        jnp.asarray([[hw, hw]] * b, jnp.int32),
        method=Spike2Former.predict_logits)
    pred_exact = np.asarray(jnp.argmax(logits, -1))
    pred_bucket = np.asarray(jnp.argmax(logits_b, -1))[:, :hw, :hw]
    agree = float((pred_exact == pred_bucket).mean())
    assert agree >= 0.97, f"bucketed-eval agreement {agree}"


def test_norm_eval_freezes_backbone_stats():
    """Backbone BN running stats must not move during training while head
    BN stats do (the reference's norm_eval semantics)."""
    model = Spike2Former(
        num_classes=2, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=1,
        feat_channels=16, num_queries=4, num_decoder_layers=1,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1, dcn_group=4)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, 2, (2, 32, 32)), jnp.int32)

    tx = make_optimizer(model.init(jax.random.PRNGKey(0), images,
                                   True)["params"])
    state = init_state(model, tx, jax.random.PRNGKey(0), images)
    step = jax.jit(make_train_step(model, tx, num_classes=2, max_gt=4))
    state2, _ = step(state, images, sem)

    def max_delta(a, b):
        d = jax.tree_util.tree_map(
            lambda x, y: float(jnp.abs(x - y).max()), a, b)
        return max(jax.tree_util.tree_leaves(d))

    assert max_delta(state.batch_stats["backbone"],
                     state2.batch_stats["backbone"]) == 0.0
    assert max_delta(state.batch_stats["head"],
                     state2.batch_stats["head"]) > 0.0
