"""Timestep-collapse exactness: the Qtrick spike ops are stateless across T
and the input is repeated per step, so all T time slices are identical and
mean-over-T equals the single-step value.  ``collapse_t=True`` (default)
must therefore be EXACT — same logits, same training loss and gradients —
not an approximation.

Reference context: mmseg/models/utils/Qtrick.py:8-53 replaces every neuron
with a stateless quantizer; the flagship reference config runs T=1 anyway
(backbone T=1 in SDTv2_maskformer_DCNpixelDecoder_ade20k.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from spike2former_tpu.engine import init_state, make_optimizer, make_train_step
from spike2former_tpu.models import Spike2Former

CFG = dict(num_classes=3, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=4,
           feat_channels=16, num_queries=4, num_decoder_layers=1,
           num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
           dcn_group=4)


def _image(b=2, hw=32):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(0, 1, (b, hw, hw, 3)), jnp.float32)


def test_collapse_t_inference_exact():
    x = _image()
    full = Spike2Former(collapse_t=False, **CFG)
    fast = Spike2Former(collapse_t=True, **CFG)
    variables = full.init(jax.random.PRNGKey(0), x)
    # parameter trees are T-free, so both models share the same variables
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, variables,
        fast.init(jax.random.PRNGKey(0), x)))
    lf = full.apply(variables, x, method=Spike2Former.predict_logits)
    lc = fast.apply(variables, x, method=Spike2Former.predict_logits)
    # T=4: sum of four identical floats is exact (x+x and 2x+2x round-free),
    # /4 is exact -> bitwise-identical logits
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lc))


def test_collapse_t_training_exact():
    x = _image()
    sem = jnp.asarray(
        (np.arange(32)[None, None, :] > 16).astype(np.int32)
        * np.ones((2, 32, 32), np.int32))
    losses, grads = [], []
    for collapse in (False, True):
        model = Spike2Former(collapse_t=collapse, **CFG)
        tx = make_optimizer(
            model.init(jax.random.PRNGKey(0), x, True)["params"],
            base_lr=1e-3, warmup_iters=10, total_iters=100)
        state = init_state(model, tx, jax.random.PRNGKey(0), x)
        step = jax.jit(make_train_step(model, tx, num_classes=3, max_gt=4))
        state, metrics = step(state, x, sem)
        losses.append(float(metrics["total"]))
        grads.append(state.params)
    assert np.isclose(losses[0], losses[1], rtol=1e-6), losses
    # post-step parameters identical -> identical gradients through the
    # matcher, losses and optimizer
    for a, b in zip(jax.tree_util.tree_leaves(grads[0]),
                    jax.tree_util.tree_leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_collapse_off_for_stateful_fpn():
    # The LIF-based FPN family carries membrane state across T — it has no
    # collapse flag and must keep its full multistep semantics.
    from spike2former_tpu.models.fpn import FPNSegmentor

    assert not hasattr(FPNSegmentor, "collapse_t")
