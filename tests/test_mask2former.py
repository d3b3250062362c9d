"""Mask2Former-style masked cross-attention decoder mode
(reference: mmdet/models/layers/transformer/mask2former_layers.py
Mask2FormerTransformerDecoder{,Layer} + the upstream Mask2FormerHead
masked-attention rule: interpolate previous mask → sigmoid < 0.5 masks
keys, rows that would mask everything are unmasked)."""
import jax
import jax.numpy as jnp
import numpy as np

from spike2former_tpu.models.maskformer_head import mask2former_attn_mask
from spike2former_tpu.models.segmentor import Spike2Former

TINY = dict(num_classes=5, embed_dim=(8, 16, 24, 32), backbone_heads=4,
            feat_channels=16, num_queries=4, num_decoder_layers=2,
            num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
            dcn_group=4, T=1)


def test_attn_mask_rule():
    # query 0: left half negative logits -> masked; query 1: all positive
    # -> unmasked; query 2: ALL negative -> escape unmasks everything
    mask_pred = np.zeros((1, 3, 4, 4), np.float32)
    mask_pred[0, 0, :, :2] = -5.0
    mask_pred[0, 0, :, 2:] = 5.0
    mask_pred[0, 1] = 3.0
    mask_pred[0, 2] = -1.0
    am = np.asarray(mask2former_attn_mask(jnp.asarray(mask_pred), (4, 4)))
    assert am.shape == (1, 1, 3, 16)
    assert am[0, 0, 0].reshape(4, 4)[:, 0].all()       # left col masked
    assert not am[0, 0, 0].reshape(4, 4)[:, 3].any()   # right col open
    assert not am[0, 0, 1].any()                       # nothing masked
    assert not am[0, 0, 2].any()                       # escape: unmasked

    # resizing happens on logits (downsample 4x4 -> 2x2 averages signs)
    am2 = np.asarray(mask2former_attn_mask(jnp.asarray(mask_pred), (2, 2)))
    assert am2.shape == (1, 1, 3, 4)
    assert am2[0, 0, 0].reshape(2, 2)[:, 0].all()
    assert not am2[0, 0, 0].reshape(2, 2)[:, 1].any()

    # pad mask ORs in (and can re-mask what the escape opened)
    pad = np.zeros((1, 1, 1, 16), bool)
    pad[..., 15] = True
    am3 = np.asarray(mask2former_attn_mask(
        jnp.asarray(mask_pred), (4, 4), pad_mask=jnp.asarray(pad)))
    assert am3[0, 0, 1, 15] and am3[0, 0, 2, 15]
    assert not am3[0, 0, 1, :15].any()


def _init_and_run(masked, train):
    model = Spike2Former(masked_attention=masked, **TINY)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, x, True)
    out, _ = model.apply(vs, x, train,
                         mutable=["batch_stats", "spikes"])
    return model, vs, out


def test_masked_attention_shapes_and_param_compat():
    _, vs0, (cls0, masks0) = _init_and_run(False, True)
    _, vs1, (cls1, masks1) = _init_and_run(True, True)
    # identical parameter tree: the mode is checkpoint-compatible
    assert (jax.tree_util.tree_structure(vs0["params"])
            == jax.tree_util.tree_structure(vs1["params"]))
    # deep supervision: initial queries + each of the 2 layers
    assert cls0.shape == cls1.shape == (3, 2, 4, 6)
    assert masks0.shape == masks1.shape
    # eval returns only the final layer in both modes
    _, _, (cls_e, masks_e) = _init_and_run(True, False)
    assert cls_e.shape[0] == 1 and masks_e.shape[0] == 1


def test_masked_attention_grads_flow():
    model, vs, _ = _init_and_run(True, True)
    x = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (2, 32, 32, 3)), jnp.float32)

    def loss(params):
        (cls, masks), _ = model.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, x, True,
            mutable=["batch_stats", "spikes"])
        return jnp.sum(cls.astype(jnp.float32) ** 2) + jnp.sum(
            masks.astype(jnp.float32) ** 2)

    grads = jax.jit(jax.grad(loss))(vs["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the decoder layers receive gradient (masking didn't sever the graph)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0.0
