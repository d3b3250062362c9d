"""Head + end-to-end segmentor shape tests (tiny configs)."""
import jax
import jax.numpy as jnp

from spike2former_tpu.models import MaskFormerHead, Spike2Former


def tiny_head(**kw):
    base = dict(
        in_channels=(8, 16, 24, 32), feat_channels=32, out_channels=32,
        num_classes=10, num_queries=5, num_decoder_layers=2,
        num_encoder_layers=1, num_heads=4, decoder_ffn_channels=64,
        encoder_ffn_channels=64, dcn_group=4)
    base.update(kw)
    return MaskFormerHead(**base)


def make_feats(t=2, b=2, hw=32):
    dims = (8, 16, 24, 32)
    sizes = (hw // 2, hw // 4, hw // 8, hw // 16)
    return [jnp.ones((t, b, s, s, c)) for s, c in zip(sizes, dims)]


def test_head_train_shapes():
    head = tiny_head()
    feats = make_feats()
    vars_ = head.init(jax.random.PRNGKey(0), feats)
    cls, masks = head.apply(vars_, feats, True,
                            mutable=["batch_stats"])[0]
    # L+1 = 3 supervision points (init + 2 layers)
    assert cls.shape == (3, 2, 5, 11)
    assert masks.shape == (3, 2, 5, 16, 16)  # H/2 of 32


def test_head_eval_returns_last_only():
    head = tiny_head()
    feats = make_feats()
    vars_ = head.init(jax.random.PRNGKey(0), feats)
    cls, masks = head.apply(vars_, feats, False)
    assert cls.shape == (1, 2, 5, 11)
    assert masks.shape == (1, 2, 5, 16, 16)


def test_segmentor_end_to_end_predict():
    model = Spike2Former(
        num_classes=10, embed_dim=(16, 32, 48, 64), backbone_heads=8, T=1,
        feat_channels=32, num_queries=5, num_decoder_layers=2,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(vars_, x, method=model.predict_logits)
    assert logits.shape == (1, 64, 64, 10)
    probs = jnp.sum(logits, axis=-1)
    assert bool(jnp.all(probs <= 10.0))


def test_transformer_encoder_pixel_decoder():
    from spike2former_tpu.models.pixel_decoder import (
        TransformerEncoderPixelDecoder)
    pd = TransformerEncoderPixelDecoder(
        in_channels=(8, 16, 24, 32), feat_channels=32, out_channels=32,
        num_encoder_layers=1, num_heads=4, feedforward_channels=64)
    feats = [jnp.ones((2, 1, s, s, c)) for s, c in
             [(16, 8), (8, 16), (4, 24), (2, 32)]]
    vars_ = pd.init(jax.random.PRNGKey(0), feats)
    mask_feat, memory, outs = pd.apply(vars_, feats)
    assert mask_feat.shape == (2, 1, 16, 16, 32)
    assert memory.shape == (2, 1, 2, 2, 32)
    assert [o.shape[2] for o in outs] == [2, 4, 8]


def test_fpn_segmentor_end_to_end():
    from spike2former_tpu.models.fpn import FPNSegmentor
    model = FPNSegmentor(
        num_classes=7, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=2,
        neck_channels=16, head_channels=16, neuron="lif",
        depths_stage3=1, depths_stage4=1)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(vars_, x, method=model.predict_logits)
    assert logits.shape == (1, 32, 32, 7)
