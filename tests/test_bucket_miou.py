"""Bucketed-eval mIoU neutrality at eval fidelity (round-3 VERDICT item 7).

Round 2 only showed argmax agreement >=97% on a 2-class toy; conv-halo
bleed at the pad boundary is exactly the effect that hides in 3% of pixels
at class boundaries.  Here: a multi-class synthetic val set with varied
keep-ratio shapes spanning two bucket shapes, scored through the REAL eval
protocol (pad -> whole_logits -> postprocess_pred crop -> full-resolution
IoU) in both modes:

* exact:    pad to size_divisor=32, live (unmasked) zero padding — the
            reference's SegDataPreProcessor protocol
            (data_preprocessor.py:140-148)
* bucketed: pad to 64-multiples with valid_hw masking (mask-aware PE +
            masked CA keys)

Acceptance: |mIoU_exact - mIoU_bucketed| <= 0.1 points per bucket shape.

Note on the toy model: the softmax-free linear attention makes token sums
scale with token count, so a model trained at one resolution degrades at
very different ones (the reference operates at a bounded 512–2048 range).
The val shapes here stay within ~2x of the training size; absolute mIoU is
moderate, but the delta under test measures the *numerical neutrality of
the two padding protocols with identical weights*, which is exactly the
round-2 gap being closed.
"""
import jax
import jax.numpy as jnp
import numpy as np

from spike2former_tpu.engine import init_state, make_optimizer, make_train_step
from spike2former_tpu.engine.inference import (bucket_hw, postprocess_pred,
                                               whole_logits)
from spike2former_tpu.evaluation import compute_iou, init_iou, update_iou_np
from spike2former_tpu.models import Spike2Former

NUM_CLASSES = 4
PALETTE = np.array([[30, 30, 30], [220, 40, 40], [40, 220, 40],
                    [40, 40, 220]], np.float32)


def _make_image(rng, h, w):
    """Two-band multi-class GT with color-coded pixels + noise."""
    sem = np.zeros((h, w), np.int32)
    horizontal = rng.random() < 0.5
    cls = rng.permutation(NUM_CLASSES)[:2]
    extent = h if horizontal else w
    edge = int(rng.integers(extent // 3, 2 * extent // 3))
    if horizontal:
        sem[:edge] = cls[0]
        sem[edge:] = cls[1]
    else:
        sem[:, :edge] = cls[0]
        sem[:, edge:] = cls[1]
    img = PALETTE[sem] + rng.normal(0, 10, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.float32), sem


def _train_tiny(model, rng):
    """Two-scale training (64^2 and 112^2): the softmax-free linear
    attention's token sums scale with token count, so covering the eval
    token range in training is what keeps large-size logit margins
    healthy — mirroring the reference's bounded 512-2048 operating
    envelope."""
    i64, s64 = zip(*[_make_image(rng, 64, 64) for _ in range(4)])
    i112, s112 = zip(*[_make_image(rng, 112, 112) for _ in range(2)])
    x64, y64 = jnp.asarray(np.stack(i64)), jnp.asarray(np.stack(s64))
    x112, y112 = jnp.asarray(np.stack(i112)), jnp.asarray(np.stack(s112))
    # lr 1.5e-3 x 450 iters, NOT 3e-3 x 300: the quantized-spike net is
    # chaotic (ulp-level op-reordering diverges runs within 2 steps), and
    # at 3e-3 the toy's convergence is a coin flip across numerically
    # equivalent optimizer implementations.  The gentler recipe converges
    # to the same bucket mIoUs for both the flat fused AdamW and the optax
    # pytree chain.
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), x64, True)["params"],
        base_lr=1.5e-3, warmup_iters=20, total_iters=1400, clip_norm=1.0)
    state = init_state(model, tx, jax.random.PRNGKey(0), x64)
    step = jax.jit(make_train_step(model, tx, num_classes=NUM_CLASSES,
                                   max_gt=8))
    for _ in range(450):
        state, metrics = step(state, x64, y64)
        state, metrics = step(state, x112, y112)
    assert np.isfinite(float(metrics["total"]))
    return {"params": state.params, "batch_stats": state.batch_stats}


def _pad_to(img, ph, pw):
    h, w = img.shape[:2]
    return np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)))


def test_bucketed_eval_miou_delta():
    model = Spike2Former(
        num_classes=NUM_CLASSES, embed_dim=(8, 16, 24, 32),
        backbone_heads=4, T=1, feat_channels=16, num_queries=8,
        num_decoder_layers=1, num_encoder_layers=1, depths_stage3=1,
        depths_stage4=1, dcn_group=4)
    rng = np.random.default_rng(11)
    variables = _train_tiny(model, rng)

    # shapes spanning two 64-bucket shapes: (64,128) and (128,128);
    # chosen so exact /32 pads collapse to two shapes as well
    shapes = [(60, 90), (55, 95), (97, 90), (120, 90),
              (58, 85), (110, 95)]
    per_bucket: dict = {}
    pred_classes: set = set()
    for h, w in shapes:
        img, sem = _make_image(rng, h, w)
        bucket = bucket_hw(h, w, 64)
        st = per_bucket.setdefault(
            bucket, {"exact": init_iou(NUM_CLASSES),
                     "bucket": init_iou(NUM_CLASSES)})

        # exact protocol: pad to /32 like the reference preprocessor
        ph, pw = -(-h // 32) * 32, -(-w // 32) * 32
        logits = whole_logits(model, variables,
                              jnp.asarray(_pad_to(img, ph, pw)[None]))
        pred = np.asarray(postprocess_pred(logits, (h, w), (h, w))[0])
        st["exact"] = update_iou_np(st["exact"], pred, sem, NUM_CLASSES)
        pred_classes.update(np.unique(pred).tolist())

        # bucketed protocol: pad to the bucket + valid_hw masking
        bh, bw = bucket
        logits_b = whole_logits(model, variables,
                                jnp.asarray(_pad_to(img, bh, bw)[None]),
                                valid_hw=[(h, w)])
        pred_b = np.asarray(postprocess_pred(logits_b, (h, w), (h, w))[0])
        st["bucket"] = update_iou_np(st["bucket"], pred_b, sem, NUM_CLASSES)

    assert len(per_bucket) >= 2, list(per_bucket)
    # non-degeneracy: the model actually segments (multiple classes used,
    # scores above the 1-class-constant ceiling).  The quality guard is on
    # the AGGREGATE over all val images: the 450-iter toy recipe is
    # chaotic (see _train_tiny's note) and any ulp-level change elsewhere
    # in the loss stack can re-roll which size regime a run is weakest in
    # — per-bucket quality is not what this test verifies.  The per-bucket
    # assertion below is the actual target: protocol NEUTRALITY (exact vs
    # bucketed padding with identical weights), which must hold bucket by
    # bucket regardless of where training landed.
    assert len(pred_classes) >= 2, pred_classes
    agg = init_iou(NUM_CLASSES)
    for st in per_bucket.values():
        agg = jax.tree_util.tree_map(lambda a, b: a + b, agg, st["exact"])
    m_agg = compute_iou(agg)["mIoU"]
    assert m_agg > 10.0, m_agg
    for bucket, st in per_bucket.items():
        m_exact = compute_iou(st["exact"])["mIoU"]
        m_bucket = compute_iou(st["bucket"])["mIoU"]
        delta = abs(m_exact - m_bucket)
        assert delta <= 0.1, (
            f"bucket {bucket}: mIoU exact {m_exact:.3f} vs "
            f"bucketed {m_bucket:.3f} (delta {delta:.3f} > 0.1)")
