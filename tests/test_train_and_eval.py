"""Train-step, IoU metric, and sliding-window inference tests (tiny, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from spike2former_tpu.engine import (
    init_state, make_optimizer, make_train_step, poly_warmup_schedule,
    slide_logits,
)
from spike2former_tpu.evaluation import compute_iou, init_iou, update_iou
from spike2former_tpu.models import Spike2Former


def tiny_model(num_classes=6):
    return Spike2Former(
        num_classes=num_classes, embed_dim=(16, 32, 48, 64),
        backbone_heads=8, T=1, feat_channels=32, num_queries=6,
        num_decoder_layers=1, num_encoder_layers=1,
        depths_stage3=1, depths_stage4=1)


def test_train_step_runs_and_decreases_nothing_nan():
    model = tiny_model()
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), imgs, True)["params"])
    state = init_state(model, tx, jax.random.PRNGKey(0), imgs)
    step = make_train_step(model, tx, num_classes=6, max_gt=8)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, 6, (2, 32, 32)), jnp.int32)
    state2, metrics = jax.jit(step)(state, images, sem)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["total"]))
    # params actually changed
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_grad_accumulation_matches_big_batch_direction():
    """accum_steps=2 over batch 4 must (a) run inside one jitted step,
    (b) produce the same parameter update as the big batch when BN uses
    running stats, up to the per-microbatch loss normalizers."""
    model = tiny_model()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, 6, (4, 32, 32)), jnp.int32)
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), images, True)["params"])

    outs = {}
    for accum in (1, 2):
        state = init_state(model, tx, jax.random.PRNGKey(0), images)
        step = jax.jit(make_train_step(model, tx, num_classes=6, max_gt=8,
                                       accum_steps=accum))
        state2, metrics = step(state, images, sem)
        assert np.isfinite(float(metrics["total"]))
        outs[accum] = (state2, float(metrics["total"]),
                       np.asarray(metrics["grad_norm"]))

    # same budget of data -> losses in the same ballpark, params updated
    assert abs(outs[2][1] - outs[1][1]) / outs[1][1] < 0.2
    flat1 = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree_util.tree_leaves(outs[1][0].params)])
    flat2 = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree_util.tree_leaves(outs[2][0].params)])
    assert np.isfinite(flat2).all()
    cos = flat1 @ flat2 / (np.linalg.norm(flat1) * np.linalg.norm(flat2))
    assert cos > 0.99  # updates point the same way


def test_schedule_matches_reference_shape():
    s = poly_warmup_schedule(1e-3, warmup_iters=10, total_iters=100)
    assert float(s(0)) < 1e-6 + 1e-9
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(s(55)), 1e-3 * 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-9)


def test_iou_metric_perfect_and_mismatch():
    st = init_iou(3)
    pred = jnp.asarray([[[0, 1], [2, 2]]])
    st = update_iou(st, pred, pred, 3)
    res = compute_iou(st)
    assert res["mIoU"] == 100.0 and res["aAcc"] == 100.0

    st = init_iou(2)
    pred = jnp.asarray([[[0, 0], [1, 1]]])
    label = jnp.asarray([[[0, 1], [255, 1]]])
    st = update_iou(st, pred, label, 2)
    res = compute_iou(st)
    # class0: inter 1, union 2+1-1=2 → 0.5 ; class1: inter 1, union 1+2-1=2
    np.testing.assert_allclose(res["mIoU"], 50.0)


def test_update_iou_np_matches_jit():
    from spike2former_tpu.evaluation import update_iou_np

    rng = np.random.default_rng(3)
    pred = rng.integers(0, 5, (1, 17, 23)).astype(np.int32)
    label = rng.integers(0, 5, (1, 17, 23)).astype(np.int32)
    label[0, :3, :3] = 255
    a = update_iou(init_iou(5), jnp.asarray(pred), jnp.asarray(label), 5)
    b = update_iou_np(init_iou(5), pred, label, 5)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_train_checkpoint_restores_into_eval_variables(tmp_path):
    """Regression (ADVICE round 1): a TrainState checkpoint written by the
    training CLI must load in the eval CLI's {params, batch_stats} shape."""
    from spike2former_tpu.engine.checkpoint import (
        restore_variables, save_state)

    model = tiny_model()
    imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), imgs, True)["params"])
    state = init_state(model, tx, jax.random.PRNGKey(0), imgs)
    path = save_state(str(tmp_path), state, 7)

    variables = model.init(jax.random.PRNGKey(1), imgs)
    restored = restore_variables(path, variables)
    leaves_a = jax.tree_util.tree_leaves(restored["params"])
    leaves_b = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert len(leaves_a) == len(leaves_b)
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    # restored variables actually run inference
    out = model.apply({"params": restored["params"],
                       "batch_stats": restored["batch_stats"]}, imgs)
    assert np.isfinite(np.asarray(out[0])).all()


def test_bucketed_eval_shares_one_compilation():
    """Distinct keep-ratio shapes that land in the same bucket must reuse a
    single XLA compilation (the whole point of shape bucketing)."""
    from spike2former_tpu.engine.inference import _jitted_whole, bucket_hw

    assert bucket_hw(40, 48, 64) == (64, 64)
    assert bucket_hw(65, 128, 64) == (128, 128)

    model = tiny_model()
    vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    fn = _jitted_whole(model, True)
    rng = np.random.default_rng(0)
    sizes = []
    for (h, w) in [(40, 48), (56, 33)]:
        bh, bw = bucket_hw(h, w, 64)
        img = jnp.asarray(rng.integers(0, 255, (1, bh, bw, 3)), jnp.float32)
        out = fn(vars_, img, jnp.asarray([[h, w]], jnp.int32))
        assert out.shape == (1, bh, bw, 6)
        sizes.append(fn._cache_size())
    # the second same-bucket shape must NOT trigger a new compilation
    # (cache may be pre-primed by earlier tests with an equal model, so
    # only the delta between the two calls is asserted)
    assert sizes[1] == sizes[0], sizes


def test_slide_matches_whole_when_single_window():
    model = tiny_model()
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 255, (1, 32, 32, 3)), jnp.float32)
    from spike2former_tpu.engine import whole_logits
    w = whole_logits(model, vars_, img)
    s = slide_logits(model, vars_, img, crop_size=(32, 32), stride=(32, 32),
                     num_classes=6)
    np.testing.assert_allclose(np.asarray(w), np.asarray(s), atol=1e-5)


def test_slide_overlapping_windows():
    model = tiny_model()
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.integers(0, 255, (1, 48, 48, 3)), jnp.float32)
    s = slide_logits(model, vars_, img, crop_size=(32, 32), stride=(16, 16),
                     num_classes=6)
    assert s.shape == (1, 48, 48, 6)
    assert np.isfinite(np.asarray(s)).all()


def test_fpn_train_step_with_loss_decode_zoo():
    """FPN family train step (engine/train.py:make_train_step_fpn) with a
    composite loss_decode spec (ce + lovasz + ohem), the reference's
    list-of-losses decode_head knob (decode_head.py:115-128)."""
    from spike2former_tpu.engine.train import make_train_step_fpn
    from spike2former_tpu.models.fpn import FPNSegmentor

    model = FPNSegmentor(
        num_classes=5, embed_dim=(16, 32, 48, 64), backbone_heads=8, T=2,
        neck_channels=32, head_channels=16, neuron="multispike",
        depths_stage3=1, depths_stage4=1)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(
        model.init({"params": rng, "dropout": rng}, imgs, True)["params"])
    state = init_state(model, tx, rng, imgs)
    step = make_train_step_fpn(
        model, tx,
        loss_decode=(("ce", 1.0), ("lovasz", 0.5),
                     ("ohem", 0.4, {"thresh": 0.7, "min_kept": 64})))

    nprng = np.random.default_rng(1)
    images = jnp.asarray(nprng.integers(0, 255, (2, 32, 32, 3)),
                         jnp.float32)
    sem = np.asarray(nprng.integers(0, 5, (2, 32, 32)), np.int32)
    sem[0, :4] = 255
    state2, metrics = jax.jit(step)(state, images, jnp.asarray(sem))
    assert int(state2.step) == 1
    for key in ("total", "loss_ce", "loss_lovasz", "loss_ohem", "acc_seg"):
        assert np.isfinite(float(metrics[key])), key
    assert float(metrics["total"]) > 0
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        state2.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_cascade_segmentor_train_and_predict():
    """CascadeEncoderDecoder contract (cascade_encoder_decoder.py): stage 0
    sees features only, later stages refine (feats, prev_logits); training
    sums per-stage decode losses; predict uses the LAST stage."""
    from spike2former_tpu.engine.train import make_train_step_fpn
    from spike2former_tpu.models.cascade import CascadeSegmentor

    model = CascadeSegmentor(
        num_classes=5, num_stages=3, embed_dim=(16, 32, 48, 64),
        backbone_heads=8, T=2, neck_channels=32, head_channels=16,
        neuron="multispike", depths_stage3=1, depths_stage4=1)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(
        model.init({"params": rng, "dropout": rng}, imgs, True)["params"])
    state = init_state(model, tx, rng, imgs)
    step = make_train_step_fpn(model, tx, loss_decode=(("ce", 1.0),))

    nprng = np.random.default_rng(2)
    images = jnp.asarray(nprng.integers(0, 255, (2, 32, 32, 3)),
                         jnp.float32)
    sem = jnp.asarray(nprng.integers(0, 5, (2, 32, 32)), jnp.int32)
    state2, metrics = jax.jit(step)(state, images, sem)
    for i in range(3):
        assert np.isfinite(float(metrics[f"decode_{i}.loss_ce"])), i
    assert np.isfinite(float(metrics["total"]))

    # predict path: last stage, resized to input
    variables = {"params": state2.params,
                 "batch_stats": state2.batch_stats}
    logits = model.apply(variables, images,
                         method=CascadeSegmentor.predict_logits)
    assert logits.shape == (2, 32, 32, 5)
    assert np.isfinite(np.asarray(logits)).all()

    # stage outputs differ (refinement actually does something) and the
    # residual form keeps stage i close to stage i-1 at init
    outs = model.apply(variables, images)
    assert len(outs) == 3
    assert not np.array_equal(np.asarray(outs[0]), np.asarray(outs[1]))
