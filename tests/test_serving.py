"""Serving queue tests: concurrent single-image requests are micro-batched
per resolution bucket, predictions match the unbatched path, and latency
statistics are reported."""
import threading

import numpy as np
import pytest

import spike2former_tpu.serving as serving
from spike2former_tpu.api import init_model
from spike2former_tpu.engine.config import (Config, DataConfig, ModelConfig,
                                            TestConfig, TrainConfig)
from spike2former_tpu.serving import ServingEngine, _resize_bilinear_np


def _tiny_cfg():
    return Config(
        name="tiny-serve",
        model=ModelConfig(
            num_classes=5, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=1,
            feat_channels=16, num_queries=4, num_decoder_layers=1,
            num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
            dcn_group=4),
        data=DataConfig(dataset="ade20k", crop_size=(64, 64),
                        test_scale=(128, 96)),
        train=TrainConfig(), test=TestConfig())


@pytest.fixture(scope="module")
def tiny_im():
    return init_model(_tiny_cfg())


def test_resize_bilinear_np_matches_device():
    from spike2former_tpu.ops.resize import resize_bilinear
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (13, 9, 4)).astype(np.float32)
    want = np.asarray(resize_bilinear(jnp.asarray(x[None]), (20, 17))[0])
    got = _resize_bilinear_np(x, (20, 17))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_serving_batches_and_matches_unbatched(tiny_im, monkeypatch):
    rng = np.random.default_rng(3)
    # two distinct original sizes -> (after keep-ratio resize + bucket pad)
    # still a single worker pipeline; batch sizes padded to powers of two
    images = [rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
              for _ in range(6)]
    images += [rng.integers(0, 255, (60, 45, 3)).astype(np.uint8)
               for _ in range(2)]

    calls = []
    real = serving.whole_logits

    def counting(model, variables, batch, valid_hw=None):
        calls.append(int(batch.shape[0]))
        return real(model, variables, batch, valid_hw=valid_hw)

    monkeypatch.setattr(serving, "whole_logits", counting)

    eng = ServingEngine(None, model=tiny_im, max_batch=4, bucket=64,
                        wait_ms=100.0)
    try:
        futs = [eng.submit(im) for im in images]
        preds = [f.result(timeout=300) for f in futs]
    finally:
        eng.close()

    for im, pred in zip(images, preds):
        assert pred.shape == im.shape[:2]
        assert pred.dtype == np.int32
        assert int(pred.max()) < 5

    # micro-batching actually happened: fewer forwards than requests
    assert len(calls) < len(images), calls
    assert max(calls) > 1, calls

    st = eng.stats()
    assert st["requests"] == len(images)
    assert st["p50_ms"] > 0 and st["p99_ms"] >= st["p50_ms"]

    # unbatched reference: same engine machinery at max_batch=1
    eng1 = ServingEngine(None, model=tiny_im, max_batch=1, bucket=64,
                         wait_ms=1.0)
    try:
        preds1 = [eng1.submit(im).result(timeout=300) for im in images]
    finally:
        eng1.close()
    for p_b, p_1 in zip(preds, preds1):
        agree = float((p_b == p_1).mean())
        assert agree >= 0.99, agree


def test_serving_concurrent_submitters(tiny_im):
    rng = np.random.default_rng(7)
    eng = ServingEngine(None, model=tiny_im, max_batch=4, bucket=64,
                        wait_ms=20.0)
    imgs = [rng.integers(0, 255, (80 + i % 3 * 8, 100, 3)).astype(np.uint8)
            for i in range(6)]
    results = {}
    errs = []

    def client(i):
        try:
            results[i] = (imgs[i].shape[:2], eng(imgs[i]))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    eng.close()
    assert not errs, errs
    assert len(results) == 6
    for shape, pred in results.values():
        assert pred.shape == shape

    # closed engine rejects new work
    with pytest.raises(RuntimeError):
        eng.submit(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
