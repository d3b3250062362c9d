"""Default-tier e2e smoke: one tiny train step + one whole-mode predict.

The round-5 re-tiering (tests/conftest.py SLOW_ROSTER) moved the heavy
train/eval/parity tests into the slow tier so the default suite finishes
in < 5 min single-core.  This single compact test keeps genuine
end-to-end coverage (train step runs, loss finite, params move; predict
produces a valid class map) in the default tier.  Everything deeper —
convergence, parity, sharding, checkpointing — lives in the slow tier
(tools/run_tests.sh slow, run once per round).
"""
import jax
import jax.numpy as jnp
import numpy as np

from spike2former_tpu.engine import init_state, make_optimizer, make_train_step
from spike2former_tpu.models import Spike2Former


def test_train_then_predict_smoke():
    model = Spike2Former(
        num_classes=4, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=1,
        feat_channels=16, num_queries=4, num_decoder_layers=1,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1, dcn_group=4)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, 4, (2, 32, 32)), jnp.int32)

    tx = make_optimizer(model.init(jax.random.PRNGKey(0), images, True)["params"])
    state = init_state(model, tx, jax.random.PRNGKey(0), images)
    step = jax.jit(make_train_step(model, tx, num_classes=4, max_gt=8))
    state2, metrics = step(state, images, sem)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["total"]))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    # eval-mode forward through the model's own semantic-inference tail
    # (whole_logits/postprocess live in the slow tier's e2e tests — a
    # second full jit compile here would double this test's wall time)
    variables = {"params": state2.params, "batch_stats": state2.batch_stats}
    from spike2former_tpu.engine.train import preprocess
    seg = model.apply(variables, preprocess(images),
                      method=model.predict_logits)  # [B, H, W, K]
    assert seg.shape == (2, 32, 32, 4)
    assert np.isfinite(np.asarray(seg)).all()
    pred = np.asarray(jnp.argmax(seg, axis=-1))
    assert pred.min() >= 0 and pred.max() < 4
