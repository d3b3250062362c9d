"""Tensor-parallel sharding (parallel/tp.py): GSPMD column/row-parallel
FFNs over the ``model`` mesh axis must reproduce the replicated model.

The reference is DDP-only (tools/dist_train.sh); TP here is the TPU-native
capability for larger widths — parameters are annotated with
PartitionSpecs and XLA inserts the Megatron-style psum (no hand-written
collectives to test, only numerics)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from spike2former_tpu.engine import init_state, make_optimizer, make_train_step
from spike2former_tpu.models import Spike2Former
from spike2former_tpu.parallel import make_mesh, tp_shardings
from spike2former_tpu.parallel.tp import shard_params_tp, tp_pspec

NUM_CLASSES = 6


def _tiny_model():
    return Spike2Former(
        num_classes=NUM_CLASSES, embed_dim=(8, 16, 24, 32),
        backbone_heads=4, T=1, feat_channels=16, num_queries=8,
        num_decoder_layers=2, num_encoder_layers=1, depths_stage3=1,
        depths_stage4=1, dcn_group=4)


def test_tp_rules_hit_ffns():
    """The rules must actually shard the FFN hidden axes (a no-op ruleset
    would pass the parity tests vacuously)."""
    model = _tiny_model()
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, True)
    mesh = make_mesh(8, model_axis=2)
    sh = tp_shardings(variables["params"], mesh)

    specs = []
    jax.tree_util.tree_map_with_path(
        lambda path, s: specs.append(
            ("/".join(str(getattr(p, 'key', p)) for p in path), s.spec)),
        sh)
    sharded = [p for p, spec in specs if any(a == "model" for a in spec)]
    assert any("ffn/Conv_0/kernel" in p for p in sharded), sharded[:5]
    assert any("ffn/Conv_1/kernel" in p for p in sharded)
    assert any("ffn/BatchNorm_0" in p for p in sharded)
    assert any("mask_embed/Dense_0/kernel" in p for p in sharded)
    # output-side params stay replicated
    assert not any("Conv_1/bias" in p for p in sharded)
    assert not any("BatchNorm_1" in p for p in sharded)


def test_tp_forward_parity():
    model = _tiny_model()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, True)

    ref = model.apply(variables, x, method=Spike2Former.predict_logits)

    mesh = make_mesh(8, model_axis=2)  # data 4 x model 2
    params_sh = shard_params_tp(variables["params"], mesh)
    stats_sh = shard_params_tp(variables["batch_stats"], mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    fwd = jax.jit(lambda p, s, im: model.apply(
        {"params": p, "batch_stats": s}, im,
        method=Spike2Former.predict_logits))
    got = fwd(params_sh, stats_sh, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_train_step_runs_and_matches():
    model = _tiny_model()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(120, 40, (4, 32, 32, 3)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, NUM_CLASSES, (4, 32, 32)), jnp.int32)

    tx = make_optimizer(model.init(jax.random.PRNGKey(0), x, True)["params"])
    state = init_state(model, tx, jax.random.PRNGKey(0), x)
    step = make_train_step(model, tx, num_classes=NUM_CLASSES, max_gt=8,
                           compact_gt=4)

    ref_state, ref_metrics = jax.jit(step)(state, x, sem)

    mesh = make_mesh(8, model_axis=2)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_sh = state._replace(
        params=shard_params_tp(state.params, mesh),
        batch_stats=shard_params_tp(state.batch_stats, mesh),
        opt_state=jax.device_put(state.opt_state, repl),
        step=jax.device_put(state.step, repl))
    new_state, metrics = jax.jit(step)(
        state_sh, jax.device_put(x, data), jax.device_put(sem, data))

    np.testing.assert_allclose(float(metrics["total"]),
                               float(ref_metrics["total"]),
                               rtol=1e-4)
    # post-step params match the replicated run (reduction-order tolerance)
    leaves_ref = jax.tree_util.tree_leaves(ref_state.params)
    leaves_tp = jax.tree_util.tree_leaves(new_state.params)
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(leaves_ref, leaves_tp))
    assert worst < 5e-3, worst


def test_tp_pspec_indivisible_falls_back():
    """Widths not divisible by the axis stay replicated (correctness over
    coverage)."""

    class FakeKey:
        def __init__(self, k):
            self.key = k

    path = tuple(FakeKey(k) for k in
                 ("head", "pixel_decoder", "encoder_0", "ffn", "Conv_0",
                  "kernel"))
    spec = tp_pspec(path, jnp.zeros((1, 16, 1023)), 2)
    assert spec == P()
