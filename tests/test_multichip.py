"""Multi-device tests on the 8-way virtual CPU mesh."""
import sys

import jax
import jax.numpy as jnp
import numpy as np


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_data_parallel_eval_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spike2former_tpu.models import Spike2Former
    from spike2former_tpu.parallel import make_mesh

    model = Spike2Former(
        num_classes=4, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=1,
        feat_channels=16, num_queries=4, num_decoder_layers=1,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
        dcn_group=4)
    x = jnp.zeros((8, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)

    single = model.apply(vars_, imgs, method=Spike2Former.predict_logits)

    mesh = make_mesh(8)
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda v, im: model.apply(v, im, method=Spike2Former.predict_logits),
        in_shardings=(repl, data_sh), out_shardings=data_sh)
    sharded = fn(jax.device_put(vars_, repl), jax.device_put(imgs, data_sh))
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), atol=1e-5)


def test_spatial_sharding_matches_replicated():
    """H-axis spatial partitioning (halo exchange via GSPMD) must be
    numerically identical to the unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spike2former_tpu.models import Spike2Former
    from spike2former_tpu.parallel import make_mesh
    from spike2former_tpu.parallel.mesh import spatial_sharding

    model = Spike2Former(
        num_classes=4, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=1,
        feat_channels=16, num_queries=4, num_decoder_layers=1,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
        dcn_group=4)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)

    plain = model.apply(vars_, imgs, method=Spike2Former.predict_logits)

    mesh = make_mesh(8)
    sp = spatial_sharding(mesh)
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda v, im: model.apply(v, im, method=Spike2Former.predict_logits),
        in_shardings=(repl, sp), out_shardings=sp)
    sharded = fn(jax.device_put(vars_, repl), jax.device_put(imgs, sp))
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(sharded), atol=2e-5)


def test_point_loss_train_step_data_parallel():
    """The point-sampled loss path (losses/point_sample.py: top_k,
    take_along_axis gathers, per-layer RNG splits) must compile and run
    under a data-parallel mesh, and produce the same loss as the
    unsharded step (the coords derive from fold_in(seed, step), so the
    program is deterministic across shardings up to reduction order)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spike2former_tpu.engine import (init_state, make_optimizer,
                                         make_train_step)
    from spike2former_tpu.models import Spike2Former
    from spike2former_tpu.parallel import make_mesh

    model = Spike2Former(
        num_classes=4, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=1,
        feat_channels=16, num_queries=4, num_decoder_layers=1,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
        dcn_group=4)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (8, 32, 32, 3)), jnp.float32)
    sem = jnp.asarray(rng.integers(0, 4, (8, 32, 32)), jnp.int32)

    norm = (imgs - 127.5) / 58.0
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), norm, True)["params"],
        base_lr=1e-3, warmup_iters=2, total_iters=10)
    state0 = init_state(model, tx, jax.random.PRNGKey(0), norm)
    step = make_train_step(model, tx, num_classes=4, max_gt=4,
                           num_points=32, seed=0)

    _, m_single = jax.jit(step)(state0, imgs, sem)

    mesh = make_mesh(8)
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sharded_step = jax.jit(step, in_shardings=(repl, data_sh, data_sh))
    _, m_shard = sharded_step(
        jax.device_put(state0, repl), jax.device_put(imgs, data_sh),
        jax.device_put(sem, data_sh))
    # point_sample's selector-matmul formulation accumulates in whatever
    # order GSPMD partitions the einsum, so sharded f32 sums drift ~1e-4
    # relative vs the single-device program (benign; the scalar-gather
    # formulation it replaced was order-identical but 70x slower on TPU)
    np.testing.assert_allclose(float(m_shard["total"]),
                               float(m_single["total"]), rtol=1e-3)
