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
