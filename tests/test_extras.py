"""Encoders, temporal BN, optimizer groups, checkpoint round-trip."""
import jax
import jax.numpy as jnp
import numpy as np

from spike2former_tpu.ops.encoding import (
    latency_encode, poisson_encode, repeat_encode)
from spike2former_tpu.models.tebn import TEBN, TDBN


def test_poisson_rate():
    x = jnp.full((1000,), 0.3)
    s = poisson_encode(x, 64, jax.random.PRNGKey(0))
    assert abs(float(s.mean()) - 0.3) < 0.02
    assert set(np.unique(np.asarray(s))) <= {0.0, 1.0}


def test_latency_single_spike():
    x = jnp.asarray([0.0, 0.5, 1.0])
    s = latency_encode(x, 5)
    np.testing.assert_array_equal(np.asarray(s.sum(0)), [1, 1, 1])
    assert float(s[0, 2]) == 1.0  # strongest spikes first
    assert float(s[4, 0]) == 1.0  # weakest spikes last


def test_repeat_encode():
    x = jnp.ones((2, 3))
    s = repeat_encode(x, 4)
    assert s.shape == (4, 2, 3) and float(s.mean()) == 1.0


def test_tebn_tdbn_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 8, 8, 16))
    for mod in (TEBN(T=4), TDBN(v_threshold=1.0)):
        v = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(v, x)
        assert y.shape == x.shape


def test_optimizer_param_groups():
    import optax

    from spike2former_tpu.engine.optim import make_optimizer

    params = {
        "backbone": {"conv": {"kernel": jnp.ones((4,))}},
        "head": {"query_embed": jnp.ones((4,)),
                 "dense": {"kernel": jnp.ones((4,))}},
    }
    tx = make_optimizer(params, base_lr=1.0, warmup_iters=0, total_iters=10,
                        clip_norm=1e9)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # backbone lr is 0.1x default group lr
    bb = float(updates["backbone"]["conv"]["kernel"][0])
    hd = float(updates["head"]["dense"]["kernel"][0])
    assert abs(bb / hd - 0.1) < 1e-5


def test_checkpoint_roundtrip(tmp_path):
    from spike2former_tpu.engine.checkpoint import (
        latest_checkpoint, restore_state, save_state)

    state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
    save_state(str(tmp_path), state, 7)
    path = latest_checkpoint(str(tmp_path))
    assert path and path.endswith("ckpt_7")
    restored = restore_state(path, state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  [0, 1, 2, 3])


def test_checkpoint_retention_and_async(tmp_path):
    """Async periodic saves with max_keep_ckpts-style retention: oldest
    pruned, newest restorable, in-flight saves serialized."""
    import os

    from spike2former_tpu.engine.checkpoint import (
        latest_checkpoint, prune_checkpoints, restore_state, save_state)

    wd = str(tmp_path)
    for step in (1, 2):
        state = {"params": {"w": jnp.full((4,), float(step))}}
        save_state(wd, state, step, keep=2)  # async
    state3 = {"params": {"w": jnp.full((4,), 3.0)}}
    save_state(wd, state3, 3, keep=2, wait=True)

    names = sorted(d for d in os.listdir(wd) if d.startswith("ckpt_"))
    assert names == ["ckpt_2", "ckpt_3"], names
    assert latest_checkpoint(wd).endswith("ckpt_3")
    restored = restore_state(os.path.join(wd, "ckpt_2"), state3)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), 2.0)

    # direct prune: protect wins over age
    save_state(wd, state3, 4, wait=True)
    protected = os.path.join(wd, "ckpt_2")
    removed = prune_checkpoints(wd, 1, protect={protected})
    left = sorted(d for d in os.listdir(wd) if d.startswith("ckpt_"))
    assert left == ["ckpt_2", "ckpt_4"], (left, removed)


def test_torch_conv_conversion():
    import torch

    from spike2former_tpu.engine.checkpoint import (
        convert_torch_conv, convert_torch_linear)

    w = np.random.default_rng(0).normal(size=(8, 4, 3, 3)).astype(np.float32)
    x = np.random.default_rng(1).normal(size=(1, 4, 8, 8)).astype(np.float32)
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()

    import jax.numpy as jnp
    from flax import linen as nn

    conv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    variables = {"params": {"kernel": jnp.asarray(convert_torch_conv(w))}}
    got = conv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), want, atol=1e-4, rtol=1e-4)

    wl = np.random.default_rng(2).normal(size=(6, 4)).astype(np.float32)
    xl = np.random.default_rng(3).normal(size=(2, 4)).astype(np.float32)
    want = xl @ wl.T
    got = jnp.asarray(xl) @ jnp.asarray(convert_torch_linear(wl))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_scalar_logger_roundtrip(tmp_path):
    from spike2former_tpu.engine.logging import ScalarLogger, read_scalars

    log = ScalarLogger(str(tmp_path))
    log.log(1, total=5.0)
    log.log(2, total=4.0, acc=0.5)
    log.close()
    recs = read_scalars(log.path)
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[1]["acc"] == 0.5


def test_sine_positional_encoding_matches_torch():
    """DETR sine PE vs an independent torch implementation of the same
    formula (positional_encoding.py:59-97 semantics)."""
    import math

    import torch

    from spike2former_tpu.models.positional import sine_positional_encoding

    b, h, w, nf = 2, 5, 7, 8
    mask = np.zeros((b, h, w), np.float32)
    mask[1, 3:, :] = 1  # padded region in image 1

    got = np.asarray(sine_positional_encoding(jnp.asarray(mask), nf))

    mt = torch.from_numpy(mask).int()
    not_mask = 1 - mt
    y = not_mask.cumsum(1, dtype=torch.float32)
    x = not_mask.cumsum(2, dtype=torch.float32)
    scale = 2 * math.pi
    y = y / (y[:, -1:, :] + 1e-6) * scale
    x = x / (x[:, :, -1:] + 1e-6) * scale
    dim_t = torch.arange(nf, dtype=torch.float32)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / nf)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()),
                     dim=4).view(b, h, w, -1)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()),
                     dim=4).view(b, h, w, -1)
    want = torch.cat((py, px), dim=3).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_flat_adamw_matches_pytree_chain():
    """The fused flat AdamW (make_optimizer default) must reproduce the
    optax multi_transform chain step-for-step: same updates, including
    group lr multipliers, zero-wd embeds, global-norm clipping, warmup."""
    from spike2former_tpu.engine.optim import make_optimizer

    rng = np.random.default_rng(7)
    params = {
        "backbone": {"conv": {"kernel": jnp.asarray(
            rng.normal(size=(3, 5)), jnp.float32)}},
        "head": {"query_embed": jnp.asarray(rng.normal(size=(8,)),
                                            jnp.float32),
                 "dense": {"kernel": jnp.asarray(rng.normal(size=(5, 2)),
                                                 jnp.float32),
                           "bias": jnp.asarray(rng.normal(size=(2,)),
                                               jnp.float32)}},
    }
    kw = dict(base_lr=0.01, weight_decay=0.005, backbone_lr_mult=0.1,
              clip_norm=0.5, warmup_iters=3, total_iters=20)
    tx_ref = make_optimizer(params, flat=False, **kw)
    tx_flat = make_optimizer(params, flat=True, **kw)
    s_ref, s_flat = tx_ref.init(params), tx_flat.init(params)
    p_ref = p_flat = params
    import optax

    for step in range(6):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape) * (step + 1),
                                  jnp.float32), params)
        u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
        u_flat, s_flat = tx_flat.update(grads, s_flat, p_flat)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_flat = optax.apply_updates(p_flat, u_flat)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8),
            p_ref, p_flat)


def test_flat_adamw_layer_decay_matches():
    from spike2former_tpu.engine.optim import make_optimizer

    params = {"backbone": {"block1_2": {"w": jnp.ones((4,))},
                           "down2": {"w": jnp.ones((4,))}},
              "head": {"w": jnp.ones((4,))}}
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 0.3), params)
    outs = []
    for flat in (False, True):
        tx = make_optimizer(params, base_lr=1.0, warmup_iters=0,
                            total_iters=10, clip_norm=1e9,
                            layer_decay_rate=0.9, flat=flat)
        u, _ = tx.update(grads, tx.init(params), params)
        outs.append(u)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6),
        outs[0], outs[1])
