"""Unit tests for the spike/quantization core, with torch golden checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from spike2former_tpu.ops import (
    qspike, multispike_norm, multispike4, quant_ste,
    multistep_if, multistep_lif, multistep_qif,
)


def torch_quant(x: torch.Tensor, d: float) -> torch.Tensor:
    return torch.round(torch.clamp(x, 0.0, d))


@pytest.mark.parametrize("d,fn,div", [
    (8.0, qspike, 8.0),         # Q_IFNode: round(clamp(x,0,8))/8
    (4.0, multispike_norm, 4.0),  # SDTv3: round(clamp(x,0,4))/4
    (4.0, multispike4, 1.0),    # MultiSpike_4: round(clamp(x,0,4))
])
def test_quant_forward_matches_torch(d, fn, div):
    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 4.0, size=(64, 33)).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(x)))
    want = torch_quant(torch.from_numpy(x), d).numpy() / div
    np.testing.assert_allclose(got, want, atol=0, rtol=0)


def test_quant_values_are_levels():
    x = jnp.linspace(-2.0, 10.0, 97)
    y = qspike(x)
    levels = jnp.round(y * 8)
    np.testing.assert_allclose(np.asarray(y * 8), np.asarray(levels))
    assert float(y.min()) == 0.0 and float(y.max()) == 1.0


def test_ste_gradient_mask():
    x = jnp.asarray([-1.0, 0.0, 0.4, 3.9, 8.0, 8.5])
    g = jax.grad(lambda v: jnp.sum(qspike(v)))(x)
    # identity gradient (scaled by 1/8) inside [0, 8] inclusive, zero outside
    np.testing.assert_allclose(
        np.asarray(g), [0.0, 0.125, 0.125, 0.125, 0.125, 0.0])


def test_ste_gradient_matches_torch_autograd():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 4, size=(128,)).astype(np.float32)
    upstream = rng.normal(size=(128,)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    # reimplementation of the reference STE backward rule
    y = torch_quant(xt, 8.0)
    mask = ((xt >= 0) & (xt <= 8)).float()
    # torch golden: grad = upstream * mask (y has no grad path; apply manually)
    want = upstream * mask.detach().numpy()

    g = jax.grad(lambda v: jnp.sum(quant_ste(v, 8.0) * jnp.asarray(upstream)))(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-6)


def test_multistep_if_integrates():
    # constant sub-threshold input 0.4: IF fires every 3rd step (soft reset)
    t, shape = 9, (4,)
    x = jnp.full((t, *shape), 0.4)
    out = multistep_if(x, v_threshold=1.0, v_reset=None)
    spikes = np.asarray(out.spikes[:, 0])
    np.testing.assert_allclose(spikes, [0, 0, 1, 0, 1, 0, 0, 1, 0])


def test_multistep_lif_decays():
    t = 20
    x = jnp.full((t, 2), 0.3)
    out = multistep_lif(x, tau=2.0, v_threshold=1.0, v_reset=0.0)
    # LIF with decay_input: steady state v -> 0.3 < 1, never fires
    assert float(out.spikes.sum()) == 0.0
    assert float(out.v[0]) < 1.0


def test_multistep_qif_single_call_equals_qspike():
    # With fresh state and T folded into one call, Q_IF == qspike elementwise.
    rng = np.random.default_rng(2)
    x = rng.normal(0, 4, size=(1, 8, 8)).astype(np.float32)
    scanned = multistep_qif(jnp.asarray(x)).spikes[0]
    direct = qspike(jnp.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(direct))


def test_quant_grad_under_jit_and_vmap():
    f = jax.jit(jax.vmap(jax.grad(lambda v: qspike(v).sum())))
    x = jnp.asarray([[0.3, -1.0], [7.7, 9.0]])
    g = np.asarray(f(x))
    np.testing.assert_allclose(g, [[0.125, 0.0], [0.125, 0.0]])


def test_eif_neuron_matches_reference_charge():
    """EIF charge equation (neuron.py EIFNode:1422): V += (X + v_rest - V
    + dT*exp((V - theta_rh)/dT)) / tau, then fire/soft-or-hard reset."""
    import numpy as np

    from spike2former_tpu.ops.neuron import multistep_eif

    rng = np.random.default_rng(0)
    x = rng.normal(0.6, 0.5, (5, 3, 4)).astype(np.float32)
    tau, dT, th_rh, vth = 2.0, 1.0, 0.8, 1.0
    out = multistep_eif(jnp.asarray(x), tau=tau, delta_t=dT,
                        theta_rh=th_rh, v_threshold=vth, v_reset=0.0)

    v = np.zeros((3, 4), np.float32)
    spikes = []
    for t in range(5):
        v = v + (x[t] + 0.0 - v + dT * np.exp((v - th_rh) / dT)) / tau
        s = (v - vth >= 0).astype(np.float32)
        v = (1.0 - s) * v + s * 0.0
        spikes.append(s)
    np.testing.assert_allclose(np.asarray(out.spikes), np.stack(spikes),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.v), v, atol=1e-5)


def test_surrogate_zoo_gradients():
    """erf / soft_sign / piecewise_quadratic surrogate backward formulas
    (surrogate.py:166-181, 750-763, 1087-1103)."""
    import numpy as np

    from spike2former_tpu.ops.neuron import (
        erf_surrogate, piecewise_quadratic_surrogate, soft_sign_surrogate)

    v = jnp.asarray(np.linspace(-2, 2, 9), jnp.float32)
    a = 1.5
    g_erf = jax.vmap(jax.grad(lambda u: erf_surrogate(u, a)))(v)
    np.testing.assert_allclose(
        np.asarray(g_erf),
        np.exp(-(a * np.asarray(v)) ** 2) * a / np.sqrt(np.pi), rtol=1e-5)

    g_ss = jax.vmap(jax.grad(lambda u: soft_sign_surrogate(u, a)))(v)
    np.testing.assert_allclose(
        np.asarray(g_ss),
        1.0 / (2 * a * (1 / a + np.abs(np.asarray(v))) ** 2), rtol=1e-5)

    g_pq = jax.vmap(jax.grad(
        lambda u: piecewise_quadratic_surrogate(u, a)))(v)
    expect = a - a * a * np.abs(np.asarray(v))
    expect[np.abs(np.asarray(v)) > 1 / a] = 0.0
    np.testing.assert_allclose(np.asarray(g_pq), expect, rtol=1e-5)


def test_spiking_rnn_cells_semantics():
    """SpikingLSTM/GRU/VanillaRNN (rnn.py:496-881): binary heaviside
    states, LSTM c = c*f + i*g h = c*o recursion checked by hand."""
    from spike2former_tpu.ops.rnn import (SpikingGRU, SpikingLSTM,
                                          SpikingVanillaRNN)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (5, 2, 6)), jnp.float32)

    lstm = SpikingLSTM(hidden_size=4)
    vars_ = lstm.init(jax.random.PRNGKey(0), x)
    hs, (h, c) = lstm.apply(vars_, x)
    assert hs.shape == (5, 2, 4) and h.shape == (2, 4)
    # h = c*o with integer-accumulating c: nonneg integers, not binary
    vals = np.unique(np.asarray(hs))
    assert (vals >= 0).all() and np.allclose(vals, np.round(vals))

    # manual recursion with extracted weights
    p = vars_["params"]
    wih = np.asarray(p["linear_ih"]["kernel"])
    bih = np.asarray(p["linear_ih"]["bias"])
    whh = np.asarray(p["hh_kernel"])
    bhh = np.asarray(p["hh_bias"])
    hh = np.zeros((2, 4), np.float32)
    cc = np.zeros((2, 4), np.float32)
    xs = np.asarray(x)
    for t in range(5):
        gates = xs[t] @ wih + bih + hh @ whh + bhh
        i, f, g, o = np.split(gates, 4, axis=-1)
        i, f, g, o = [(v >= 0).astype(np.float32) for v in (i, f, g, o)]
        cc = cc * f + i * g
        hh = cc * o
    np.testing.assert_allclose(np.asarray(h), hh)
    np.testing.assert_allclose(np.asarray(c), cc)

    for mod in (SpikingGRU(hidden_size=4), SpikingVanillaRNN(hidden_size=4)):
        vars_ = mod.init(jax.random.PRNGKey(1), x)
        hs, _ = mod.apply(vars_, x)
        assert hs.shape == (5, 2, 4)
        assert np.isfinite(np.asarray(hs)).all()

    # gradients flow through the surrogates (no dead graph)
    def loss(params):
        out, _ = lstm.apply({"params": params}, x)
        return jnp.sum(out)

    grads = jax.grad(loss)(vars_ if False else p)
    assert max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(grads)) > 0
