"""Lava/Loihi export (reference: Qtrick_architecture/clock_driven/
lava_exchange.py): quantizers, CUBA parameter mapping, netx HDF5."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spike2former_tpu.lava_exchange import (
    conv_to_synapse, export_hdf5, linear_to_synapse, quantize_8bit,
    step_quantize, to_cuba_params)


def test_step_quantize_values_and_ste():
    x = jnp.asarray([-1.3, -0.4, 0.0, 0.6, 2.49, 2.51])
    np.testing.assert_allclose(
        np.asarray(step_quantize(x, 1.0)), [-1, 0, 0, 1, 2, 3])
    np.testing.assert_allclose(
        np.asarray(step_quantize(x, 2.0)), [-2, 0, 0, 0, 2, 2])
    g = jax.grad(lambda x: jnp.sum(step_quantize(x, 2.0) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)  # straight-through

    q = quantize_8bit(jnp.asarray([0.031, -10.0, 10.0]), scale=64)
    np.testing.assert_allclose(np.asarray(q),
                               [0.03125, -256 / 64, 255 / 64])


def test_cuba_params_and_validity():
    p_if = to_cuba_params("if", v_threshold=0.5)
    assert p_if["voltage_decay"] == 0.0 and p_if["current_decay"] == 1.0
    p_lif = to_cuba_params("lif", tau=4.0, v_reset=None)
    assert p_lif["voltage_decay"] == 0.25
    with pytest.raises(ValueError):
        to_cuba_params("if", v_reset=0.3)
    with pytest.raises(ValueError):
        to_cuba_params("lif", decay_input=True)
    with pytest.raises(NotImplementedError):
        to_cuba_params("eif")


def test_synapse_layouts():
    k = jnp.arange(12.0).reshape(3, 4)  # [in, out]
    w = linear_to_synapse(k)
    assert w.shape == (4, 3)
    np.testing.assert_allclose(w, np.asarray(k).T)
    with pytest.raises(ValueError):
        linear_to_synapse(k, bias=jnp.zeros(4))

    kc = jnp.arange(2 * 3 * 4 * 5.0).reshape(2, 3, 4, 5)  # HWIO
    wc = conv_to_synapse(kc)
    assert wc.shape == (5, 4, 2, 3)  # OIHW
    np.testing.assert_allclose(wc[1, 2, 0, 1], np.asarray(kc)[0, 1, 2, 1])


def test_export_hdf5_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(0)
    dense_w = linear_to_synapse(jnp.asarray(rng.normal(0, 1, (8, 4)),
                                            jnp.float32))
    conv_w = conv_to_synapse(jnp.asarray(rng.normal(0, 1, (3, 3, 2, 6)),
                                         jnp.float32))
    path = str(tmp_path / "net.h5")
    export_hdf5([
        {"type": "input", "shape": (8, 8, 2)},
        {"type": "conv", "weight": conv_w, "stride": 2, "padding": 1,
         "neuron": to_cuba_params("lif", tau=2.0), "shape": (4, 4, 6)},
        {"type": "dense", "weight": dense_w,
         "neuron": to_cuba_params("if")},
    ], path, t_sample=16)

    with h5py.File(path, "r") as f:
        assert int(f["simulation/tSample"][()]) == 16
        assert f["layer/0/type"][()] == b"input"
        c = f["layer/1"]
        assert c["type"][()] == b"conv"
        assert tuple(c["kernelSize"][:]) == (3, 3)
        assert int(c["stride"][()]) == 2
        assert int(c["neuron/vDecay"][()]) == 2048  # 1/tau * 4096
        # written weights are 8-bit step-quantized (descale): integers
        w = c["weight"][:]
        assert w.shape == (6, 2, 3, 3)
        frac = np.abs(w / 2.0 - np.round(w / 2.0))
        assert frac.max() < 1e-5
        d = f["layer/2"]
        assert int(d["inFeatures"][()]) == 8
        assert int(d["outFeatures"][()]) == 4
        assert int(d["neuron/vDecay"][()]) == 0
