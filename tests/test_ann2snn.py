"""ANN→SNN conversion (reference: Qtrick_architecture/clock_driven/
ann2snn/converter.py): rate-coded soft-reset IF networks must
approximate the source ReLU ANN, improving with T."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from spike2former_tpu.ann2snn import AnnSequential, Converter


def _toy_ann():
    layers = (
        nn.Conv(8, (3, 3), padding="SAME"),
        "relu",
        nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME"),
        "relu",
        lambda x: x.reshape(x.shape[0], -1),
        nn.Dense(10),
    )
    return AnnSequential(layers=layers)


def _flatten_ok():
    # plain callables in the layer list must work in both modes
    return None


def test_converter_snn_approximates_ann():
    rng = np.random.default_rng(0)
    ann = _toy_ann()
    x0 = jnp.asarray(rng.uniform(0, 1, (4, 8, 8, 3)), jnp.float32)
    variables = ann.init(jax.random.PRNGKey(0), x0)

    batches = [jnp.asarray(rng.uniform(0, 1, (4, 8, 8, 3)), jnp.float32)
               for _ in range(3)]
    snn_apply, scales = Converter(mode="max").convert(
        ann, variables, batches)
    assert len(scales) == 2 and all(s > 0 for s in scales)

    y_ann = ann.apply(variables, x0)
    errs = {}
    for t in (8, 128):
        y_snn = jax.jit(lambda x, t=t: snn_apply(x, t=t))(x0)
        errs[t] = float(jnp.mean(jnp.abs(y_snn - y_ann))
                        / (jnp.mean(jnp.abs(y_ann)) + 1e-8))
    # rate coding converges toward the ANN as T grows
    assert errs[128] < errs[8]
    assert errs[128] < 0.15, errs
    # argmax (classification) agreement at T=128
    y128 = jax.jit(lambda x: snn_apply(x, t=128))(x0)
    agree = np.mean(np.asarray(jnp.argmax(y128, -1))
                    == np.asarray(jnp.argmax(y_ann, -1)))
    assert agree >= 0.75, agree


def test_converter_percentile_mode():
    rng = np.random.default_rng(1)
    ann = AnnSequential(layers=(nn.Dense(16), "relu", nn.Dense(4)))
    x0 = jnp.asarray(rng.normal(0, 1, (32, 8)), jnp.float32)
    variables = ann.init(jax.random.PRNGKey(0), x0)

    c_max = Converter(mode="max")
    c_p = Converter(mode="99.9%")
    s_max = c_max.calibrate(ann, variables, [x0])
    s_p = c_p.calibrate(ann, variables, [x0])
    assert s_p[0] <= s_max[0]
    # float mode equivalent to the percent string
    s_f = Converter(mode=0.999).calibrate(ann, variables, [x0])
    np.testing.assert_allclose(s_f, s_p, rtol=1e-6)

    with pytest.raises(ValueError):
        Converter(mode="bogus").calibrate(ann, variables, [x0])
    with pytest.raises(ValueError):
        Converter(mode=1.5).calibrate(ann, variables, [x0])
