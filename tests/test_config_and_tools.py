"""Config sweep + firing-rate + FLOPs utility tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spike2former_tpu.engine.config import (
    PRESETS, apply_overrides, build_model, get_config)
from spike2former_tpu.models import Spike2Former
from spike2former_tpu.utils import (
    count_params, fast_variables, firing_rates)


def test_all_presets_buildable():
    """Config-sweep constructibility (the reference's tests/test_config.py
    pattern): every preset must build a model object."""
    for name in PRESETS:
        cfg = get_config(name)
        model = build_model(cfg.model)
        assert model is not None, name


def test_overrides():
    cfg = get_config("SDTv2_maskformer_DCNpixelDecoder_ade20k",
                     ["model.T=4", "train.total_iters=100",
                      "data.dataset=ade20k"])
    assert cfg.model.T == 4 and cfg.train.total_iters == 100


@pytest.fixture(scope="module")
def tiny():
    model = Spike2Former(
        num_classes=5, embed_dim=(8, 16, 24, 32), backbone_heads=4, T=1,
        feat_channels=16, num_queries=4, num_decoder_layers=1,
        num_encoder_layers=1, depths_stage3=1, depths_stage4=1, dcn_group=4)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    return model, vars_, x


def test_firing_rates_api(tiny):
    model, vars_, x = tiny
    rates = firing_rates(model, vars_, x)
    assert len(rates) > 30
    assert all(np.isfinite(v) and v >= 0 for v in rates.values())


def test_fast_variables_match_init_structure(tiny):
    model, vars_, x = tiny
    fv = fast_variables(model, x)
    s1 = jax.tree_util.tree_structure(jax.device_get(vars_))
    s2 = jax.tree_util.tree_structure(jax.device_get(fv))
    assert s1 == s2
    assert count_params(fv) == count_params(vars_)


def test_count_params_positive(tiny):
    _, vars_, _ = tiny
    assert count_params(vars_) > 1000


def test_nonfire_ratio_stat(tiny):
    """Monitor's non-fire-ratio statistic (monitor.py:11-220) is sown at
    every spike site alongside the firing rate."""
    import numpy as np

    from spike2former_tpu.utils.firing import _flatten

    model, variables, images = tiny
    _, aux = model.apply(variables, images, mutable=["spikes"])
    flat = _flatten(aux["spikes"])
    nonfire = {k: float(np.asarray(v[0] if isinstance(v, tuple) else v))
               for k, v in flat.items() if k.endswith("nonfire")}
    assert nonfire, "no nonfire stats recorded"
    assert all(0.0 <= v <= 1.0 for v in nonfire.values())
