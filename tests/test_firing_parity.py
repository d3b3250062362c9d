"""Firing-rate parity vs the torch golden (the BASELINE.md energy proxy).

The reference measures per-site firing as ``output.mean() * quant / iter``
via forward hooks on every Q_IFNode (tools/cal_firing_num.py:140-174).
Here the same statistic is sow'n by every ``Spike`` site
(models/layers.py / utils/firing.py).  This harness records EVERY q8 call
in the torch golden (the golden's single spike primitive — quant 8
everywhere in the sdtv2 family) for one image and asserts the flax model's
sow'n rates match it site-for-site as a multiset: equal site COUNT (no
spike site silently missed or double-counted) and equal VALUES (same
statistic on the same activations).  Multiset equality is the exact
strength the energy claim needs — its aggregate is the mean over sites
(utils/firing.py energy_proxy), which is permutation-invariant.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from spike2former_tpu.engine.convert import convert_spike2former
from spike2former_tpu.models import Spike2Former
from spike2former_tpu.utils.firing import energy_proxy, firing_rates

import torch_golden as tg
from torch_golden import GoldenSpike2Former, randomize_torch

CFG = dict(num_classes=5, embed_dim=(8, 16, 24, 32), backbone_heads=4,
           feat_channels=16, num_queries=4, num_decoder_layers=2,
           num_encoder_layers=2, depths_stage3=1, depths_stage4=1,
           dcn_group=4)
QUANT = 8.0  # every sdtv2-family site is a q8 / qspike (D = 8) neuron


def test_firing_rates_match_torch_golden(monkeypatch):
    golden = GoldenSpike2Former(
        num_classes=CFG["num_classes"], embed_dim=CFG["embed_dim"],
        heads=CFG["backbone_heads"], T=1, feat=CFG["feat_channels"],
        num_queries=CFG["num_queries"], dec_layers=CFG["num_decoder_layers"],
        enc_layers=CFG["num_encoder_layers"], group=CFG["dcn_group"],
        depths_stage3=CFG["depths_stage3"],
        depths_stage4=CFG["depths_stage4"])
    randomize_torch(golden, seed=5)
    sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}
    converted = convert_spike2former(
        sd, depths_stage3=CFG["depths_stage3"],
        depths_stage4=CFG["depths_stage4"],
        num_encoder_layers=CFG["num_encoder_layers"],
        num_decoder_layers=CFG["num_decoder_layers"])

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 3, 32, 32)).astype(np.float32)

    # ---- torch: hook every q8 call (the reference's Q_IFNode hook) ----
    torch_stats = []
    orig_q8 = tg.q8

    def recording_q8(v):
        y = orig_q8(v)
        torch_stats.append(float(y.detach().float().mean()) * QUANT)
        return y

    monkeypatch.setattr(tg, "q8", recording_q8)
    with torch.no_grad():
        golden(torch.from_numpy(x))
    monkeypatch.setattr(tg, "q8", orig_q8)
    assert torch_stats, "golden recorded no spike sites"

    # ---- flax: sow'n rates from the converted model ----
    # eval_last_only=False: the torch hooks see every decoder layer go
    # through the SDME spike sites, even the ones inference discards
    model = Spike2Former(T=1, compat=True, eval_last_only=False, **CFG)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    rates = firing_rates(model, converted, x_j)
    flax_stats = {k: v for k, v in rates.items() if k.endswith("rate")}
    assert flax_stats, "flax model sowed no spike sites"

    # coverage: every torch spike site has exactly one flax sow site
    assert len(flax_stats) == len(torch_stats), (
        f"site count mismatch: flax {len(flax_stats)} vs torch "
        f"{len(torch_stats)}")

    # values: same multiset of per-site statistics
    got = np.sort(np.asarray(list(flax_stats.values())))
    want = np.sort(np.asarray(torch_stats))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    # and therefore the same energy-proxy aggregate
    np.testing.assert_allclose(
        energy_proxy(flax_stats), float(np.mean(torch_stats)), rtol=1e-4)


def test_nonfire_statistic_semantics():
    """The Monitor's second statistic: fraction of exactly-zero outputs."""
    from spike2former_tpu.models.layers import Spike

    x = jnp.asarray([[-1.0, 0.2, 0.9, 5.0]])  # q8: 0, 0.25, 1, 5 -> /8
    m = Spike("qspike")
    y, aux = m.init_with_output({"params": jax.random.PRNGKey(0)}, x,
                                capture_intermediates=False,
                                mutable=["spikes"])
    rate = float(aux["spikes"]["rate"][0])
    nonfire = float(aux["spikes"]["nonfire"][0])
    want_y = np.round(np.clip([-1.0, 0.2, 0.9, 5.0], 0, 8)) / 8
    np.testing.assert_allclose(rate, want_y.mean() * 8, rtol=1e-6)
    np.testing.assert_allclose(nonfire, (want_y == 0).mean(), rtol=1e-6)
