"""Hungarian matching with mask-classification costs.

Reference: mmdet/models/task_modules/assigners/hungarian_assigner.py:15-145
and match_cost.py (ClassificationCost :175-226, FocalLossCost
binary_input :227-322, DiceCost :324-398).

TPU design: cost matrices are computed on device over a *padded* GT axis
(invalid GT columns get a large uniform cost, which cannot change the
optimum restricted to valid columns).  The assignment itself offers two
backends:

* ``hungarian_host`` — exact ``scipy.optimize.linear_sum_assignment`` via
  ``jax.pure_callback`` (the reference's own CPU round-trip,
  hungarian_assigner.py:126-133), batched over images in one callback.
* ``auction_match`` — a fully on-device forward auction (Bertsekas) in
  ``lax.while_loop``; within ``G_valid * eps`` (eps = 0.02) of the exact
  optimum, measured ~1e-4 excess on realistic cost batches.  No host
  sync — preferred under pjit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


BIG_COST = 1e6


def classification_cost(cls_logits: jax.Array, gt_labels: jax.Array
                        ) -> jax.Array:
    """-softmax(cls)[:, gt_label]: [nq, K+1] x [G] -> [nq, G]."""
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    return -probs[:, jnp.maximum(gt_labels, 0)]


def _mask_cost_terms(mask_pred: jax.Array, alpha: float = 0.25,
                     gamma: float = 2.0, eps: float = 1e-12):
    """(p, pos, neg) per-pixel cost terms from ONE exp/log1p pair.

    The cost scan streams [B, nq, h*w]-scale tensors 7 layers deep, so the
    per-element transcendental count is the step cost.  The naive form
    (sigmoid twice, log, log1p, two float pows) is 6+ transcendental-class
    VPU ops; via ``e = exp(-|x|)`` the sigmoid and both stable log-sigmoids
    share one exp + one log1p:

      log p       = min(x, 0) - log1p(e)      (= -softplus(-x))
      log (1 - p) = min(-x, 0) - log1p(e)     (= -softplus(x))

    The reference's ``log(p + eps)`` saturates at log(eps) for p -> 0
    (match_cost.py: eps only guards -inf); the softplus identity is exact
    there, clamped at the same floor.  gamma == 2 uses a multiply, not pow.
    """
    nq = mask_pred.shape[0]
    # elementwise streams run in the prediction dtype (bf16 under the
    # flagship recipe — halves the [nq, hw] f32 traffic; costs only rank
    # and every downstream reduction accumulates in f32)
    x = mask_pred.reshape(nq, -1)
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        x = x.astype(jnp.float32)
    e = jnp.exp(-jnp.abs(x))
    l1p = jnp.log1p(e)
    p = jnp.where(x >= 0, 1.0 / (1.0 + e), e / (1.0 + e))
    floor = float(np.log(eps))
    nlogp = jnp.minimum(l1p - jnp.minimum(x, 0), -floor)
    nlog1mp = jnp.minimum(l1p - jnp.minimum(-x, 0), -floor)
    q = 1.0 - p
    pg = p * p if gamma == 2.0 else p ** gamma
    qg = q * q if gamma == 2.0 else q ** gamma
    pos = nlogp * (alpha * qg)
    neg = nlog1mp * ((1.0 - alpha) * pg)
    return p, pos, neg


def focal_mask_cost(mask_pred: jax.Array, gt_masks: jax.Array,
                    alpha: float = 0.25, gamma: float = 2.0,
                    eps: float = 1e-12) -> jax.Array:
    """Per-pixel sigmoid-focal pos/neg costs einsum'd with gt masks, / n.

    mask_pred: [nq, H, W] logits; gt_masks: [G, H, W] {0,1} -> [nq, G].
    """
    _, pos, neg = _mask_cost_terms(mask_pred, alpha, gamma, eps)
    # contraction in the prediction dtype (bf16 under the flagship recipe)
    # with f32 accumulation — cost matrices only rank candidate pairs, and
    # the assignment backends tolerate far larger perturbations than the
    # ~1e-3 relative rounding this introduces
    ct = mask_pred.dtype
    g = gt_masks.astype(ct).reshape(gt_masks.shape[0], -1)
    n = pos.shape[1]
    return (jnp.dot(pos.astype(ct), g.T, preferred_element_type=jnp.float32)
            + jnp.dot(neg.astype(ct), (1 - g).T,
                      preferred_element_type=jnp.float32)) / n


def dice_mask_cost(mask_pred: jax.Array, gt_masks: jax.Array,
                   eps: float = 1.0) -> jax.Array:
    """Soft-dice cost on sigmoided masks: [nq, H, W] x [G, H, W] -> [nq, G]."""
    nq = mask_pred.shape[0]
    p = jax.nn.sigmoid(mask_pred.astype(jnp.float32).reshape(nq, -1))
    ct = mask_pred.dtype  # see focal_mask_cost on contraction precision
    g = gt_masks.astype(ct).reshape(gt_masks.shape[0], -1)
    num = 2 * jnp.dot(p.astype(ct), g.T,
                      preferred_element_type=jnp.float32)
    den = (jnp.sum(p, 1)[:, None]
           + jnp.sum(g, 1, dtype=jnp.float32)[None, :])
    return 1.0 - (num + eps) / (den + eps)


def match_costs(cls_logits, mask_pred, gt_labels, gt_masks, gt_valid,
                cls_weight: float = 1.0, focal_weight: float = 20.0,
                dice_weight: float = 1.0) -> jax.Array:
    """Weighted cost matrix [nq, G]; invalid GT columns set to BIG_COST.

    The focal and dice mask costs are computed from one shared
    ``_mask_cost_terms`` pass (one sigmoid, not two) and share the
    ``g`` / ``1 - g`` contractions' operand staging.
    """
    p, pos, neg = _mask_cost_terms(mask_pred)
    ct = mask_pred.dtype
    g = gt_masks.astype(ct).reshape(gt_masks.shape[0], -1)
    n = p.shape[1]
    focal = (jnp.dot(pos.astype(ct), g.T,
                     preferred_element_type=jnp.float32)
             + jnp.dot(neg.astype(ct), (1 - g).T,
                       preferred_element_type=jnp.float32)) / n
    num = 2 * jnp.dot(p.astype(ct), g.T, preferred_element_type=jnp.float32)
    den = (jnp.sum(p, 1, dtype=jnp.float32)[:, None]
           + jnp.sum(g, 1, dtype=jnp.float32)[None, :])
    dice = 1.0 - (num + 1.0) / (den + 1.0)
    cost = (cls_weight * classification_cost(cls_logits, gt_labels)
            + focal_weight * focal
            + dice_weight * dice)
    return jnp.where(gt_valid[None, :], cost, BIG_COST)


# ---------------------------------------------------------------------------
# Assignment backends
# ---------------------------------------------------------------------------


def _scipy_batch(costs: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    b, nq, g = costs.shape
    out = np.full((b, g), -1, np.int32)
    for i in range(b):
        rows, cols = linear_sum_assignment(costs[i])
        out[i, cols] = rows.astype(np.int32)
    return out


def hungarian_host(costs: jax.Array) -> jax.Array:
    """Exact assignment on host: costs [B, nq, G] -> matched query per GT
    [B, G] (int32)."""
    b, nq, g = costs.shape
    return jax.pure_callback(
        _scipy_batch,
        jax.ShapeDtypeStruct((b, g), jnp.int32),
        costs, vmap_method="sequential")


def _greedy_repair(benefit: jax.Array, matched: jax.Array,
                   invalid_col: jax.Array) -> jax.Array:
    """Complete a partial assignment: every valid-but-unmatched GT column
    takes its best still-free query, sequentially over columns.

    Runs after a capped auction (see ``auction_match``): the cap can leave
    valid columns at -1, silently dropping their mask loss for the step.
    Repair trades the eps-optimality bound for completeness on those
    columns only — already-matched columns are untouched, so in normal
    operation (cap not hit) this is the identity.  G sequential steps of
    [B, nq] argmaxes: negligible next to the auction itself.
    """
    b, nq, g = benefit.shape
    rows = jnp.arange(b)
    owned = jnp.zeros((b, nq + 1), bool).at[
        rows[:, None], jnp.where(matched >= 0, matched, nq)
    ].set(True)[:, :nq]

    def body(j, carry):
        matched, owned = carry
        need = (matched[:, j] < 0) & ~invalid_col[:, j]  # [B]
        val = jnp.where(owned, -jnp.inf, benefit[:, :, j])  # [B, nq]
        q = jnp.argmax(val, axis=1).astype(jnp.int32)
        matched = matched.at[:, j].set(
            jnp.where(need, q, matched[:, j]))
        owned = owned.at[rows, q].set(owned[rows, q] | need)
        return matched, owned

    matched, _ = jax.lax.fori_loop(0, g, body, (matched, owned))
    return matched


def auction_match(costs: jax.Array, num_iters: int = 600,
                  eps: float = 0.02, repair: bool = True,
                  with_stats: bool = False):
    """On-device auction assignment: costs [B, nq, G] -> [B, G] query index
    per GT column.

    GT columns are bidders competing for query rows; benefit = -cost.
    ONE synchronous-Jacobi forward-auction run (Bertsekas) from zero
    prices.  For this asymmetric problem (G <= nq, every bidder must be
    assigned) the from-zero run carries the clean guarantee: prices only
    rise, so unassigned queries keep their minimal (zero) price and the
    terminal assignment is within ``G_valid * eps`` of the optimum.
    Measured on realistic cost batches the excess is ~1e-4 (see
    tests/test_losses.py::test_auction_near_optimal_tight_gaps).

    Two measured design decisions:

    * Padded/invalid GT columns (uniform BIG_COST rows) are PARKED as
      pre-assigned instead of bidding: identical rows share one argmax,
      so they would win serially — one iteration per padded column was
      the dominant iteration cost (17 -> 4 iterations at the flagship
      shape).  They cannot affect the optimum restricted to valid
      columns and are reported unmatched (-1).
    * NO warm-started epsilon-scaling phases.  Under Jacobi dynamics a
      re-auctioned phase can strand one high-priced query: its eventual
      taker must wait for every alternative's price to catch up in eps
      increments — a measured 400+-iteration stall (and with the phase
      capped, the result silently regressed to the coarse-eps
      assignment).  A single small-eps run from zero prices is both
      faster (no stranded prices) and tighter.

    The iteration cap only binds under adversarial bidding wars
    (two columns sharing a strong unique preference: war length
    ~2*margin/eps); a capped run can leave valid columns unmatched (-1).
    With ``repair=True`` (default) a greedy completion pass then assigns
    each such column its best free query (``_greedy_repair``), so every
    valid GT always contributes loss; the criterion's ``repaired_gt``
    metric observes the raw cap edge.  Deterministic, jit-friendly,
    no host sync — preferred under pjit.
    """
    b, nq, g = costs.shape
    benefit = -costs.astype(jnp.float32)  # [B, nq, G]
    invalid_col = jnp.all(costs >= BIG_COST * 0.5, axis=1)  # [B, G]

    def body(state):
        i, price, owner, assigned = state
        # each unassigned gt bids for its best query
        value = benefit - price[:, :, None]  # [B, nq, G]
        best_q = jnp.argmax(value, axis=1)  # [B, G]
        top = jnp.max(value, axis=1)  # [B, G]
        # second best value per gt
        masked = value.at[jnp.arange(b)[:, None],
                          best_q, jnp.arange(g)[None, :]].set(-jnp.inf)
        second = jnp.max(masked, axis=1)
        second = jnp.where(jnp.isfinite(second), second, top)
        bid = top - second + eps  # [B, G]
        bid = jnp.where(assigned, -jnp.inf, bid)

        # highest bid per query wins (scatter-max)
        bid_mat = jnp.full((b, nq, g), -jnp.inf).at[
            jnp.arange(b)[:, None], best_q, jnp.arange(g)[None, :]
        ].set(bid)
        win_bid = jnp.max(bid_mat, axis=2)  # [B, nq]
        win_gt = jnp.argmax(bid_mat, axis=2)
        got = win_bid > -jnp.inf

        # winners raise the price and take ownership; a re-won query's
        # previous owner implicitly becomes unassigned (owner map is
        # recomputed below)
        price = jnp.where(got, price + win_bid, price)
        new_owner = jnp.where(got, win_gt, owner)
        oh = jax.nn.one_hot(
            jnp.where(new_owner >= 0, new_owner, g), g + 1, dtype=bool)
        assigned = jnp.any(oh[..., :g], axis=1) | invalid_col
        return i + 1, price, new_owner, assigned

    def cond(state):
        i, price, owner, assigned = state
        return (i < num_iters) & ~jnp.all(assigned)

    price0 = jnp.zeros((b, nq), jnp.float32)
    owner0 = jnp.full((b, nq), -1, jnp.int32)
    _, price, owner, _ = jax.lax.while_loop(
        cond, body, (0, price0, owner0, invalid_col))

    # owner: [B, nq] -> per-gt matched query [B, G]
    matched = jnp.full((b, g), -1, jnp.int32)
    q_idx = jnp.broadcast_to(jnp.arange(nq, dtype=jnp.int32)[None], (b, nq))
    valid = owner >= 0
    matched = matched.at[
        jnp.arange(b)[:, None], jnp.where(valid, owner, 0)
    ].max(jnp.where(valid, q_idx, -1))
    raw = jnp.where(invalid_col, -1, matched)
    out = _greedy_repair(benefit, raw, invalid_col) if repair else raw
    if with_stats:
        # valid columns the capped auction left unmatched (repair filled)
        return out, jnp.sum((raw < 0) & ~invalid_col)
    return out
