"""Tensor-parallel sharding rules for the Spike2Former model family.

The reference has no tensor parallelism (DDP replicates the whole model —
tools/dist_train.sh); at Spike2Former's ~35M parameters pure DP is also
the right default on TPU.  This module exists for the regime where TP is
the right tool — very large feedforward widths, or serving replicas that
must fit alongside other models — and as the TPU-native pattern: instead
of hand-written all-reduces (Megatron style), we annotate PARAMETER
shardings over a ``model`` mesh axis and let GSPMD insert the collectives.

What gets sharded (the classic Megatron column/row-parallel MLP split,
expressed purely as PartitionSpecs):

* every spiking FFN (``MSDAFFN``: spike→1x1(→F)→BN→spike→1x1(→C)→BN,
  models/attention.py) — the hidden axis ``F`` is partitioned:
  - ``Conv_0/kernel [1, C, F]`` -> ``P(None, None, 'model')`` (column)
  - ``Conv_0/bias [F]``, ``BatchNorm_0/{scale,bias,mean,var} [F]`` ->
    ``P('model')`` (the BN is channel-wise, so per-shard statistics are
    exact — no cross-shard moment reduction exists by construction)
  - ``Conv_1/kernel [1, F, C]`` -> ``P('model', None)`` on the
    contracting axis (row) — GSPMD emits ONE psum for the partial sums,
    exactly the hand-written Megatron reduction
  - ``Conv_1/bias [C]`` and the output BN stay replicated.
* the mask-embed MLP (``SpikeMLP3``) hidden layers the same way when its
  width is divisible by the axis.

Everything else (attention projections, convolutions, embeddings) is
replicated: their widths (<=512) are below the point where TP beats DP on
ICI, and spiking attention's RepConv stacks are depthwise-heavy, which
shards poorly along channels.  The rules are path-based and conservative
— any parameter they don't recognize stays replicated, which is always
correct (GSPMD reshards as needed).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def tp_pspec(path, value, model_axis_size: int) -> P:
    """PartitionSpec for one parameter/stat leaf under the TP rules."""
    joined = _path_str(path)
    shape = getattr(value, "shape", ())

    def divisible(dim: int) -> bool:
        return (len(shape) > dim if dim >= 0 else len(shape) >= -dim) and \
            shape[dim] % model_axis_size == 0

    if "/ffn/" in joined or joined.startswith("ffn/"):
        # flax auto-names DIRECTLY under the MSDAFFN module: Conv_0
        # (expand), Conv_1 (contract), BatchNorm_0 (hidden), BatchNorm_1
        # (output).  Match anchored to the ffn segment — the BatchNorm
        # wrapper nests an inner flax BatchNorm_0, so a bare substring
        # test would also hit the output BN's inner module.
        sub = joined.rsplit("/ffn/", 1)[-1]
        if sub.startswith("Conv_0/kernel") and divisible(-1):
            return P(*([None] * (len(shape) - 1)), "model")
        if sub.startswith("Conv_0/bias") and divisible(0):
            return P("model")
        if sub.startswith("BatchNorm_0/") and divisible(0):
            return P("model")
        if sub.startswith("Conv_1/kernel") and divisible(-2):
            return P(*([None] * (len(shape) - 2)), "model", None)
    if "mask_embed/" in joined:
        # SpikeMLP3 (models/attention.py): fc->spike->fc->spike->fc.
        # Column-parallel Dense_0, row-parallel Dense_1 (the spike between
        # them is elementwise, so the Megatron split applies); Dense_2
        # stays replicated after the psum.
        if "Dense_0/kernel" in joined and divisible(-1):
            return P(None, "model")
        if "Dense_1/kernel" in joined and divisible(-2):
            return P("model", None)
    return P()


def tp_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedShardings for a params / batch_stats pytree under TP rules.

    Leaves the ``data`` axis unused (parameters are replicated across it);
    compose with batch sharding on the inputs for DP x TP.
    """
    size = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, tp_pspec(path, v, size)), tree)


def shard_params_tp(tree: Any, mesh: Mesh) -> Any:
    """device_put a params / batch_stats tree with the TP shardings."""
    return jax.tree_util.tree_map(
        jax.device_put, tree, tp_shardings(tree, mesh))
