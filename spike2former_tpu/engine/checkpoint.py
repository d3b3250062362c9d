"""Checkpointing via orbax + torch-checkpoint conversion.

Reference behaviors reproduced:
* mmengine CheckpointHook(interval=10000, save_best='mIoU') — periodic +
  best-metric checkpoints of a pure param pytree (neuron membrane state is
  never materialized, so there is nothing stateful to save; SURVEY §5).
* backbone ``init_weights`` prefix-strip loading (sdtv2.py:577-612) — the
  torch→JAX converter strips the ``backbone.`` prefix and remaps
  param names/layouts (OIHW conv → HWIO, BN running stats → batch_stats).
"""
from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


_CKPTR: ocp.StandardCheckpointer | None = None


def _checkpointer() -> ocp.StandardCheckpointer:
    # one process-wide checkpointer so async saves serialize correctly
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_state(work_dir: str, state: Any, step: int, *,
               wait: bool = False, keep: int | None = None) -> str:
    """Checkpoint ``state`` as ``work_dir/ckpt_{step}``.

    Async by default: orbax's blocking phase (device→host copy) runs
    inline — safe w.r.t. donated buffers in the next train step — and
    the file IO continues in a background thread (``wait=True`` blocks
    until fully written; restores/final saves should wait).
    ``keep``: retain only the newest ``keep`` checkpoints (the
    mmengine ``max_keep_ckpts`` behavior); the current save and the
    best-checkpoint marker are never pruned.
    """
    path = os.path.abspath(os.path.join(work_dir, f"ckpt_{step}"))
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # serialize with any in-flight save
    # multi-host: globally-sharded arrays are not host-fetchable; orbax
    # gathers them itself (every process must participate in save)
    host_state = jax.device_get(state) if jax.process_count() == 1 else state
    ckptr.save(path, host_state, force=True)
    if wait or jax.process_count() > 1:
        ckptr.wait_until_finished()
    if keep is not None:
        # the current save counts toward `keep` whether it has finalized
        # (wait=True) or is still an in-flight *-tmp dir (async): prune
        # to keep-1 among the OTHER finalized checkpoints
        prune_checkpoints(work_dir, keep - 1, protect={path})
    return path


def prune_checkpoints(work_dir: str, keep: int,
                      protect: set[str] = frozenset()) -> list[str]:
    """Delete all but the newest ``keep`` ``ckpt_*`` dirs (by step).

    Paths in ``protect`` (absolute) are excluded before counting and
    never removed (``keep=0`` removes every unprotected checkpoint).
    Returns the removed paths."""
    import shutil

    if keep < 0:
        return []
    ckpts = sorted(_list_ckpts(work_dir),
                   key=lambda d: int(d.split("_")[1]))
    cand = [os.path.abspath(os.path.join(work_dir, d)) for d in ckpts]
    cand = [p for p in cand if p not in protect]
    remove = cand[:-keep] if keep > 0 else cand
    for path in remove:
        shutil.rmtree(path, ignore_errors=True)
    return remove


def _list_ckpts(work_dir: str) -> list[str]:
    """Finalized ``ckpt_<step>`` dirs (skips orbax ``*-tmp`` in-flight
    dirs from async saves)."""
    import re

    if not os.path.isdir(work_dir):
        return []
    return [d for d in os.listdir(work_dir)
            if re.fullmatch(r"ckpt_\d+", d)]


def latest_checkpoint(work_dir: str) -> str | None:
    if _CKPTR is not None:  # settle any in-flight async save first
        _CKPTR.wait_until_finished()
    ckpts = _list_ckpts(work_dir)
    if not ckpts:
        return None
    best = max(ckpts, key=lambda d: int(d.split("_")[1]))
    return os.path.join(work_dir, best)


def restore_state(path: str, target: Any) -> Any:
    _checkpointer().wait_until_finished()  # in-flight async save, if any
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=jax.device_get(target))


def restore_variables(path: str, variables: Any) -> Any:
    """Restore eval ``{'params', 'batch_stats'}`` variables from either a
    raw variables checkpoint or a TrainState checkpoint written by
    tools/train.py (step/params/batch_stats/opt_state) — the reference's
    ``load_from`` accepts training checkpoints the same way."""
    _checkpointer().wait_until_finished()  # in-flight async save, if any
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    try:
        return ckptr.restore(path, target=jax.device_get(variables))
    except (ValueError, KeyError):
        raw = ckptr.restore(path)
        if isinstance(raw, (list, tuple)) and len(raw) == 4:
            # TrainState namedtuple restored without target -> sequence
            _, params, batch_stats, _ = raw
            return {"params": params, "batch_stats": batch_stats}
        if isinstance(raw, dict) and "params" in raw:
            return {"params": raw["params"],
                    "batch_stats": raw.get("batch_stats", {})}
        raise


# ---------------------------------------------------------------------------
# torch state_dict -> JAX variables conversion
# ---------------------------------------------------------------------------

def convert_torch_conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight [O, I/g, kh, kw] -> flax HWIO [kh, kw, I/g, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_torch_linear(w: np.ndarray) -> np.ndarray:
    """torch linear [O, I] -> flax [I, O]."""
    return np.transpose(w, (1, 0))


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint (CPU) into numpy, stripping wrapper keys
    ('state_dict'/'model') and the 'backbone.' prefix like the reference
    loader."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        if k.startswith("backbone."):
            k = k[len("backbone."):]
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def load_torch_state_dict_raw(path: str) -> dict[str, np.ndarray]:
    """Like ``load_torch_state_dict`` but keeps the module prefixes
    (``backbone.``/``decode_head.``) — needed by the full-model converter."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: (v.detach().numpy() if hasattr(v, "detach") else
                np.asarray(v)) for k, v in ckpt.items()}


def load_reference_model(path: str, *, variant: str = "sdtv2",
                         depths_stage3: int = 6,
                         depths_stage4: int = 2, num_encoder_layers: int = 6,
                         num_decoder_layers: int = 6):
    """Load a FULL reference EncoderDecoder checkpoint (the ``load_from``
    flow, tools/test.py:104) into flax variables for
    ``Spike2Former(compat=True, variant=variant)``."""
    from .convert import convert_spike2former

    sd = load_torch_state_dict_raw(path)
    return convert_spike2former(
        sd, variant=variant,
        depths_stage3=depths_stage3, depths_stage4=depths_stage4,
        num_encoder_layers=num_encoder_layers,
        num_decoder_layers=num_decoder_layers)


def load_reference_backbone(path: str, variables, depths_stage3: int = 6,
                            depths_stage4: int = 2,
                            variant: str = "sdtv2"):
    """Load a reference torch checkpoint into a model's backbone subtree
    (the init_cfg Pretrained flow, sdtv2.py:577-612)."""
    from flax.core import unfreeze

    sd = load_torch_state_dict(path)
    if variant == "sdtv2":
        from .convert_sdtv2 import convert_sdtv2_backbone
        conv = convert_sdtv2_backbone(sd, depths_stage3, depths_stage4)
    else:
        from .convert_sdtv3 import convert_sdtv3_backbone
        conv = convert_sdtv3_backbone(sd, depths_stage3, depths_stage4,
                                      mae=variant == "sdtv3mae")
    variables = jax.device_get(unfreeze(variables))
    variables["params"]["backbone"] = conv["params"]
    variables["batch_stats"]["backbone"] = conv["batch_stats"]
    return variables
