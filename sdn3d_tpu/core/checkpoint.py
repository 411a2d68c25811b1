"""Checkpoint manager: one orbax tree + JSON manifest per branch.

Replaces the reference's three independent torch.save schemes (SURVEY.md §5):
bulb Saver model-{step}.ckpt + meta.json (bulb/saver.py:237-269), semantic
per-epoch encoder_/decoder_*.pth, pix2pixHD per-net {epoch}_net_{G,D,E}.pth
+ iter.txt.  Resume picks the newest step (the reference resumes by mtime).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(directory: str, step: int, state: Any,
                    meta: Optional[dict] = None) -> str:
    """Save a pytree `state` under directory/step-{step} with a manifest."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step-{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    manifest = {"step": step, "meta": meta or {}}
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step-"):
            try:
                steps.append(int(name.split("-", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(directory: str, template: Any,
                       step: Optional[int] = None) -> Tuple[Any, int]:
    """Restore the given (or newest) step into the structure of `template`."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(directory, f"step-{step}")
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=jax.device_get(template))
    return restored, step


def restore_variables(directory: str, variables: Any,
                      step: Optional[int] = None) -> Tuple[Any, int]:
    """Restore model VARIABLES ({params[, batch_stats]}) from either a
    bare-variables checkpoint or a full train-state checkpoint.

    The train CLIs save whole train states (step/params/batch_stats/
    optimizer fields); the inference CLIs only need params + batch_stats.
    Restoring a train-state checkpoint into a variables template raises a
    structure mismatch in orbax, so this restores structure-free and
    extracts the model fields (train-state field names follow the
    repo-wide convention: `params`, `batch_stats`)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(directory, f"step-{step}")
    raw = ocp.StandardCheckpointer().restore(path)
    if not isinstance(raw, dict) or "params" not in raw:
        got = list(raw) if isinstance(raw, dict) else type(raw).__name__
        raise ValueError(
            f"checkpoint at {path} has no 'params' field: {got}")
    out = dict(variables)
    out["params"] = raw["params"]
    if "batch_stats" in variables and raw.get("batch_stats"):
        out["batch_stats"] = raw["batch_stats"]
    return out, step


def load_meta(directory: str) -> dict:
    with open(os.path.join(directory, "manifest.json")) as f:
        return json.load(f)
