"""Checkpoint / resume for long cross-validation runs (orbax-backed).

The reference has no checkpointing — UK-Biobank runs were manually staged
(SURVEY.md §5). Here the solver loop is resumable (`run_segment` advances the
state pytree to an iteration bound and can continue from the saved state), so
pod-scale CV can survive preemption: pass ``checkpoint_dir`` (and optionally
``checkpoint_every``) to :func:`mendeliht_tpu.cv_iht`.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_state(directory: str, st, step: int, extra: dict | None = None):
    """Save a solver state pytree at `directory`/step_<n>."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    payload = {"state": dataclasses.asdict(st)}
    if extra:
        payload["extra"] = {k: np.asarray(v) for k, v in extra.items()}
    _checkpointer().save(path, payload, force=True)
    # drop older checkpoints, keep latest two
    steps = sorted(all_steps(directory))
    for s in steps[:-2]:
        import shutil
        shutil.rmtree(os.path.join(os.path.abspath(directory), f"step_{s}"),
                      ignore_errors=True)
    return path


def all_steps(directory: str):
    if not os.path.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                out.append(int(name[5:]))
            except ValueError:
                pass
    return out


def latest_step(directory: str):
    steps = all_steps(directory)
    return max(steps) if steps else None


def restore_state(directory: str, like, step: int | None = None):
    """Restore a state saved by :func:`save_state` into the dataclass type of
    `like` (used for shape/dtype reference). Returns (state, step) or None."""
    step = latest_step(directory) if step is None else step
    if step is None:
        return None
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    payload = _checkpointer().restore(path)
    d = payload["state"]
    fields = {f.name for f in dataclasses.fields(like)}
    cast = {}
    for k in fields:
        ref = getattr(like, k)
        cast[k] = jax.numpy.asarray(d[k]).astype(ref.dtype).reshape(ref.shape)
    return dataclasses.replace(like, **cast), step
