"""Checkpoint / resume via Orbax (SURVEY.md §7 "Checkpoint / resume").

The reference has no checkpointing; here any pipeline state (FrontendState,
PFState, PoseGraph — all NamedTuples of arrays) saves and restores
mid-log, which is also the artifact format handed to the viz/metrics tools.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_state(path: str, state) -> str:
    """Save a NamedTuple-of-arrays pipeline state to `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state))
    ckptr.wait_until_finished()
    return path


def load_state(path: str, template):
    """Restore a state saved by save_state; `template` supplies the pytree
    structure and dtypes/shapes (e.g. a freshly-initialized state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        template,
    )
    return ckptr.restore(path, target)
