"""Native checkpoint snapshots via orbax (save/restore param + train-state
pytrees). The HF-named safetensors readers in bagel_loader/vae_loader remain
the ONLY weight-interchange format with the reference ecosystem (SURVEY.md §5
checkpoint/resume plan); orbax snapshots are this framework's own format for
training resume and fast reload.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_snapshot(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree)
    ckptr.wait_until_finished()


def restore_snapshot(path: str, target: Optional[Any] = None) -> Any:
    """Restore a snapshot; pass ``target`` (a matching pytree of arrays or
    ShapeDtypeStructs, possibly sharded) to control placement/dtypes."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape")
        else x,
        target,
    )
    return ckptr.restore(path, abstract)
