"""Checkpoint / resume for long sampling runs.

The reference persists nothing — samples accumulate in an in-memory array
returned at the end (reference HMC.py:136-145,178-183; SURVEY.md §5
"Checkpoint/resume: absent"). Here the full sampler state pytree
(ensemble q/p/mass, cached potential+grad, adapted step size, RNG key,
iteration counter) checkpoints through orbax — sharded arrays are written
per host-shard and restored to the same sharding, which is the multi-host
recovery story (no elastic membership; restart with the same topology and
continue).

Typed PRNG keys are unwrapped to their uint32 key data for serialisation
and rewrapped on restore.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

Array = jax.Array

_KEY_SENTINEL = "__prng_key__"


def _pack(tree):
    """Replace typed PRNG keys with serialisable dicts."""
    def pack_leaf(x):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            return {_KEY_SENTINEL: jax.random.key_data(x)}
        return x
    return jax.tree_util.tree_map(
        pack_leaf, tree,
        is_leaf=lambda x: isinstance(x, jax.Array))


def _unpack(tree):
    def is_packed(x):
        return isinstance(x, dict) and set(x) == {_KEY_SENTINEL}

    def unpack_leaf(x):
        if is_packed(x):
            return jax.random.wrap_key_data(x[_KEY_SENTINEL])
        return x
    return jax.tree_util.tree_map(unpack_leaf, tree, is_leaf=is_packed)


@dataclasses.dataclass
class CheckpointManager:
    """Thin orbax wrapper: numbered checkpoints under ``directory`` with
    retention. Any pytree of arrays (flax struct sampler states included)
    plus scalars/keys round-trips."""

    directory: str
    max_to_keep: int = 3

    def __post_init__(self):
        self.directory = os.path.abspath(self.directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self.max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, *, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_pack(state)),
                       force=force)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of ``template`` (pass the
        freshly-initialised state — shapes/dtypes must match)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints under {self.directory}")
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, _pack(template))
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))
        return _unpack(restored)

    def close(self):
        self._mgr.close()
