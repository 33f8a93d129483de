"""RNG discipline.

The reference samples augmentation params with Python ``random`` once per clip
(/root/reference/nexar_video_aug.py:97-182) and seeds everything with 42
(/root/reference/nexar_videos.py:836-839). Here every random decision flows
from a ``jax.random`` key tree: one root seed → per-epoch → per-batch →
per-clip keys, identical across hosts for model init and disjoint across
hosts/clips for augmentation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_rngs(seed: int, names: tuple = ("params", "dropout")) -> dict:
    """Named init keys, identical on every host (the reference's seeded
    identical-init discipline, /root/reference/distributed_video_classifier.py:379-412)."""
    root = jax.random.PRNGKey(seed)
    keys = jax.random.split(root, len(names))
    return {name: key for name, key in zip(names, keys)}


def fold_in_host(key: jax.Array, process_index: int | None = None) -> jax.Array:
    """Make a key host-unique (for data augmentation, never for model init)."""
    if process_index is None:
        process_index = jax.process_index()
    return jax.random.fold_in(key, process_index)


def clip_keys(key: jax.Array, batch_size: int) -> jax.Array:
    """One key per clip in the batch → per-clip, temporally-consistent aug params."""
    return jax.random.split(key, batch_size)


def epoch_key(seed: int, epoch: int) -> jax.Array:
    return jax.random.fold_in(jax.random.PRNGKey(seed), epoch)


def batch_key(seed: int, epoch: int, step: int) -> jax.Array:
    return jax.random.fold_in(epoch_key(seed, epoch), step)
