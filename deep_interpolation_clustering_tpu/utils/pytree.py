"""Small pytree helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_size(tree) -> int:
    """Total number of array elements in a pytree (trainable-param count)."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def global_norm(tree) -> jnp.ndarray:
    """L2 norm over all leaves, matching torch.nn.utils.clip_grad_norm_'s
    total-norm definition (delegates to optax; clipping in train/optim.py
    uses optax.clip_by_global_norm with identical semantics)."""
    import optax

    return optax.global_norm(tree)
