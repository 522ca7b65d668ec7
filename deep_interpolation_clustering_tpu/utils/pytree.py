"""Small pytree helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_size(tree) -> int:
    """Total number of array elements in a pytree (trainable-param count)."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def global_norm(tree) -> jnp.ndarray:
    """L2 norm over all leaves, matching torch.nn.utils.clip_grad_norm_'s
    total-norm definition."""
    leaves = [jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(jnp.sum(jnp.stack(leaves)))
