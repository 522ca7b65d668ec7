"""Row-sharded device-resident cohort storage (the multi-chip memory path).

The replicated design (`trainer._cohort_device_data` + `replicate_tree`)
keeps a full copy of every cohort plane in each chip's HBM: ~5.5 GB at the
measured 1M-encounter/T=354 scale, i.e. a third of a v5e's 16 GB *per chip*,
and ~3M encounters cannot fit at all. This module stores the planes
**sharded once across the data mesh** — per-chip HBM = cohort/D — while
keeping batch composition, RNG, and numerics identical to the replicated
path.

Design ("epoch relayout"): planes live in *block layout* `(nb, B, ...)`
sharded `P(None, "data")` — block k is batch k, already split over the mesh
exactly as the train step shards its batch axis. Each epoch the host draws
the same shuffle order as the replicated path and the storage is permuted
into that epoch order by ONE collective program (`ensure`): a local gather
into per-destination segments, one `all_to_all` over the data axis, and a
local scatter. The fused epoch then consumes batches by `dynamic_index` on
the unsharded block axis — a shard-local slice, zero per-step collectives.
Per-epoch relayout traffic is one cohort pass over ICI (~cohort/D bytes per
chip), amortized over the epoch's n/B steps; per-step cross-shard gathers
(GSPMD's alternative for a take from a `P("data")` operand) would pay a
collective *every step* instead.

Why not pre-gather the epoch's batches as scan xs: measured ~20x slower
end-to-end on the replicated path (per-iteration relayout of the big xs
planes — PARITY.md r3); the block storage here is indexed inside the scan
body, never threaded through scan xs.

The reference's only parallel form is single-process DataParallel with the
whole dataset in host RAM (pretrain_trainer.py:21, dataloader.py:16-48);
this exceeds it — there is no reference counterpart to cite for the
relayout itself.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

Array = jax.Array


def _bucket(m: int) -> int:
    """Round a segment capacity up to the next power of two (>= 16) so the
    relayout program recompiles only on ~2x plan-size changes, not on every
    epoch's max-segment fluctuation (for a uniform shuffle the per-(src,dst)
    counts concentrate at n/D^2 +- a few sqrt)."""
    m = max(int(m), 16)
    return 1 << (m - 1).bit_length()


class ShardedCohort:
    """Cohort planes in `(nb, B, ...)` block layout, row-sharded
    `P(None, "data")` over `mesh`, with host-tracked storage order.

    `order` is the `(nb, B)` int64 matrix of ORIGINAL row ids currently
    stored at each block position; `ensure(tgt)` permutes storage to a new
    matrix (no-op when equal). Block k of the storage is exactly the batch
    `X[tgt[k]]` the replicated path would gather — the epoch functions just
    slice it.
    """

    def __init__(self, mesh: Mesh, arrays: Dict[str, np.ndarray], batch_size: int):
        self.mesh = mesh
        self.d = int(mesh.devices.size)
        self.b = int(batch_size)
        assert self.b % self.d == 0, (self.b, self.d)
        self.pb = self.b // self.d  # batch columns per device
        n = next(iter(arrays.values())).shape[0]
        self.n = int(n)
        self.nb = -(-self.n // self.b)
        self.n_local = self.nb * self.pb
        # initial layout: identity clamped to n-1 — identical to the fused
        # eval path's padded index rows (trainer._eval_one_epoch_fused), so
        # a fresh cohort is eval-ready with zero relayouts
        self.order = self.identity_order()
        flat = self.order.reshape(-1)
        self._block_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
        self._plan_sharding = NamedSharding(mesh, P(DATA_AXIS))
        self.data3: Dict[str, Array] = {
            k: jax.device_put(
                np.ascontiguousarray(
                    np.asarray(v)[flat].reshape((self.nb, self.b) + v.shape[1:])
                ),
                self._block_sharding,
            )
            for k, v in arrays.items()
        }
        self._relayout_fns: Dict[int, callable] = {}

    # -------------------------------------------------------------- orders
    def identity_order(self) -> np.ndarray:
        """Sequential rows, tail clamped to the last row — the eval layout
        (matches the replicated fused-eval `np.minimum(arange, n-1)`)."""
        return np.minimum(np.arange(self.nb * self.b), self.n - 1).reshape(
            self.nb, self.b
        )

    def epoch_order(self, order: np.ndarray) -> np.ndarray:
        """An epoch shuffle `order` (n,) as a block matrix. The tail block
        is the short batch padded by cycling the TAIL's own rows — exactly
        the masked tail step's `np.resize(tail, B)` (repeated REAL rows
        keep the masked-logsumexp gradients finite, and the composition
        matches the replicated path's tail batch bit-for-bit)."""
        assert order.shape == (self.n,)
        n_pad = self.nb * self.b
        if n_pad == self.n:
            return order.reshape(self.nb, self.b)
        tail = order[(self.n // self.b) * self.b :]
        return np.concatenate(
            [order, np.resize(tail, n_pad - self.n)]
        ).reshape(self.nb, self.b)

    @property
    def eval_mask(self) -> np.ndarray:
        """(nb, B) float mask of real rows under `identity_order`."""
        m = (np.arange(self.nb * self.b) < self.n).astype(np.float32)
        return m.reshape(self.nb, self.b)

    # ------------------------------------------------------------- relayout
    def ensure(self, tgt: np.ndarray) -> None:
        """Permute storage into order `tgt` ((nb, B) original ids; every id
        in [0, n) must appear at least once). Dispatches asynchronously —
        no host sync; donates the old buffers."""
        tgt = np.asarray(tgt)
        assert tgt.shape == (self.nb, self.b), tgt.shape
        if np.array_equal(tgt, self.order):
            return
        send, dst, m_cap = self._plan(self.order.reshape(-1), tgt.reshape(-1))
        fn = self._relayout_fn(m_cap)
        self.data3 = fn(
            self.data3,
            jax.device_put(send, self._plan_sharding),
            jax.device_put(dst, self._plan_sharding),
        )
        self.order = tgt

    def _plan(self, cur_flat: np.ndarray, tgt_flat: np.ndarray):
        """Host-side routing plan: for each (src_dev, dst_dev) pair, the
        local source rows to send and the local destination slots to fill,
        padded to a bucketed capacity M.

        Storage may hold DUPLICATE original ids (the padded tail rows are
        copies of real rows); any copy is a valid source, so the position
        map just keeps the last writer.
        """
        d, b, pb = self.d, self.b, self.pb
        pos_of = np.empty(self.n, np.int64)
        pos_of[cur_flat] = np.arange(cur_flat.size)
        src_pos = pos_of[tgt_flat]
        dst_pos = np.arange(tgt_flat.size)

        def dev_loc(p):
            j = p % b
            return j // pb, (p // b) * pb + (j % pb)

        s_dev, s_loc = dev_loc(src_pos)
        d_dev, d_loc = dev_loc(dst_pos)
        key = s_dev * d + d_dev
        o = np.argsort(key, kind="stable")
        key_s, s_loc_s, d_loc_s = key[o], s_loc[o], d_loc[o]
        counts = np.bincount(key_s, minlength=d * d)
        m_cap = _bucket(counts.max())
        starts = np.zeros(d * d, np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        slot = np.arange(key_s.size) - starts[key_s]
        send = np.zeros((d * d, m_cap), np.int32)
        # unfilled destination slots point past the local array: the
        # scatter's mode="drop" discards them
        dst = np.full((d * d, m_cap), self.n_local, np.int32)
        send[key_s, slot] = s_loc_s
        dst[key_s, slot] = d_loc_s
        # send is consumed by the SOURCE device (rows [s, :, :]); dst by the
        # DESTINATION device (rows [:, d, :]) — transpose so both shard on
        # their consumer's axis
        return (
            send.reshape(d, d, m_cap),
            dst.reshape(d, d, m_cap).transpose(1, 0, 2),
            m_cap,
        )

    def _relayout_fn(self, m_cap: int):
        """The jitted collective permutation, cached per segment capacity
        (shapes are otherwise fixed for a cohort)."""
        if m_cap in self._relayout_fns:
            return self._relayout_fns[m_cap]
        d, n_local = self.d, self.n_local

        def per_plane(a, send_flat, dst_flat):
            flat = a.reshape((n_local,) + a.shape[2:])
            buf = jnp.take(flat, send_flat, axis=0)  # (D*M, ...)
            recv = jax.lax.all_to_all(buf, DATA_AXIS, 0, 0, tiled=True)
            out = jnp.zeros_like(flat).at[dst_flat].set(recv, mode="drop")
            return out.reshape(a.shape)

        @partial(jax.jit, donate_argnums=(0,))
        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(None, DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(None, DATA_AXIS),
        )
        def relayout(tree3, send_idx, dst_idx):
            send_flat = send_idx[0].reshape(d * m_cap)
            dst_flat = dst_idx[0].reshape(d * m_cap)
            return {
                k: per_plane(v, send_flat, dst_flat) for k, v in tree3.items()
            }

        self._relayout_fns[m_cap] = relayout
        return relayout

    # ------------------------------------------------------------- sizing
    def nbytes_per_device(self) -> int:
        """Steady-state HBM bytes of this cohort on ONE device (the whole
        point: cohort/D instead of cohort)."""
        total = 0
        for v in self.data3.values():
            shard = v.addressable_shards[0]
            total += int(np.prod(shard.data.shape)) * v.dtype.itemsize
        return total
