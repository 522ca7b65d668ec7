"""Fused exact-k random-subset selection (the fake-sample mask).

The adversarial fake-sample generator must replace an exact uniformly-drawn
k-subset of each channel's valid observations (reference
dataloader.py:182-193 does it per-channel with `np.random.choice`). The
vectorized form selects the k smallest of per-slot random scores, which
profiling showed costs a full `(B, C, T)` sort inside every train step —
the single most expensive op of the fused epoch (~18% of the step at the
p1 production shape).

This module computes the same selection without sorting:

  * Each slot gets a 30-bit integer key: 21+ random high bits with the
    slot POSITION packed into the low bits — keys are unique within a row,
    so "the k smallest keys" needs no tie handling, and breaking random
    ties by position order is distribution-identical to the previous
    cumulative tie-fill (same fixed rule). The subset deviates from exact
    uniformity only when the random parts tie across the k-th/(k+1)-th
    boundary — there the earlier slot deterministically wins, an
    early-position bias in ~T/2^21 of rows (~2e-4 at T=354; the
    reference's np.random.choice is exactly uniform). Documented, not
    load-bearing: fake samples only need to be adversarial, and every
    backend/path computes the identical mask.
  * The k-th smallest key per row comes from a one-bit-per-pass MSD radix
    select over the RANDOM key bits only (21 passes at T=354, each fixing
    one answer bit with a single count-reduction — reduction-minimal, see
    `_radix_kth`), followed by a single MXU triangular-matmul cumsum that
    fills ties at the threshold in ascending position order — the same
    (rand, pos)-lexicographic selection as radixing packed keys, minus
    the position bits' passes (see `_select_kernel`). In plain XLA those
    count passes would each re-read the key array from HBM; the Pallas
    kernel keeps the whole row tile resident in VMEM and does ONE HBM
    read + one mask write.
  * Short sequences (T <= 192) pack `384 // T` logical rows per physical
    row (a free row-major reshape), so each radix pass sweeps full VPU
    lanes and the per-segment counts come off the MXU — with the
    lane-expanded threshold updated incrementally by 0/1 digits so no
    full-precision matmul sits in the loop (`_select_kernel_packed`).
    Measured at the 100k-scale shape (24576 rows, T=48): 153 us vs 592
    unpacked vs 892 legacy, still bit-exact vs the sort oracle.
  * All arithmetic is int32 compares/shifts — bit-exact on every backend —
    so the XLA fallback (sort-based, used off-TPU where sorts are cheap
    and Mosaic isn't available) produces the IDENTICAL mask and the kernel
    can be the default path without touching the 1e-5 parity story
    (`tests/test_data.py::test_fake_select_pallas_matches_xla`).

Reference semantics preserved: exactly `max(1, floor(0.5 * n_valid))`
slots per (encounter, channel), uniformly without replacement, among the
front-packed valid slots; rows with zero valid observations select none
(data/loader.py contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_ROW_TILE = 256
_KEY_BITS = 30  # keys live in [0, 2^30): int32-safe under the +3<<shift bound
_INVALID = 0x7FFFFFFF  # int32 max: sorts after every valid key


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pos_bits(t: int) -> int:
    """Low bits reserved for the slot position (unique within a row)."""
    return max(1, (t - 1).bit_length())


def _combined_keys(bits: Array, n_valid: Array, t: int) -> Array:
    """(rows, T) int32 keys: random high bits | position, _INVALID outside
    the first n_valid slots. `bits` is uint32, `n_valid` is (rows, 1)."""
    p = _pos_bits(t)
    pos = jax.lax.broadcasted_iota(jnp.int32, bits.shape, bits.ndim - 1)
    low_mask = jnp.int32((1 << p) - 1)
    rand = jax.lax.shift_right_logical(bits, jnp.uint32(32 - _KEY_BITS)).astype(
        jnp.int32
    )  # < 2^_KEY_BITS: int32-positive, and prefix+3<<shift+low stays < 2^31
    combined = (rand & ~low_mask) | pos
    return jnp.where(pos < n_valid, combined, _INVALID)


def _radix_kth(vals: Array, k: Array, nbits: int) -> Array:
    """Smallest v in [0, 2^nbits) with count(vals <= v) >= k, per row —
    the k-th smallest value for k >= 1 (all-k=0 rows return 0). One bit
    per pass; each pass fixes the next answer bit with a single
    count-reduction.

    Measured schedule notes (real chip, B=256/T=354,
    `benchmarks/radix_ab.py`): a pass's compare+reduce over a (256, 384)
    tile is VPU-COMPUTE-bound at ~1.4 us, with only ~0.7 us of fixed
    per-pass latency — so multi-bit passes (2^g - 1 counts fixing g bits)
    LOSE wall-clock (g=3 measured 103 us vs 63 us for g=1): total count
    work, not pass count, is what's paid. One count per bit is the
    reduction-minimal schedule; the lever that remains is fewer BITS,
    which is why the kernel radixes only the random key bits and resolves
    position ties separately (see `_select_kernel`)."""
    def body(_, carry):
        prefix, bit = carry
        bound = prefix + (bit - 1)
        c0 = jnp.sum((vals <= bound).astype(jnp.int32), axis=-1, keepdims=True)
        # fori_loop (not an unrolled Python loop, which multiplies Mosaic
        # compile time by the pass count) with a halving bit carry so every
        # shift is by a constant
        return jnp.where(c0 >= k, prefix, prefix + bit), bit >> 1

    prefix = jnp.zeros_like(k)
    bit = jnp.full_like(k, jnp.int32(1 << (nbits - 1)))
    prefix, _ = jax.lax.fori_loop(0, nbits, body, (prefix, bit))
    return prefix


def _select_kernel(bits_ref, nv_ref, k_ref, out_ref, *, t_len):
    """One row tile: bits (TILE, T_pad) uint32, nv/k (TILE, 1) int32;
    out (TILE, T_pad) float32 — 1.0 on the selected slots.

    Decomposes the k-smallest-of-(rand | pos) selection the sort fallback
    computes (`_select_xla`) into two exact stages, saving the position
    bits' radix passes (9 of 30 at T=354):

      1. radix-select the k-th smallest of the RANDOM key bits alone
         (multiset threshold v*), `_KEY_BITS - p` one-bit passes;
      2. take every slot with rand < v*, then fill the remaining
         `k - count(rand < v*)` slots from the ties (rand == v*) in
         ascending position order — computed with one inclusive cumsum
         along T as a (TILE, T) @ (T, T) upper-triangular matmul on the
         MXU (counts <= T stay exact in f32), ~1.5 us vs ~1.4 us per
         saved radix pass... for nine saved passes.

    Position-ascending tie fill == (rand, pos)-lexicographic order, so the
    mask is bit-identical to the fallback's threshold on packed keys."""
    p = _pos_bits(t_len)
    pos = jax.lax.broadcasted_iota(jnp.int32, bits_ref.shape, 1)
    rand = jax.lax.shift_right_logical(
        bits_ref[:], jnp.uint32(32 - _KEY_BITS + p)
    ).astype(jnp.int32)  # (TILE, T_pad) in [0, 2^(KEY_BITS-p))
    valid = pos < nv_ref[:]
    rand = jnp.where(valid, rand, _INVALID)
    k = k_ref[:]

    v_star = _radix_kth(rand, k, _KEY_BITS - p)
    lt = rand < v_star
    eq = rand == v_star  # never matches _INVALID: v* < 2^(KEY_BITS-p)
    need = (k - jnp.sum(lt.astype(jnp.int32), axis=-1, keepdims=True)).astype(
        jnp.float32
    )
    # inclusive cumsum of the tie indicators in position order, on the MXU
    t_pad = bits_ref.shape[1]
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (t_pad, t_pad), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (t_pad, t_pad), 1)
    ).astype(jnp.float32)
    csum = jnp.dot(eq.astype(jnp.float32), tri, preferred_element_type=jnp.float32)
    sel = (lt | (eq & (csum <= need))) & (k > 0)
    out_ref[:] = sel.astype(jnp.float32)


def _row_tile(t_pad: int) -> int:
    """Rows per grid tile: target ~400K elements so each radix pass does
    enough VPU work to amortize its fixed ~0.7 us latency (measured sweep
    in benchmarks/radix_ab.py: 43 us at 1024 rows vs 49 at 256 for
    B=256/T=354; T=48 is compute-flat past 768 rows). The tile's 5
    (rows, T) VMEM buffers + the (T, T) tie-fill triangle stay ~8 MB,
    inside the ~16 MB VMEM budget for any supported T (<= 512)."""
    return max(_ROW_TILE, _round_up((_ROW_TILE * 1536) // t_pad, 8))


def _select_pallas(bits: Array, n_valid: Array, k: Array) -> Array:
    rows, t_len = bits.shape
    t_pad = _round_up(t_len, 128)
    tile = _row_tile(t_pad)
    rows_pad = _round_up(rows, tile)
    bits_p = jnp.pad(bits, ((0, rows_pad - rows), (0, t_pad - t_len)))
    nv_p = jnp.pad(n_valid, ((0, rows_pad - rows), (0, 0)))
    k_p = jnp.pad(k, ((0, rows_pad - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_select_kernel, t_len=t_len),
        grid=(rows_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_pad, t_pad), jnp.float32),
    )(bits_p, nv_p, k_p)
    return out[:rows, :t_len] > 0


def _select_kernel_packed(
    bits_ref, nv_ref, k_ref, pos_ref, seg_ref, tri_ref, out_ref,
    *, t_len, g, nbits,
):
    """Lane-packed variant for short T: `g` logical rows share one physical
    row of `L = round_up(g*t_len, 128)` lanes (a FREE row-major reshape),
    so every radix pass sweeps full lanes instead of the <=50%-utilized
    padded tile, and the per-segment counts come off the MXU as one
    (TILE, L) @ (L, G) matmul instead of a cross-lane VPU reduce.

    Inputs per tile: bits (TILE, L) uint32; nv/k (TILE, G) int32;
    pos (1, L) int32 position-within-segment (HUGE on pad lanes);
    seg (L, G) f32 one-hot segment membership; tri (L, L) f32
    within-segment inclusive upper-triangle.

    EXACTNESS INVARIANT: every in-kernel dot runs at DEFAULT matmul
    precision (single-pass bf16 operands, f32 accumulation). That is
    exact here ONLY because every operand is 0/1 or an integer <= 192
    (< 2^8, bf16-exact) — the one value spanning the full 2^nbits range
    (the radix threshold) is never a dot operand; it lives lane-expanded
    and is updated by exact 0/1-digit increments in int32. Anything that
    raises a dot-operand bound past 256 (bigger pack T, count semantics)
    must revisit this or the sort-oracle bit-identity breaks.
    """
    f32 = jnp.float32

    def expand(col):
        """(TILE, G) -> (TILE, L), value broadcast per segment. DEFAULT
        matmul precision (one MXU pass): every value expanded here is an
        integer <= max(T, 256)... <= 192 < 2^8, exact in bf16 — 0/1 radix
        digits, nv/k/need counts. (HIGHEST would be 6 passes per pass of
        the radix loop — measured dominant before the incremental-prefix
        rework below.)"""
        return jnp.dot(col.astype(f32), seg_ref[:].T,
                       preferred_element_type=f32)

    def seg_count(mask):  # (TILE, L) bool -> (TILE, G) int32; counts <= T
        c = jnp.dot(mask.astype(f32), seg_ref[:], preferred_element_type=f32)
        return c.astype(jnp.int32)

    pos = pos_ref[:]
    nv_full = expand(nv_ref[:]).astype(jnp.int32)
    rand = jax.lax.shift_right_logical(
        bits_ref[:], jnp.uint32(32 - nbits)
    ).astype(jnp.int32)
    rand = jnp.where(pos < nv_full, rand, _INVALID)
    k = k_ref[:]  # (TILE, G)

    # The per-pass bound lives LANE-EXPANDED and updates incrementally:
    # bound values span 2^nbits (not bf16-exact), but the per-pass
    # INCREMENT is digit*step with digit in {0,1} — the 0/1 digit plane is
    # exact at one-pass DEFAULT precision, and the integer adds stay in
    # int32. No full-precision expansion anywhere in the loop.
    def body(_, carry):
        prefix_full, step = carry
        bound_full = prefix_full + (step - 1)
        c0 = seg_count(rand <= bound_full)
        digit = (c0 < k).astype(f32)  # 1 -> answer bit set
        prefix_full = prefix_full + expand(digit).astype(jnp.int32) * step
        return prefix_full, step >> 1

    prefix_full = jnp.zeros_like(rand)
    v_full, _ = jax.lax.fori_loop(
        0, nbits, body, (prefix_full, jnp.int32(1 << (nbits - 1)))
    )
    lt = rand < v_full
    eq = rand == v_full  # _INVALID never matches: v* < 2^nbits
    need = k - seg_count(lt)
    csum = jnp.dot(eq.astype(f32), tri_ref[:], preferred_element_type=f32)
    sel = (lt | (eq & (csum <= expand(need)))) & (expand(k).astype(jnp.int32) > 0)
    out_ref[:] = sel.astype(jnp.float32)


def _select_pallas_packed(bits: Array, n_valid: Array, k: Array, g: int) -> Array:
    rows, t_len = bits.shape
    lanes = _round_up(g * t_len, 128)
    p = _pos_bits(t_len)
    rows_g = _round_up(rows, g)
    rows_phys = rows_g // g
    tile = max(256, _round_up((_ROW_TILE * 1536) // lanes, 8))
    phys_pad = _round_up(rows_phys, tile)

    bits_p = jnp.pad(bits, ((0, rows_g - rows), (0, 0)))
    bits_p = bits_p.reshape(rows_phys, g * t_len)  # row-major: free
    bits_p = jnp.pad(bits_p, ((0, phys_pad - rows_phys), (0, lanes - g * t_len)))
    nv_p = jnp.pad(n_valid, ((0, rows_g - rows), (0, 0))).reshape(rows_phys, g)
    nv_p = jnp.pad(nv_p, ((0, phys_pad - rows_phys), (0, 0)))
    k_p = jnp.pad(k, ((0, rows_g - rows), (0, 0))).reshape(rows_phys, g)
    k_p = jnp.pad(k_p, ((0, phys_pad - rows_phys), (0, 0)))

    # iota-built (NOT numpy literals): this function is traced inside the
    # custom_partitioning wrapper, which rejects closure constants
    # (`assert not len(consts)`) — as computed values they trace clean and
    # XLA hoists them as loop invariants inside the step scan
    lane = jnp.arange(lanes, dtype=jnp.int32)
    seg_of = lane // t_len
    in_seg = seg_of < g
    pos = jnp.where(in_seg, lane % t_len, jnp.int32(2**31 - 1))[None, :]
    seg = (
        in_seg[:, None] & (seg_of[:, None] == jnp.arange(g, dtype=jnp.int32)[None, :])
    ).astype(jnp.float32)
    tri = (
        in_seg[:, None]
        & in_seg[None, :]
        & (seg_of[:, None] == seg_of[None, :])
        & (lane[:, None] <= lane[None, :])
    ).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _select_kernel_packed, t_len=t_len, g=g, nbits=_KEY_BITS - p
        ),
        grid=(phys_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, g), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, g), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((phys_pad, lanes), jnp.float32),
    )(
        bits_p, nv_p, k_p,
        pos, seg, tri,
    )
    out = out[:rows_phys, : g * t_len].reshape(rows_g, t_len)
    return out[:rows] > 0


def _pack_factor(t_len: int) -> int:
    """Logical rows per physical row for the packed kernel (1 = unpacked)."""
    return max(1, 384 // t_len)


def _select_xla(bits: Array, n_valid: Array, k: Array) -> Array:
    """Sort-based fallback — same mask bit-for-bit (keys are unique, so
    both paths threshold at the same k-th smallest key)."""
    t_len = bits.shape[-1]
    combined = _combined_keys(bits, n_valid, t_len)
    kth = jnp.take_along_axis(
        jnp.sort(combined, axis=-1), jnp.maximum(k - 1, 0), axis=-1
    )
    return (combined <= kth) & (k > 0)


def _select_local(bits: Array, n_valid: Array, k: Array) -> Array:
    """Backend-routed local (per-shard) computation."""
    t_len = bits.shape[-1]
    if jax.default_backend() == "tpu" and t_len <= 512:
        # the unpacked kernel's VMEM accounting (_row_tile) is validated
        # to T <= 512 (production is 354); longer shapes would also grow
        # the (T, T) tie-fill triangle toward the 16 MB scoped limit —
        # hand them to the bit-identical sort fallback rather than
        # budget-tuning for never-seen sizes
        g = _pack_factor(t_len)
        if g >= 2:
            return _select_pallas_packed(bits, n_valid, k, g)
        return _select_pallas(bits, n_valid, k)
    return _select_xla(bits, n_valid, k)


def _row_sharding(mesh, arg_infos):
    """Rows follow the bits operand's leading-axis sharding, T replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = getattr(arg_infos[0], "sharding", None)
    spec = s.spec if s is not None and s.spec is not None else P()
    row = spec[0] if len(spec) > 0 else None
    return NamedSharding(mesh, P(row, None))


def _infer_sharding(mesh, arg_infos, result_infos):
    return _row_sharding(mesh, arg_infos)


def _partition(mesh, arg_infos, result_infos):
    sharding = _row_sharding(mesh, arg_infos)
    return mesh, _select_local, sharding, (sharding,) * 3


# Rows are fully independent, so under a multi-chip mesh the selection
# partitions on the row axis (which carries the batch sharding after the
# (B,C,T)->(B*C,T) reshape). Without this annotation XLA's SPMD partitioner
# would replicate the Mosaic custom call — a cross-chip all-gather of the
# whole bits plane per step. The sharding_rule string serves the Shardy
# partitioner; the callbacks serve classic GSPMD.
_select_partitioned = custom_partitioning(_select_local)
_select_partitioned.def_partition(
    partition=_partition,
    infer_sharding_from_operands=_infer_sharding,
    sharding_rule="i j, i k, i l -> i j",
)


def fake_select_mask(bits: Array, n_valid: Array, k: Array) -> Array:
    """Exact-k uniform selection mask over front-packed valid slots.

    `bits`: (B, C, T) uint32 random bits; `n_valid`, `k`: (B, C) int32 with
    0 <= k <= n_valid. Returns (B, C, T) bool with exactly k True per row,
    uniformly distributed over the first n_valid slots. Fused Pallas radix
    select on TPU (row-partitioned across a mesh via custom_partitioning),
    sort-based XLA elsewhere — identical output either way.
    """
    b, c, t = bits.shape
    bits2 = bits.reshape(b * c, t)
    nv2 = n_valid.reshape(b * c, 1)
    k2 = k.reshape(b * c, 1)
    if jax.default_backend() == "tpu":
        sel = _select_partitioned(bits2, nv2, k2)
    else:
        # off-TPU the local fn is already plain partitionable XLA; skip the
        # custom-call indirection on the test/dryrun path
        sel = _select_xla(bits2, nv2, k2)
    return sel.reshape(b, c, t)
