"""Accuracy-refined transcendental helpers for the TPU forward path.

Measured on the v5e (benchmarks/parity_ledger.py, r4): the chip's `log` /
`log1p` is ~3.7e-5 RELATIVE off the correctly-rounded value (~300 ulp; the
host-CPU backend and torch are ~1 ulp), while the chip's `exp` holds ~1.4e-6
relative (~10 ulp). The SCI stage multiplies the softplus'd kernel by
squared time distances up to hours^2=36 and by the kappa=10 transient
sharpening, so one inaccurate 6-element `log1p` fans out to ~1.5e-2 on the
transient logits and ~5e-4 on the latent — the whole previously-unattributed
on-chip parity residue (PARITY.md r3 hand-waved it as "VPU transcendentals";
this pins it to `log`).

The fix: one Newton step of f(l) = exp(l) - s around the chip's l = log(s),

    l' = l + (s * exp(-l) - 1)

which replaces the log's ~300-ulp error with the exp's ~10-ulp error. The
correction is wrapped in `stop_gradient`: it is an ulp-scale constant offset
whose autodiff contribution is numerical noise, and the base expression
already carries the exact softmax/sigmoid gradients.

Cost: one extra `exp` on the REDUCED tensor (the (C,) kernel, the (B,C,R)
logsumexp output) — never on the (B,C,T,R) broadcast grid. Measured
wall-neutral at the production shape (see PARITY.md r4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Trust region for the Newton correction: outside s in (1e-30, 1e30) the
# intermediate exp(-log(s)) leaves f32's NORMAL range (|log s| > ~69 starts
# approaching the exp(±87.3) subnormal/overflow edges) and the step itself
# breaks down — measured on the v5e, exp(-l) flushes to zero for
# l in [87.3, 88.7] (subnormal FTZ), making corr = s*0 - 1 = exactly -1.0,
# and s = inf makes it inf*0 - 1 = NaN. Outside the region the correction
# is dropped and the platform log passes through unrefined: those are
# divergence regimes (softplus arguments > 69) where the reference's own
# naive torch.log(1 + e^x) is the semantics to match, not a tighter one.
_NEWTON_LO = 1e-30
_NEWTON_HI = 1e30


def _log_refined(s: Array) -> Array:
    """`log(s)` for s >= 0 with one Newton correction of the platform log.

    Handles s == 0 (all-masked logsumexp rows): log(0) = -inf passes
    through; the correction is where-guarded to the trust region above so
    `0 * exp(inf)` / subnormal-flush cases never corrupt the base value.
    """
    l = jnp.log(s)
    corr = s * jnp.exp(-l) - 1.0
    corr = jnp.where((s > _NEWTON_LO) & (s < _NEWTON_HI), corr, 0.0)
    return l + jax.lax.stop_gradient(corr)


def softplus_refined(x: Array) -> Array:
    """`log(1 + exp(x))` with the log Newton-corrected (chip-accurate).

    Matches the reference's positivity transform (interpolation_layer.py:51,
    rbf.py:78) to ~exp-ulp instead of the chip log's ~300 ulp. For the
    parameter ranges seen here (|x| small) the naive form is stable; the
    reference itself uses torch.log(1 + e^x), so the overflow behavior at
    x > ~88.7 (s = inf -> result inf) is reference semantics and the
    correction is dropped there (see _NEWTON_HI above).
    """
    return _log_refined(1.0 + jnp.exp(x))


def logsumexp_refined(logits: Array, axis: int, keepdims: bool = False) -> Array:
    """`logsumexp` with the final log Newton-corrected.

    Same max-shift guard as jax.nn.logsumexp: rows whose entries are all
    -inf (fully masked observations, `+log(0)` masking) yield -inf, not NaN.
    The gradient is the exact softmax of the base expression (the correction
    is stop_gradient'ed).
    """
    m = jax.lax.stop_gradient(jnp.max(logits, axis=axis, keepdims=True))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.exp(logits - m), axis=axis, keepdims=True)
    out = m + _log_refined(s)
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out
