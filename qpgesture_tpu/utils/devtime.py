"""Device-only timing and FLOP/MFU accounting.

On tunnel-attached hosts every dispatch is a relay RPC: end-to-end wall
clock blends 15-30 ms of link round trip into every measurement, making
single-chip efficiency unjudgeable from e2e numbers alone (the reference's
own baseline is CPU NumPy — README.md:35 — so raw speedup says nothing
about whether the chip is busy). This module separates the two:

  * ``measure_link_s`` — the per-dispatch round-trip floor, measured with a
    trivial program on device-resident data;
  * ``device_seconds_per_iter`` — true on-device time of a program,
    measured by running it K times *inside one dispatch* (a lax.scan whose
    body is data-dependent on the previous iteration via
    ``lax.optimization_barrier``, so XLA can neither hoist the
    loop-invariant computation out of the scan nor CSE iterations) at two
    different K and differencing — which cancels the per-dispatch link
    constant exactly;
  * ``cost_analysis_flops`` — XLA's own FLOP count for a compiled program
    (convs/matmuls; Pallas custom calls are NOT counted — pass analytic
    counts for those);
  * ``peak_flops_per_s`` — per-chip peak for MFU normalization.
"""
from __future__ import annotations

import time
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

# Peak dense bf16 matmul FLOP/s per chip, by device_kind substring.
# (Public spec sheets; f32 HIGHEST-precision matmuls run as multi-pass
# bf16 — ~6 passes — so their effective ceiling is peak/6.)
_PEAKS_BF16 = (
    ("v5 lite", 197e12),   # TPU v5e
    ("v5litepod", 197e12),
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v6 lite", 918e12),   # Trillium
    ("v6e", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def peak_flops_per_s(device=None) -> Tuple[str, float]:
    """(device_kind, peak bf16 FLOP/s). Unknown kinds (e.g. the virtual CPU
    mesh) report 0.0 — callers should then omit MFU rather than fabricate
    it."""
    import jax
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "unknown")
    low = kind.lower()
    for sub, peak in _PEAKS_BF16:
        if sub in low:
            return kind, peak
    return kind, 0.0


def _force(out):
    """Force completion of a dispatch by FETCHING (not merely blocking on)
    its first leaf. On relay-attached hosts ``block_until_ready`` can
    resolve without any device round trip for small-output dispatches
    (the client defers them until a fetch), which silently turns every
    wall-clock measurement into ~0. A host fetch is unambiguous. Callers
    keep the fetched payload tiny (the loops below return scalars)."""
    import jax

    return np.asarray(jax.tree_util.tree_leaves(out)[0])


def _median_time(call: Callable[[], object], reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(call())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_link_s(reps: int = 15) -> float:
    """Median round trip of a trivial dispatch on device-resident data: the
    fixed per-call cost every e2e latency figure includes."""
    import jax
    import jax.numpy as jnp

    x = jax.device_put(jnp.zeros((), jnp.float32))
    f = jax.jit(lambda a: a + 1.0)
    _force(f(x))  # compile
    return _median_time(lambda: f(x), reps)


def _fold_token(out, tok):
    """Fold a runtime-dependent int32 out of ``out`` into ``tok`` so the
    next scan iteration has a true data dependency on this one (nothing
    here is a static constant, so XLA cannot fold it away)."""
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "size") and leaf.size:
            tok = tok + jnp.ravel(leaf)[0].astype(jnp.int32)
    return tok


def _make_loop(fn: Callable, n_iters: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(args):
        def body(carry, _):
            a, _tok = lax.optimization_barrier((args, carry))
            # Barrier the FULL output before folding one element out of it:
            # without this, XLA's slice-through-dot/broadcast rewrites
            # shrink wide producers to the single folded element and the
            # loop no longer measures fn at all (observed: a (48, 28K)
            # HIGHEST matmul timed as 0 ms/iter).
            out = lax.optimization_barrier(fn(*a))
            return _fold_token(out, carry), ()

        carry, _ = lax.scan(body, jnp.zeros((), jnp.int32), None,
                            length=n_iters)
        return carry

    return loop


def device_seconds_per_iter(fn: Callable, args: Sequence,
                            k_small: int = 4, k_large: int = 16,
                            reps: int = 5) -> Tuple[float, float]:
    """True device seconds per execution of ``fn(*args)``.

    Returns (seconds_per_iter, compile_seconds). ``args`` are device_put
    once; fn must be a jit-traceable function of them. The k_large-vs-
    k_small difference cancels per-dispatch overhead (link RTT, host work),
    so the result is the on-device execution time alone.
    """
    import jax

    args = jax.device_put(tuple(args))
    loop_s = _make_loop(fn, k_small)
    loop_l = _make_loop(fn, k_large)
    t0 = time.perf_counter()
    cs = loop_s.lower(args).compile()
    cl = loop_l.lower(args).compile()
    compile_s = time.perf_counter() - t0
    _force(cs(args)), _force(cl(args))  # warmup
    t_s = _median_time(lambda: cs(args), reps)
    t_l = _median_time(lambda: cl(args), reps)
    per_iter = (t_l - t_s) / (k_large - k_small)
    # guard against link-jitter producing a nonsensical (negative or
    # > total/k) estimate on congested links
    per_iter = min(max(per_iter, 0.0), t_l / k_large)
    return per_iter, compile_s


def chained_seconds_per_iter(step: Callable, carry0, extras: Sequence,
                             per_iter_args: Optional[Callable] = None,
                             k_small: int = 2, k_large: int = 8,
                             reps: int = 5) -> Tuple[float, float]:
    """device_seconds_per_iter for self-chaining programs (training steps):
    ``step(carry, *extras, x_i) -> (carry, ...)``. The carry dependency
    already serializes iterations, so no barrier is needed.

    per_iter_args(i) supplies the i-th per-iteration input (e.g. rng keys);
    stacked over the scan. Returns (seconds_per_iter, compile_seconds)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    carry0, extras = jax.device_put((carry0, tuple(extras)))

    def make(n):
        if per_iter_args is not None:
            xs = jax.device_put(
                jax.tree_util.tree_map(
                    lambda *ls: np.stack(ls),
                    *[per_iter_args(i) for i in range(n)]))
        else:
            xs = None

        @jax.jit
        def loop(carry, extras, xs):
            def body(c, x):
                out = step(c, *extras, x) if x is not None \
                    else step(c, *extras)
                return out[0], ()

            c, _ = lax.scan(body, carry, xs, length=n)
            # scalar return keeps _force's host fetch to 4 bytes (the
            # carry chain itself serializes iterations, so slicing the
            # final state cannot dead-code any iteration)
            return jnp.ravel(jax.tree_util.tree_leaves(c)[0])[0]

        return loop, xs

    loop_s, xs_s = make(k_small)
    loop_l, xs_l = make(k_large)
    t0 = time.perf_counter()
    cs = loop_s.lower(carry0, extras, xs_s).compile()
    cl = loop_l.lower(carry0, extras, xs_l).compile()
    compile_s = time.perf_counter() - t0
    _force(cs(carry0, extras, xs_s))
    _force(cl(carry0, extras, xs_l))
    t_s = _median_time(lambda: cs(carry0, extras, xs_s), reps)
    t_l = _median_time(lambda: cl(carry0, extras, xs_l), reps)
    per_iter = (t_l - t_s) / (k_large - k_small)
    per_iter = min(max(per_iter, 0.0), t_l / k_large)
    return per_iter, compile_s


def cost_analysis_flops(jitted, *args) -> Optional[float]:
    """XLA's FLOP estimate for jitted(*args), or None if unavailable.
    Counts convolutions and dots; Pallas custom calls contribute 0."""
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return None


def mfu(flops: float, seconds: float, peak: float) -> Optional[float]:
    """Model FLOP utilization vs the chip's bf16 peak; None when the peak
    is unknown (virtual CPU mesh)."""
    if not peak or seconds <= 0:
        return None
    return flops / seconds / peak
