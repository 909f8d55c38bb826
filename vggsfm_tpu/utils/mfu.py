"""Device-utilization accounting: FLOP counts + MFU for the hot stages.

The reference offers no utilization story (SURVEY §5: ad-hoc prints); the
TPU build's perf claims need one — wall-clock frames/s alone cannot
distinguish "fast" from "under-utilized but small" (VERDICT r2, weak #6).

Design: every jitted hot entry point records (name, abstract args, static
kwargs, call count) into a process-global ledger — a few hundred
nanoseconds per call, always on. `flops_report()` then asks XLA itself for
the FLOPs of each recorded computation via ``lower().compile()
.cost_analysis()`` (the compile hits jit's in-process cache — the
computation already ran), and MFU = achieved FLOP/s over the device's
published bf16 peak. No profiler trace parsing: the tunneled backend's
trace capture is best-effort, while cost_analysis is exact for the
compiled HLO.
"""

from __future__ import annotations

import time

import jax
import numpy as np

# when True, `timed_call` synchronizes after every recorded computation
# (device->host pull of one element — on the tunneled backend
# block_until_ready does NOT drain the dispatch queue, only a transfer
# does) and accumulates honest per-computation seconds. Costs pipeline
# overlap; enable only for a measurement pass.
SYNC_TIMING = False

# name -> {"count": int, "args": tuple[ShapeDtypeStruct...],
#          "kwargs": dict (static/hashable only), "fn": jitted callable}
_LEDGER: dict = {}


def _abstract(x):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return x  # static (non-array) leaf — pass through for lower()


def record(name: str, fn, args: tuple,
           kwargs: dict | None = None) -> None:
    """Count one call to jitted computation `name` at `args`' shapes.

    Repeated calls at new shapes overwrite the stored signature (chunked
    pipelines call at one steady shape; the last chunk may be a remainder
    — close enough for a utilization estimate, and exact when chunk
    counts divide evenly).
    """
    # skip trace-time calls (a BA invoked inside an outer jit records
    # once per compile, not per execution — the outer computation's own
    # ledger entry carries those FLOPs instead)
    if any(isinstance(leaf, jax.core.Tracer)
           for leaf in jax.tree.leaves((args, kwargs))):
        return
    ent = _LEDGER.get(name)
    if ent is None:
        ent = _LEDGER[name] = {"count": 0, "args": None, "kwargs": {},
                               "fn": None}
    ent["count"] += 1
    ent["fn"] = fn
    ent["args"] = tuple(
        jax.tree.map(_abstract, a) if a is not None else None for a in args)
    # abstract array-valued kwargs too: the ledger must never pin device
    # buffers; static (hashable) kwargs pass through for lower()
    ent["kwargs"] = {
        k: (jax.tree.map(_abstract, v)
            if hasattr(v, "shape") and hasattr(v, "dtype") else v)
        for k, v in (kwargs or {}).items()}


def timed_call(name: str, jitted_fn, args: tuple, kwargs: dict):
    """Record + execute one call; in SYNC_TIMING mode also time it
    honestly (sync on one output element) into the ledger."""
    record(name, jitted_fn, args, kwargs)
    if not SYNC_TIMING:
        return jitted_fn(*args, **kwargs)
    t0 = time.time()
    out = jitted_fn(*args, **kwargs)
    leaves = [x for x in jax.tree.leaves(out)
              if hasattr(x, "shape") and getattr(x, "size", 0)]
    if leaves:
        # slice on device FIRST: transferring one element (4 bytes) syncs
        # the queue without paying the tunnel's ~2 s / 96 MB transfer tax
        np.asarray(leaves[0].reshape(-1)[:1])
    dt = time.time() - t0
    ent = _LEDGER.get(name)
    if ent is not None:  # absent when the call was trace-time
        ent["seconds"] = ent.get("seconds", 0.0) + dt
    return out


def reset() -> None:
    _LEDGER.clear()


def flops_of(name: str) -> float | None:
    """FLOPs of one call of the recorded computation, per XLA."""
    ent = _LEDGER.get(name)
    if ent is None or ent["args"] is None or ent["fn"] is None:
        return None
    try:
        lowered = ent["fn"].lower(*ent["args"], **ent["kwargs"])
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None


def flops_report(device=None) -> dict:
    """{name: {calls, flops_per_call, total_flops[, device_s, mfu]}} for
    every recorded computation (None FLOPs when XLA cost analysis is
    unavailable; device_s/mfu only after a SYNC_TIMING pass)."""
    out = {}
    for name, ent in list(_LEDGER.items()):
        per = flops_of(name)
        total = None if per is None else per * ent["count"]
        row = {
            "calls": ent["count"],
            "flops_per_call": per,
            "total_flops": total,
        }
        secs = ent.get("seconds")
        if secs:
            row["device_s"] = round(secs, 4)
            u = mfu(total, secs, device)
            if u is not None:
                row["mfu"] = round(u, 4)
        out[name] = row
    return out


# bf16 MXU peak per chip, FLOP/s (public spec sheets). Keyed by substrings
# of jax Device.device_kind. f32 geometry runs at a fraction of this peak,
# so geometry-stage MFU reads conservatively low — stated in bench detail.
_PEAK_BF16 = (
    ("v6", 918e12),  # Trillium
    ("v5p", 459e12),
    ("v5 lite", 197e12),
    ("v5e", 197e12),
    ("v5", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def peak_flops(device=None) -> float | None:
    """bf16 peak FLOP/s for `device` (default: jax.devices()[0])."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return None


def mfu(total_flops: float | None, seconds: float,
        device=None) -> float | None:
    peak = peak_flops(device)
    if not peak or not total_flops or seconds <= 0:
        return None
    return total_flops / seconds / peak
