"""Matmul precision control.

TPU matmuls default to bf16 accumulation of f32 inputs; the geometric solvers
(DLT, Procrustes, projection) need true f32. Decorating the hot geometry
functions with `f32_matmuls` pins `jax.default_matmul_precision('highest')`
inside their traces without touching the neural-model paths, which keep the
fast bf16 default.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Run `fn` with full-f32 matmul precision (TPU: fp32 MXU passes)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
