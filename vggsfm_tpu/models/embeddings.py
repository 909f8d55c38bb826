"""Positional / harmonic embeddings. Parity: vggsfm/models/utils.py:204-344
and minipytorch3d/harmonic_embedding.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_1d_sincos_pos_embed_from_grid(embed_dim: int,
                                      pos: jax.Array) -> jax.Array:
    """(M,) positions -> (M, D) [sin | cos] embedding (utils.py:282-305)."""
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = pos.reshape(-1)[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size) -> jax.Array:
    """(1, H, W, D) 2D sincos embedding grid (utils.py:219-250, but NHWC)."""
    if isinstance(grid_size, tuple):
        gh, gw = grid_size
    else:
        gh = gw = grid_size
    grid_w, grid_h = jnp.meshgrid(jnp.arange(gw, dtype=jnp.float32),
                                  jnp.arange(gh, dtype=jnp.float32),
                                  indexing="xy")
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid_w)
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid_h)
    emb = jnp.concatenate([emb_h, emb_w], axis=1)
    return emb.reshape(1, gh, gw, embed_dim)


def get_2d_embedding(xy: jax.Array, C: int,
                     cat_coords: bool = True) -> jax.Array:
    """Per-point sin/cos embedding of 2D coords, (..., N, 2) -> (..., N, 2C).

    Uses the reference's *linear* frequency ladder
    ``arange(0, C, 2) * (1000 / C)`` (utils.py:308-344), interleaving sin at
    even and cos at odd channels.
    """
    x = xy[..., 0:1]
    y = xy[..., 1:2]
    div_term = (jnp.arange(0, C, 2, dtype=jnp.float32) *
                (1000.0 / C))[None, :]

    pe_x = jnp.stack([jnp.sin(x * div_term), jnp.cos(x * div_term)],
                     axis=-1).reshape(xy.shape[:-1] + (C,))
    pe_y = jnp.stack([jnp.sin(y * div_term), jnp.cos(y * div_term)],
                     axis=-1).reshape(xy.shape[:-1] + (C,))
    pe = jnp.concatenate([pe_x, pe_y], axis=-1)
    if cat_coords:
        pe = jnp.concatenate([xy, pe], axis=-1)
    return pe


def harmonic_embedding(x: jax.Array, n_harmonic_functions: int = 10,
                       omega_0: float = 1.0, logspace: bool = True,
                       append_input: bool = False) -> jax.Array:
    """[sin(2^k w x) | cos(2^k w x)] harmonic embedding.

    Parity: minipytorch3d/harmonic_embedding.py (used by PoseEmbedding,
    camera_predictor.py:79-84).
    """
    if logspace:
        freqs = 2.0 ** jnp.arange(n_harmonic_functions, dtype=jnp.float32)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (n_harmonic_functions - 1),
                             n_harmonic_functions, dtype=jnp.float32)
    embed = (x[..., None] * (freqs * omega_0)).reshape(
        x.shape[:-1] + (x.shape[-1] * n_harmonic_functions,))
    out = [jnp.sin(embed), jnp.cos(embed)]
    if append_input:
        out.append(x)
    return jnp.concatenate(out, axis=-1)
