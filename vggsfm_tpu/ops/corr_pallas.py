"""Pallas TPU kernel: fused correlation sampling for the tracker.

The tracker's hot op computes, per track, the dot product of its feature
vector with bilinearly-sampled feature-map values on a (2r+1)^2 window
around the track (vggsfm_tpu.models.tracker.corr_sample). The XLA version
gathers 4 corner feature vectors per tap -> 4*(2r+1)^2*C values per track
per level, dominating runtime (measured ~2.5 s per coarse call; the op is
memory-bound, bf16 does not help).

This kernel exploits that correlation is *linear* in the feature map: the
bilinear interpolation can be applied to scalar correlations instead of
C-dim features. Per track it:

  1. DMAs one (2r+2, 2r+2, C) integer-aligned patch from the (padded)
     feature map in HBM into VMEM (a dynamic slice — no gather),
  2. computes (2r+2)^2 integer-grid correlations on the VPU,
  3. (outside the kernel) bilinearly combines them into the (2r+1)^2
     fractional taps — an elementwise op on scalars.

Traffic per track-level drops from 4*(2r+1)^2*C to (2r+2)^2*C values
(~3.2x) and, more importantly, becomes contiguous DMA instead of gather.
Zeros-padding semantics (grid_sample padding_mode='zeros') come from
pre-padding the feature map with r+2 zero pixels per side.

Layout notes: one grid program per track; the frame axis is flattened into
the padded map's row axis so the patch DMA is a single two-level dynamic
slice with scalar-prefetched offsets (packed y*4096+x int32 per track).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_TB = 8  # tracks per program (sublane-aligned block)


def _align8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _corr_kernel(base_ref, feat_ref, fmap_ref, out_ref, patch_ref, sem, *,
                 window: int, C: int):
    """One program = 8 tracks: DMA each patch, emit window^2 int-grid corrs.

    base_ref: scalar-prefetch (T,) int32, y*4096+x packed top-left corner
              in the frame-flattened padded map.
    feat_ref: (8, C) track features (blocked VMEM).
    fmap_ref: (S*Hp, Wp, C) padded maps, frames stacked on rows (ANY/HBM).
    out_ref:  (8, 128) integer-grid correlations (window^2 used lanes).
    """
    blk = pl.program_id(0)

    def make_copy(slot, t):
        code = base_ref[blk * _TB + t]
        y0 = code // 4096
        x0 = code - y0 * 4096
        return pltpu.make_async_copy(
            fmap_ref.at[pl.ds(y0, window), pl.ds(x0, window), :],
            patch_ref.at[slot, pl.ds(0, window), pl.ds(0, window), :],
            sem.at[slot])

    # double-buffered: overlap track t+1's patch DMA with track t's compute
    make_copy(0, 0).start()
    for t in range(_TB):  # static unroll: all VMEM indexing static
        slot = t % 2
        if t + 1 < _TB:
            make_copy((t + 1) % 2, t + 1).start()
        make_copy(slot, t).wait()

        feat = feat_ref[t, :]  # (C,)
        rows = [jnp.sum(patch_ref[slot, i] * feat, axis=-1)[:window]
                for i in range(window)]
        ci = jnp.concatenate(rows)  # (window*window,)
        out_ref[t, :] = jnp.concatenate(
            [ci, jnp.zeros((128 - window * window,), ci.dtype)])


@partial(jax.jit, static_argnames=("radius", "interpret"))
def corr_sample_pallas(fmap: jax.Array, coords: jax.Array,
                       track_feats: jax.Array, radius: int = 4,
                       interpret: bool = False) -> jax.Array:
    """Correlation of tracks against one pyramid level.

    Args:
      fmap: (S, H, W, C) feature maps (level-l resolution).
      coords: (S, N, 2) xy track positions at this level's scale.
      track_feats: (S, N, C).

    Returns (S, N, (2r+1)^2), numerically equal to the XLA
    `corr_sample` path (zeros padding) up to f32 rounding.
    """
    S, H, W, C = fmap.shape
    if C % 128 != 0:
        raise ValueError(
            f"corr_sample_pallas requires C % 128 == 0 (HBM lane tiling); "
            f"got C={C} — use the XLA corr_sample path instead")
    N = coords.shape[1]
    r = radius
    window = 2 * r + 2
    pad = r + 2
    Hp = H + 2 * pad
    Wp = W + 2 * pad
    W1 = 2 * r + 1

    fmap_p = jnp.pad(fmap, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    fmap_flat = fmap_p.reshape(S * Hp, Wp, C)
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))

    base_f = jnp.floor(coords)
    frac = (coords - base_f).astype(jnp.float32)  # (S, N, 2) [fx, fy]
    base_yx = (base_f[..., ::-1] - r + pad).astype(jnp.int32)
    base_yx = jnp.clip(base_yx, 0, jnp.asarray(
        [Hp - window, Wp - window], jnp.int32))
    # flatten the frame into the row offset
    frame_off = (jnp.arange(S, dtype=jnp.int32) * Hp)[:, None]
    gy = base_yx[..., 0] + frame_off
    base_packed = (gy * 4096 + base_yx[..., 1]).reshape(-1)  # (S*N,)

    feats_flat = track_feats.reshape(S * N, C).astype(jnp.float32)

    # pad the flat track axis to the 8-track block size
    T_total = S * N
    t_pad = (-T_total) % _TB
    if t_pad:
        base_packed = jnp.pad(base_packed, (0, t_pad))
        feats_flat = jnp.pad(feats_flat, ((0, t_pad), (0, 0)))
    Tp = T_total + t_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // _TB,),
        in_specs=[
            pl.BlockSpec((_TB, C), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * Hp, Wp, C), lambda t, base: (0, 0, 0),
                         memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((_TB, 128), lambda t, base: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # two slots (double buffering), each padded to aligned tiles;
            # DMA writes and reads address only the [:window, :window]
            # corner of a slot
            pltpu.VMEM((2, _align8(window), _align8(window), C),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = partial(_corr_kernel, window=window, C=C)
    ci = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, 128), jnp.float32),
        interpret=interpret,
    )(base_packed, feats_flat, fmap_flat.astype(jnp.float32))
    ci = ci[:T_total]

    # bilinear combine of integer-grid correlations (outside the kernel)
    ci = ci[:, : window * window].reshape(S, N, window, window)
    fx = frac[..., 0, None, None]
    fy = frac[..., 1, None, None]
    corr = ((1 - fy) * (1 - fx) * ci[..., :W1, :W1]
            + (1 - fy) * fx * ci[..., :W1, 1:]
            + fy * (1 - fx) * ci[..., 1:, :W1]
            + fy * fx * ci[..., 1:, 1:])
    return corr.reshape(S, N, W1 * W1) * scale


# ---------------------------------------------------------------------------
# small-channel variant (fine-former patch pyramids, C = 32)
# ---------------------------------------------------------------------------
#
# The C % 128 == 0 kernel above keeps C as the lane axis. For the fine
# tracker's C = 32 patch features that layout wastes 4x on lane padding,
# and the XLA alternatives are worse: the dot-then-slice einsum re-reads
# the whole patch pyramid per iteration, and the tap gather itself was
# measured at 35 ms per level on v5e (scalar-granularity gathers). Here
# the (row, x, C) axes flatten to (row, x*C) so one patch window is a
# contiguous 2D block — (window) rows x (window*C) lanes — fetched with a
# single DMA per track at 32-element lane alignment.


def _corr_smallc_kernel(base_ref, feat_ref, fmap_ref, out_ref, patch_ref,
                        sem, *, window: int, C: int):
    """One program = 8 tracks over a (S*Hp, Wp*C) row-flattened map.

    base_ref: (T,) int32, y*65536 + x*C packed top-left corner.
    feat_ref: (8, window*C) track features, pre-tiled window times along
              lanes by the caller (tiling inside the kernel would need a
              lane-axis concatenate, which Mosaic cannot lower — observed
              "Input offsets outside of the first tile" on v5e).
    out_ref:  (8, window, 128) integer-grid correlations per row
              (window used lanes; Mosaic cannot reshape lane groups, so
              the (window, window) grid stays 2D).

    The per-tap dot over C is (patch * feat_tiled) @ SEL, where SEL is the
    CONSTANT 0/1 selection matrix SEL[k, x] = [k div C == x] of shape
    (window*C, 128) — lane-subgroup reductions are not expressible as
    Mosaic vector reshapes, but this matmul is, and padding SEL's column
    axis to 128 zero-fills the output lanes without any concatenate.
    """
    blk = pl.program_id(0)

    def make_copy(slot, t):
        code = base_ref[blk * _TB + t]
        y0 = code // 65536
        x0 = code - y0 * 65536
        return pltpu.make_async_copy(
            fmap_ref.at[pl.ds(y0, window), pl.ds(x0, window * C)],
            patch_ref.at[slot, pl.ds(0, window), pl.ds(0, window * C)],
            sem.at[slot])

    WC = window * C
    k_div = jax.lax.broadcasted_iota(jnp.int32, (WC, 128), 0) // C
    x_col = jax.lax.broadcasted_iota(jnp.int32, (WC, 128), 1)
    sel = jnp.where(k_div == x_col, 1, 0).astype(patch_ref.dtype)

    make_copy(0, 0).start()
    for t in range(_TB):
        slot = t % 2
        if t + 1 < _TB:
            make_copy((t + 1) % 2, t + 1).start()
        make_copy(slot, t).wait()

        featk = feat_ref[pl.ds(t, 1), :]  # (1, WC), sublane-broadcasts
        ci = jax.lax.dot_general(
            patch_ref[slot] * featk, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (rows, 128)
        out_ref[t, :, :] = ci[:window]


@partial(jax.jit, static_argnames=("radius", "interpret"))
def corr_sample_pallas_smallc(fmap: jax.Array, coords: jax.Array,
                              track_feats: jax.Array, radius: int = 3,
                              interpret: bool = False) -> jax.Array:
    """Small-C correlation of tracks against one pyramid level.

    Same contract as :func:`corr_sample_pallas` — (S, H, W, C) maps,
    (S, N, 2) positions, (S, N, C) features -> (S, N, (2r+1)^2) — for
    C < 128 (the fine former's 32-channel patch pyramids). Requires
    (W + 2*(r+2)) * C <= 65536 for the packed offsets (true for every
    patch pyramid by orders of magnitude).
    """
    S, H, W, C = fmap.shape
    N = coords.shape[1]
    r = radius
    window = 2 * r + 2
    pad = r + 2
    Hp = H + 2 * pad
    Wp = W + 2 * pad
    W1 = 2 * r + 1
    if Wp * C > 65536:
        raise ValueError("row too wide for packed offsets")

    compute_dtype = fmap.dtype
    fmap_p = jnp.pad(fmap, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    fmap_flat = fmap_p.reshape(S * Hp, Wp * C)
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))

    base_f = jnp.floor(coords)
    frac = (coords - base_f).astype(jnp.float32)
    base_yx = (base_f[..., ::-1] - r + pad).astype(jnp.int32)
    base_yx = jnp.clip(base_yx, 0, jnp.asarray(
        [Hp - window, Wp - window], jnp.int32))
    frame_off = (jnp.arange(S, dtype=jnp.int32) * Hp)[:, None]
    gy = base_yx[..., 0] + frame_off
    base_packed = (gy * 65536 + base_yx[..., 1] * C).reshape(-1)

    feats_flat = track_feats.reshape(S * N, C).astype(compute_dtype)

    T_total = S * N
    t_pad = (-T_total) % _TB
    if t_pad:
        base_packed = jnp.pad(base_packed, (0, t_pad))
        feats_flat = jnp.pad(feats_flat, ((0, t_pad), (0, 0)))
    Tp = T_total + t_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // _TB,),
        in_specs=[
            pl.BlockSpec((_TB, C), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * Hp, Wp * C), lambda t, base: (0, 0),
                         memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((_TB, window, 128), lambda t, base: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _align8(window), window * C), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = partial(_corr_smallc_kernel, window=window, C=C)
    ci = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, window, 128), jnp.float32),
        interpret=interpret,
    )(base_packed, feats_flat, fmap_flat)

    ci = ci[:T_total, :, :window].reshape(S, N, window, window)
    fx = frac[..., 0, None, None]
    fy = frac[..., 1, None, None]
    corr = ((1 - fy) * (1 - fx) * ci[..., :W1, :W1]
            + (1 - fy) * fx * ci[..., :W1, 1:]
            + fy * (1 - fx) * ci[..., 1:, :W1]
            + fy * fx * ci[..., 1:, 1:])
    return corr.reshape(S, N, W1 * W1) * scale
