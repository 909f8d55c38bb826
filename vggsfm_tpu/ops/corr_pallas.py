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
# contiguous 2D block fetched with one DMA per track.
#
# Mosaic requires dynamic HBM slice starts to be provably divisible by the
# (8, 128) tiling on BOTH dims of a 2D memref ("Failed to prove that a
# tile index in dimension 0 is divisible by the tiling (8)" on v5e
# otherwise). So the DMA fetches a TILE-ALIGNED covering block — 16 rows x
# (window*C + 128) lanes at corners rounded down to (8, 128) multiples,
# asserted via pl.multiple_of — and the kernel resolves the residual
# offsets itself: the lane offset is always a multiple of C, which the
# window-tiled feature vector is invariant to, so it folds into the
# dynamically-built tap-selection matrix; the row offset (0..7) is
# resolved OUTSIDE the kernel by a cheap XLA gather over the 16 emitted
# correlation rows.


def _corr_smallc_kernel(rows_ref, cols_ref, dxl_ref, feat_ref, fmap_ref,
                        out_ref, patch_ref, sem, *, window: int, C: int,
                        rows_blk: int, lanes_blk: int):
    """One program = _TB tracks over a (S*Hp, Wp*C) row-flattened map.

    rows_ref: (T,) int32 covering-block top row, multiple of 8.
    cols_ref: (T,) int32 covering-block left lane, multiple of 128.
    dxl_ref:  (T,) int32 residual lane offset of the true window inside
              the covering block — a multiple of C in [0, 128).
    feat_ref: (_TB, lanes_blk) track features tiled along lanes with
              period C by the caller (tiling inside the kernel would need
              a lane-axis concatenate, which Mosaic cannot lower).
    out_ref:  (_TB, rows_blk, 128) integer-grid correlations per covering
              row (window used lanes; the caller gathers the window rows).

    The per-tap dot over C is (patch * feat_tiled) @ SEL with the dynamic
    selection matrix SEL[k, x] = [(k - dxl) div C == x and
    0 <= k - dxl < window*C] — lane-subgroup reductions are not
    expressible as Mosaic vector reshapes, but this matmul is, and it
    absorbs the residual lane offset for free (feat_tiled has period C,
    so it needs no shift).
    """
    blk = pl.program_id(0)

    def make_copy(slot, t):
        y0 = pl.multiple_of(rows_ref[blk * _TB + t], 8)
        x0 = pl.multiple_of(cols_ref[blk * _TB + t], 128)
        return pltpu.make_async_copy(
            fmap_ref.at[pl.ds(y0, rows_blk), pl.ds(x0, lanes_blk)],
            patch_ref.at[slot],
            sem.at[slot])

    k_idx = jax.lax.broadcasted_iota(jnp.int32, (lanes_blk, 128), 0)
    x_col = jax.lax.broadcasted_iota(jnp.int32, (lanes_blk, 128), 1)

    make_copy(0, 0).start()
    for t in range(_TB):
        slot = t % 2
        if t + 1 < _TB:
            make_copy((t + 1) % 2, t + 1).start()
        make_copy(slot, t).wait()

        dxl = dxl_ref[blk * _TB + t]
        k_rel = k_idx - dxl
        sel = jnp.where((k_rel // C == x_col) & (k_rel >= 0)
                        & (k_rel < window * C), 1, 0).astype(patch_ref.dtype)
        featk = feat_ref[pl.ds(t, 1), :]  # (1, lanes_blk), broadcasts
        ci = jax.lax.dot_general(
            patch_ref[slot] * featk, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (rows_blk, 128)
        out_ref[t, :, :] = ci


@partial(jax.jit, static_argnames=("radius", "interpret"))
def corr_sample_pallas_smallc(fmap: jax.Array, coords: jax.Array,
                              track_feats: jax.Array, radius: int = 3,
                              interpret: bool = False) -> jax.Array:
    """Small-C correlation of tracks against one pyramid level.

    Same contract as :func:`corr_sample_pallas` — (S, H, W, C) maps,
    (S, N, 2) positions, (S, N, C) features -> (S, N, (2r+1)^2) — for
    C < 128 (the fine former's 32-channel patch pyramids).
    """
    S, H, W, C = fmap.shape
    N = coords.shape[1]
    r = radius
    window = 2 * r + 2
    pad = r + 2
    Hp = H + 2 * pad
    Wp = W + 2 * pad
    W1 = 2 * r + 1

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
    gy = (base_yx[..., 0] + frame_off).reshape(-1)  # (S*N,) true top row
    gxl = (base_yx[..., 1] * C).reshape(-1)  # true left lane

    # tile-aligned covering block: 16 rows x (window*C + 128) lanes
    rows_blk = 2 * _TB
    lanes_blk = window * C + 128
    y0a = (gy // 8) * 8
    x0a = (gxl // 128) * 128
    dy = gy - y0a  # row residual in [0, 8)
    dxl = gxl - x0a  # lane residual, multiple of C in [0, 128)

    # pad so every covering block is in-bounds (max y0a + 16 and
    # max x0a + lanes_blk exceed the raw extents by < one tile each)
    lane_pad = (-(Wp * C) % 128) + 128
    fmap_flat = jnp.pad(fmap_flat, ((0, rows_blk), (0, lane_pad)))

    # feature vectors tiled along lanes with period C (the selection
    # matrix absorbs the lane residual, so one tiling serves all offsets)
    reps = lanes_blk // C
    feats_flat = jnp.tile(
        track_feats.reshape(S * N, C).astype(compute_dtype), (1, reps))

    T_total = S * N
    t_pad = (-T_total) % _TB
    if t_pad:
        y0a = jnp.pad(y0a, (0, t_pad))
        x0a = jnp.pad(x0a, (0, t_pad))
        dxl = jnp.pad(dxl, (0, t_pad))
        feats_flat = jnp.pad(feats_flat, ((0, t_pad), (0, 0)))
    Tp = T_total + t_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Tp // _TB,),
        in_specs=[
            pl.BlockSpec((_TB, lanes_blk), lambda t, r_, c_, d_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fmap_flat.shape, lambda t, r_, c_, d_: (0, 0),
                         memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((_TB, rows_blk, 128),
                               lambda t, r_, c_, d_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows_blk, lanes_blk), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = partial(_corr_smallc_kernel, window=window, C=C,
                     rows_blk=rows_blk, lanes_blk=lanes_blk)
    ci = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, rows_blk, 128), jnp.float32),
        interpret=interpret,
    )(y0a, x0a, dxl, feats_flat, fmap_flat)

    # resolve the row residual: gather the window rows out of the 16
    # covering rows (a (T, window, window) pick from (T, 16, 128) — tiny)
    row_idx = dy[:T_total, None] + jnp.arange(window)[None, :]
    ci = jnp.take_along_axis(ci[:T_total], row_idx[..., None], axis=1)
    ci = ci[:, :, :window].reshape(S, N, window, window)
    fx = frac[..., 0, None, None]
    fy = frac[..., 1, None, None]
    corr = ((1 - fy) * (1 - fx) * ci[..., :W1, :W1]
            + (1 - fy) * fx * ci[..., :W1, 1:]
            + fy * (1 - fx) * ci[..., 1:, :W1]
            + fy * fx * ci[..., 1:, 1:])
    return corr.reshape(S, N, W1 * W1) * scale
