"""CoTracker-style iterative track transformer (Flax).

Parity: vggsfm/models/track_modules/blocks.py:192-471 (EfficientUpdateFormer,
correlation blocks) and base_track_predictor.py:15-238, track_predictor.py.

TPU redesign notes:
  * correlation uses the fused sample-then-dot form (the reference's
    `EfficientCorrBlock`, blocks.py:419-471): bilinear interpolation is
    linear, so sampling the correlation surface equals dotting the sampled
    feature neighborhood with the track feature — this avoids materializing
    the (B,S,N,H,W) correlation volume entirely and is mathematically equal
    to the default `CorrBlock` path;
  * the iteration loop is a static Python unroll (6 iters) inside one jit;
  * everything is batched (B, S frames, N tracks) with N as the natural
    mesh-sharding axis (attention factorizes per-track over time and
    per-frame over tracks — no cross term).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vggsfm_tpu.models.embeddings import (
    get_2d_embedding,
    get_2d_sincos_pos_embed,
)
from vggsfm_tpu.models.encoders import BasicEncoder, ShallowEncoder
from vggsfm_tpu.models.layers import AttnBlock, CrossAttnBlock, group_norm_1
from vggsfm_tpu.models.sampling import (
    bilinear_sample,
    interpolate_bilinear,
    sample_features4d,
    subpixel_parabola,
)


def build_corr_pyramid(fmaps: jax.Array, num_levels: int,
                       cfirst: bool = False) -> list:
    """(B, S, H, W, C) -> list of `num_levels` maps, 2x avg-pooled each.

    With `cfirst` the levels are laid out (B, S, C, H, W): ONE transpose
    at level 0, then channel-first pooling — the per-level NHWC->C-first
    relayouts inside the fine corr loop cost ~20 ms per 16k-patch call
    otherwise (profiler trace, tools/perf_probe2.py).

    Small maps stop the pyramid early (reference semantics, blocks.py:
    355-361 pools only while the map is >= 2x2): a 2x2 VALID pool of a
    1-wide map would yield a 0-size level, which downstream chunk sizing
    divides by. Callers pad the missing correlation features with zeros
    (BaseTrackerPredictor's transformer_dim pad), so fewer levels is safe.
    """
    B, S, H, W, C = fmaps.shape
    if cfirst:
        x = fmaps.reshape(B * S, H, W, C).transpose(0, 3, 1, 2)
        pyramid = [x.reshape(B, S, C, H, W)]
        for _ in range(num_levels - 1):
            if x.shape[2] < 2 or x.shape[3] < 2:
                break
            x = jax.lax.reduce_window(
                x, jnp.zeros((), x.dtype), jax.lax.add,
                (1, 1, 2, 2), (1, 1, 2, 2), "VALID") / jnp.asarray(
                    4.0, x.dtype)
            h, w = x.shape[2:]
            pyramid.append(x.reshape(B, S, C, h, w))
        return pyramid
    pyramid = [fmaps]
    x = fmaps.reshape(B * S, H, W, C)
    for _ in range(num_levels - 1):
        if x.shape[1] < 2 or x.shape[2] < 2:
            break
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h, w = x.shape[1:3]
        pyramid.append(x.reshape(B, S, h, w, C))
    return pyramid


def _pool_matrix(H: int, W: int, dtype) -> jax.Array:
    """(H//2 * W//2, H*W) flat-spatial 2x2 VALID average-pool matrix."""
    import numpy as np

    H2, W2 = H // 2, W // 2
    P = np.zeros((H2 * W2, H * W), np.float32)
    for o in range(H2):
        for p in range(W2):
            for dy in range(2):
                for dx in range(2):
                    P[o * W2 + p, (2 * o + dy) * W + (2 * p + dx)] = 0.25
    return jnp.asarray(P, dtype)


def build_corr_pyramid_flat(x: jax.Array, hw: tuple, num_levels: int):
    """Flat channel-first pyramid: (B, S, C, H*W) levels, pooled by
    matmul against a static 2x2-average matrix on the FLAT spatial axis.

    The (.., H, W) unflattened layouts tile their two minor dims to
    (8, 128) — a ~4x padding expansion at the fine tracker's 31x31
    patches that dominated the stage in layout copies; flat spatial
    pads 961 -> 1024 (~7%) and every consumer (full-map correlation,
    window extraction via one-hot matmuls) contracts the flat axis
    directly on the MXU.

    Returns (levels list of (B, S, C, HW_l), hws list of (H_l, W_l)).
    """
    B, S, C, _ = x.shape
    H, W = hw
    levels, hws = [x], [(H, W)]
    for _ in range(num_levels - 1):
        if H < 2 or W < 2:
            break
        P = _pool_matrix(H, W, x.dtype)
        x = jnp.einsum("bscx,ox->bsco", x, P)
        H, W = H // 2, W // 2
        levels.append(x)
        hws.append((H, W))
    return levels, hws


def _sample_flat(x0: jax.Array, qp: jax.Array, hw: tuple) -> jax.Array:
    """Bilinear-sample flat channel-first features: x0 (B, C, HW) at
    qp (B, N, 2) -> (B, N, C). Border-clamped, via a 4-tap one-hot
    weight vector contracted on the MXU (no scalar gathers)."""
    H, W = hw
    x_, y_ = qp[..., 0], qp[..., 1]
    x_ = jnp.clip(x_, 0.0, W - 1.0)
    y_ = jnp.clip(y_, 0.0, H - 1.0)
    x0i = jnp.floor(x_)
    y0i = jnp.floor(y_)
    fx = (x_ - x0i)[..., None]
    fy = (y_ - y0i)[..., None]
    x0i = x0i.astype(jnp.int32)
    y0i = y0i.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)
    pos = jnp.arange(H * W, dtype=jnp.int32)

    def tap(yy, xx, w):
        return (pos == (yy * W + xx)[..., None]).astype(x0.dtype) * w

    wvec = (tap(y0i, x0i, (1 - fy) * (1 - fx))
            + tap(y0i, x1i, (1 - fy) * fx)
            + tap(y1i, x0i, fy * (1 - fx))
            + tap(y1i, x1i, fy * fx))  # (B, N, HW)
    return jnp.einsum("bcx,bnx->bnc", x0, wvec)


def _global_match_flat(levels0: jax.Array, query_feats: jax.Array,
                       qp: jax.Array, hw: tuple):
    """Correlation-argmax init for flat channel-first fmaps (no cycle).

    levels0 (B, S, C, HW), query_feats (B, N, C), qp (B, N, 2) ->
    coords (B, S, N, 2) at fmap scale. Same cosine-similarity + 3x3
    parabola refinement as `global_match_coords`.
    """
    B, S, C, HW = levels0.shape
    H, W = hw

    def l2n(x, axis):
        return x * jax.lax.rsqrt(
            jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis,
                    keepdims=True) + 1e-12).astype(x.dtype)

    qf = l2n(query_feats.astype(levels0.dtype), -1)
    fm = l2n(levels0, 2)
    corr = jnp.einsum("bscx,bnc->bsnx", fm, qf,
                      preferred_element_type=jnp.float32)
    idx = jnp.argmax(corr, axis=-1)  # (B, S, N)
    iy = idx // W
    ix = idx % W

    def val(dy, dx):
        yy = jnp.clip(iy + dy, 0, H - 1)
        xx = jnp.clip(ix + dx, 0, W - 1)
        return jnp.take_along_axis(corr, (yy * W + xx)[..., None],
                                   axis=-1)[..., 0]

    off_x, off_y, _ = subpixel_parabola(val)
    coords = jnp.stack([ix + off_x, iy + off_y], axis=-1).astype(
        jnp.float32)
    return coords.at[:, 0].set(qp.astype(jnp.float32))


def corr_sample_flat(levels: list, hws: list, coords: jax.Array,
                     track_feats: jax.Array, radius: int) -> jax.Array:
    """Correlation features from a flat channel-first pyramid.

    levels[i]: (B, S, C, HW_i); coords (B, S, N, 2) level-0 scale;
    track_feats (B, S, N, C). Full correlation map per level as one
    flat-axis einsum, then the bilinear (2r+1)^2 window via the
    one-hot matmuls. Returns (B, S, N, L*(2r+1)^2).
    """
    B, S, N, C = track_feats.shape
    out = []
    for i, (lvl, (H, W)) in enumerate(zip(levels, hws)):
        centers = coords / (2.0 ** i)
        cm = jnp.einsum("bscx,bsnc->bsnx", lvl, track_feats,
                        preferred_element_type=jnp.float32)
        cmap = cm.reshape(B, S, N, H, W)
        corr = _bilinear_window_matmul(cmap, centers, radius,
                                       track_feats.dtype)
        out.append(corr / jnp.sqrt(C).astype(corr.dtype))
    return jnp.concatenate(out, axis=-1)


def _bilinear_window_matmul(cmap: jax.Array, centers: jax.Array, r: int,
                            dt) -> jax.Array:
    """Bilinear (2r+1)^2 windows out of scalar correlation maps — as two
    batched one-hot matmuls, ZERO gathers.

        corr[p, q] = sum_{i,j} uy[p, i] * cmap[i, j] * vx[q, j]
        uy[p, i] = (1-fy) * [i == y0+p] + fy * [i == y0+p+1]

    The bilinear weights are folded into the selection matrices, and an
    out-of-range tap matches no one-hot column, so border zeroing falls
    out for free. Replaces per-tap take_along_axis: TPU scalar gathers
    are issue-rate-bound (~17 ms per level-iter at 16k track-frames,
    tools/perf_probe2.py) while these are dense VPU/MXU batched matmuls.

    Args: cmap (B, S, N, H, W) scalar corr maps; centers (B, S, N, 2).
    Returns (B, S, N, (2r+1)^2) in dtype `dt`.
    """
    B, S, N, H, W = cmap.shape
    W1 = 2 * r + 1
    base = jnp.floor(centers)
    frac = (centers - base).astype(dt)
    x0 = base[..., 0].astype(jnp.int32) - r  # (B, S, N)
    y0 = base[..., 1].astype(jnp.int32) - r
    fx = frac[..., 0][..., None, None]  # (B, S, N, 1, 1)
    fy = frac[..., 1][..., None, None]
    taps = jnp.arange(W1, dtype=jnp.int32)
    iy = y0[..., None] + taps  # (B, S, N, W1)
    ix = x0[..., None] + taps
    rows = jnp.arange(H, dtype=jnp.int32)
    cols = jnp.arange(W, dtype=jnp.int32)
    uy = ((rows == iy[..., None]).astype(dt) * (1 - fy)
          + (rows == (iy + 1)[..., None]).astype(dt) * fy)
    vx = ((cols == ix[..., None]).astype(dt) * (1 - fx)
          + (cols == (ix + 1)[..., None]).astype(dt) * fx)
    # uy: (B, S, N, W1, H); vx: (B, S, N, W1, W)
    # HIGHEST precision: free for the default bf16 pipeline (bf16 inputs
    # have nothing to split) and keeps the f32 precision mode honest —
    # default TPU matmul precision would round f32 inputs through bf16.
    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("bsnph,bsnhw->bsnpw", uy, cmap.astype(dt),
                     precision=hi)
    corr = jnp.einsum("bsnpw,bsnqw->bsnpq", tmp, vx, precision=hi)
    return corr.reshape(B, S, N, W1 * W1)


def corr_sample(pyramid: list, coords: jax.Array, track_feats: jax.Array,
                radius: int, use_pallas: bool = False,
                cfirst: bool = False) -> jax.Array:
    """Fused neighborhood-sample + dot correlation.

    Args:
      pyramid: list of (B, S, Hi, Wi, C) feature maps.
      coords: (B, S, N, 2) track positions at level-0 scale.
      track_feats: (B, S, N, C).

    Returns (B, S, N, L*(2r+1)^2) correlation features.
    """
    B, S, N, _ = coords.shape
    C = track_feats.shape[-1]
    r = radius
    W1 = 2 * r + 1
    window = 2 * r + 2

    out = []
    for i, fmap in enumerate(pyramid):
        if cfirst:
            # (B, S, C, H, W) levels from build_corr_pyramid(cfirst=True)
            # — the fine one-track-per-patch case only (N == 1): the
            # C-in-sublanes full-map reduce needs no per-level relayout.
            assert N == 1, "cfirst pyramid supports the fine N==1 case"
            _, _, _, H, W = fmap.shape
            centers = coords / (2.0 ** i)
            T = B * S
            fm_t = fmap.reshape(T, C, H * W)
            tf = track_feats.reshape(T, 1, C).swapaxes(-1, -2)
            cm = jnp.sum((fm_t * tf).astype(jnp.float32), axis=1)
            cmap = cm.reshape(B, S, 1, H, W)
            corr = _bilinear_window_matmul(cmap, centers, r,
                                           track_feats.dtype)
            out.append(corr / jnp.sqrt(C).astype(corr.dtype))
            continue
        _, _, H, W, _ = fmap.shape
        centers = coords / (2.0 ** i)
        # many tracks per map: the FULL correlation as one MXU GEMM per
        # map — (HW, C) @ (C, N) reads the fmap once for all N tracks —
        # then bilinear windows via the one-hot matmuls. On-chip this
        # beats both the XLA tap-gather path (scalar gathers) and the
        # per-window DMA kernel (fetch-issue-bound): the whole corr
        # stage becomes dense MXU work (full coarse call 1.28 s ->
        # 0.31 s, tools/perf_probe2.py). The track axis is chunked so
        # the transient (B, S, Nc, HW) cmap stays under ~1 GB in its
        # actual dtype (bytes, not elements).
        # NOTE: this branch deliberately precedes (overrides) the
        # use_pallas_corr DMA kernels for many-track calls — the full
        # GEMM measured strictly faster on-chip; the flag still selects
        # the kernels for the small-N shapes below.
        if N >= 64:
            itemsize = jnp.dtype(track_feats.dtype).itemsize
            max_chunk = max(64, (1 << 30) // max(1, B * S * H * W * itemsize))
            chunks = []
            for n0 in range(0, N, max_chunk):
                tf_c = track_feats[:, :, n0: n0 + max_chunk]
                ct_c = centers[:, :, n0: n0 + max_chunk]
                cmap = jnp.einsum("bshwc,bsnc->bsnhw", fmap, tf_c)
                chunks.append(_bilinear_window_matmul(
                    cmap, ct_c, r, track_feats.dtype))
            corr = (chunks[0] if len(chunks) == 1
                    else jnp.concatenate(chunks, axis=2))
            out.append(corr / jnp.sqrt(C).astype(corr.dtype))
            continue
        # the DMA-based kernel keeps C as the lane axis (needs 128-aligned
        # feature lanes for HBM tiling)
        if use_pallas and C % 128 == 0:
            from vggsfm_tpu.ops.corr_pallas import corr_sample_pallas

            corr = corr_sample_pallas(
                fmap.reshape(B * S, H, W, C).astype(jnp.float32),
                centers.reshape(B * S, N, 2),
                track_feats.reshape(B * S, N, C).astype(jnp.float32),
                radius=radius)
            out.append(corr.reshape(B, S, N, -1).astype(track_feats.dtype))
            continue
        if N == 1 and H * W <= 4096 and C < 128:
            # fine-former patch maps (one track per patch "video", C=32):
            # compute the FULL correlation map per iteration as a
            # C-in-sublanes broadcast-multiply-reduce (the transposed
            # pyramid layout is iteration-invariant, so XLA CSE hoists it
            # out of the 6-iter unroll), then pull the bilinear (2r+1)^2
            # window with two tiny batched matmuls against one-hot
            # selection matrices that FOLD THE BILINEAR WEIGHTS IN:
            #   corr[a, b] = sum_{i,j} Uy[a, i] * cm[i, j] * Vx[b, j],
            #   Uy[a, i] = (1-fy)*[i == y0+a] + fy*[i == y0+a+1].
            # An out-of-range tap matches no one-hot column, so border
            # zeroing falls out for free. This replaces a 64-scalar-per-
            # track take_along_axis (measured ~17 ms per level-iter at
            # 16k track-frames — scalar-granularity TPU gathers dominate
            # the whole fine former; tools/perf_probe2.py) with dense
            # MXU/VPU work, and supersedes the per-track DMA kernel
            # (ops/corr_pallas.py smallc) whose 12 KB fetches are
            # issue-rate-bound.
            T = B * S
            fm_t = jnp.swapaxes(fmap.reshape(T, H * W, C), -1, -2)
            tf = track_feats.reshape(T, 1, C).swapaxes(-1, -2)  # (T, C, 1)
            cm = jnp.sum((fm_t * tf).astype(jnp.float32), axis=1)
            cmap = cm.reshape(B, S, 1, H, W)
            corr = _bilinear_window_matmul(cmap, centers, r,
                                           track_feats.dtype)
            out.append(corr / jnp.sqrt(C).astype(corr.dtype))
            continue
        # small-C variant (C < 128 with many tracks per map): row-
        # flattened DMA windows (ops/corr_pallas.py smallc)
        if use_pallas and C < 128:
            from vggsfm_tpu.ops.corr_pallas import corr_sample_pallas_smallc

            corr = corr_sample_pallas_smallc(
                fmap.reshape(B * S, H, W, C),
                centers.reshape(B * S, N, 2),
                track_feats.reshape(B * S, N, C).astype(fmap.dtype),
                radius=radius)
            out.append(corr.reshape(B, S, N, -1).astype(track_feats.dtype))
            continue

        # XLA path, same math as the kernel: gather the (2r+2)^2 *integer*
        # window once (one gather corner instead of four), dot with the
        # track feature, then bilinearly combine the scalar correlations.
        base = jnp.floor(centers)
        frac = (centers - base).astype(track_feats.dtype)  # (B,S,N,2)
        offs = jnp.arange(-r, r + 2, dtype=jnp.int32)
        oy, ox = jnp.meshgrid(offs, offs, indexing="ij")  # (w, w)
        ix = base[..., 0].astype(jnp.int32)[..., None, None] + ox
        iy = base[..., 1].astype(jnp.int32)[..., None, None] + oy
        ok = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H))
        flat_idx = (jnp.clip(iy, 0, H - 1) * W
                    + jnp.clip(ix, 0, W - 1))  # (B,S,N,w,w)
        fm = fmap.reshape(B * S, H * W, C)
        idx = flat_idx.reshape(B * S, N * window * window)
        nbhd = jnp.take_along_axis(fm, idx[..., None], axis=1)
        nbhd = nbhd.reshape(B, S, N, window * window, C)
        nbhd = nbhd * ok.reshape(B, S, N, -1, 1).astype(nbhd.dtype)
        ci = jnp.einsum("bsnkc,bsnc->bsnk", nbhd, track_feats)
        ci = ci.reshape(B, S, N, window, window)
        fx = frac[..., 0, None, None]
        fy = frac[..., 1, None, None]
        corr = ((1 - fy) * (1 - fx) * ci[..., :W1, :W1]
                + (1 - fy) * fx * ci[..., :W1, 1:]
                + fy * (1 - fx) * ci[..., 1:, :W1]
                + fy * fx * ci[..., 1:, 1:])
        corr = corr.reshape(B, S, N, W1 * W1)
        out.append(corr / jnp.sqrt(C).astype(corr.dtype))
    return jnp.concatenate(out, axis=-1)


def global_match_coords(fmaps: jax.Array, query_feats: jax.Array,
                        qp: jax.Array, cycle: bool = False):
    """Correlation-argmax track initialization (weights-free matching).

    For each frame, find the fmap cell whose feature best correlates with
    the query feature (one big MXU matmul per frame), then refine to
    sub-cell precision with a separable parabola fit on the 3x3 corr
    neighborhood (scale-invariant, unlike a softmax soft-argmax).

    This is additional machinery relative to the reference (which always
    starts tracks at the query position, base_track_predictor.py:104, and
    relies on trained weights to walk them over): with matching init the
    tracker degrades gracefully to a real correlation tracker when weights
    are random, and converted weights start their iterative refinement from
    a wide-baseline-robust initialization.

    Args:
      fmaps: (B, S, H, W, C) level-0 feature maps.
      query_feats: (B, N, C) features sampled at the query points (frame 0).
      qp: (B, N, 2) query positions at fmap scale (frame 0 stays pinned).

    Returns (coords (B, S, N, 2) at fmap scale,
             conf (B, S, N) peak cosine similarity in [-1, 1],
             cyc_dist (B, S, N) forward-backward match distance in fmap
             cells, or None when `cycle` is False). Cycle distance is the
             robust match-validity signal: a correct match re-matches to
             within ~1 cell of the query point, a spurious one lands
             anywhere.
    """
    B, S, H, W, C = fmaps.shape
    N = query_feats.shape[1]

    # cosine similarity, not raw dot product: an unnormalized argmax is
    # attracted to high-norm cells regardless of appearance (the iterative
    # refinement's corr features keep the reference's dot-product form —
    # only the init matches with NCC semantics)
    def l2n(x):
        return x * jax.lax.rsqrt(
            jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                    keepdims=True) + 1e-12).astype(x.dtype)

    qf = l2n(query_feats.astype(fmaps.dtype))
    fmaps = l2n(fmaps)

    def match(fm, feats):
        """Argmax + parabola sub-cell fit of feats against one frame.

        fm (B, H, W, C), feats (B, N, C) -> (xy (B, N, 2), peak (B, N)).
        f32 accumulation: bf16 corr values tie-break randomly between
        near-identical cells (8 mantissa bits); the MXU accumulates
        bf16 x bf16 -> f32 natively so this costs nothing.
        """
        corr = jnp.einsum("bhwc,bnc->bnhw", fm, feats,
                          preferred_element_type=jnp.float32)
        flat = corr.reshape(B, N, H * W)
        idx = jnp.argmax(flat, axis=-1)  # (B, N)
        iy = idx // W
        ix = idx % W

        def val(dy, dx):
            yy = jnp.clip(iy + dy, 0, H - 1)
            xx = jnp.clip(ix + dx, 0, W - 1)
            return jnp.take_along_axis(flat, (yy * W + xx)[..., None],
                                       axis=-1)[..., 0]

        off_x, off_y, c0 = subpixel_parabola(val)
        xy = jnp.stack([ix + off_x, iy + off_y],
                       axis=-1).astype(jnp.float32)
        return xy, c0

    fm0 = fmaps[:, 0]

    def one_frame(fm):
        xy, c0 = match(fm, qf)
        if not cycle:
            return xy, c0, jnp.zeros_like(c0)
        # forward-backward check: re-match the matched feature into the
        # query frame and measure how far it lands from the query point
        feats_m = l2n(bilinear_sample(fm, xy).astype(fmaps.dtype))
        back_xy, _ = match(fm0, feats_m)
        d = jnp.linalg.norm(back_xy - qp.astype(jnp.float32), axis=-1)
        return xy, c0, d

    # frames matched in memory-bounded batches: the (chunk, B, N, H*W)
    # f32 correlation transient is the constraint (~268 MB per frame at
    # the matched workload) — a fully serial per-frame lax.map left the
    # MXU idle between 8 small dispatch-bound steps, while one vmapped
    # chunk is a single large GEMM. ~2 GB transient budget.
    per_frame = N * H * W * 4
    fchunk = max(1, min(S, (1 << 31) // max(per_frame, 1)))
    fmaps_sf = fmaps.transpose(1, 0, 2, 3, 4)  # (S, B, H, W, C)
    pad_s = (-S) % fchunk
    if pad_s:
        fmaps_sf = jnp.concatenate(
            [fmaps_sf, jnp.repeat(fmaps_sf[-1:], pad_s, axis=0)], axis=0)
    fmaps_c = fmaps_sf.reshape((S + pad_s) // fchunk, fchunk,
                               *fmaps_sf.shape[1:])
    coords, conf, cyc = jax.lax.map(jax.vmap(one_frame), fmaps_c)
    coords = coords.reshape(S + pad_s, B, N, 2)[:S]
    conf = conf.reshape(S + pad_s, B, N)[:S]
    cyc = cyc.reshape(S + pad_s, B, N)[:S]
    coords = coords.transpose(1, 0, 2, 3)  # (B, S, N, 2)
    conf = conf.transpose(1, 0, 2)  # (B, S, N)
    coords = coords.at[:, 0].set(qp.astype(jnp.float32))
    if not cycle:
        return coords, conf, None
    return coords, conf, cyc.transpose(1, 0, 2).at[:, 0].set(0.0)


class EfficientUpdateFormer(nn.Module):
    """Factored time/space transformer with virtual-track tokens.

    Parity: blocks.py:192-335.
    """

    space_depth: int = 6
    time_depth: int = 6
    hidden_size: int = 384
    num_heads: int = 8
    output_dim: int = 130
    mlp_ratio: float = 4.0
    add_space_attn: bool = True
    num_virtual_tracks: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, N, T, input_dim) -> (B, N, T, output_dim)."""
        B, N, T, _ = x.shape
        V = self.num_virtual_tracks
        x = x.astype(self.dtype)
        tokens = nn.Dense(self.hidden_size, name="input_transform",
                          dtype=self.dtype)(x)
        init_tokens = tokens

        if self.add_space_attn:
            virtual = self.param(
                "virtual_tracks", nn.initializers.normal(1.0),
                (1, V, 1, self.hidden_size))
            virtual = jnp.broadcast_to(virtual, (B, V, T,
                                                 self.hidden_size))
            virtual = virtual.astype(self.dtype)
            tokens = jnp.concatenate([tokens, virtual], axis=1)
        Ntot = tokens.shape[1]

        j = 0
        stride = (self.time_depth // self.space_depth
                  if self.add_space_attn and self.space_depth else 1)
        for i in range(self.time_depth):
            tt = tokens.reshape(B * Ntot, T, self.hidden_size)
            tt = AttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                           name=f"time_blocks_{i}", dtype=self.dtype)(tt)
            tokens = tt.reshape(B, Ntot, T, self.hidden_size)
            if self.add_space_attn and i % stride == 0:
                st = tokens.transpose(0, 2, 1, 3).reshape(
                    B * T, Ntot, self.hidden_size)
                point_t = st[:, : Ntot - V]
                virt_t = st[:, Ntot - V:]
                virt_t = CrossAttnBlock(
                    self.hidden_size, self.num_heads, self.mlp_ratio,
                    name=f"space_virtual2point_blocks_{j}",
                    dtype=self.dtype)(virt_t, point_t)
                virt_t = AttnBlock(
                    self.hidden_size, self.num_heads, self.mlp_ratio,
                    name=f"space_virtual_blocks_{j}",
                    dtype=self.dtype)(virt_t)
                point_t = CrossAttnBlock(
                    self.hidden_size, self.num_heads, self.mlp_ratio,
                    name=f"space_point2virtual_blocks_{j}",
                    dtype=self.dtype)(point_t, virt_t)
                st = jnp.concatenate([point_t, virt_t], axis=1)
                tokens = st.reshape(B, T, Ntot, self.hidden_size).transpose(
                    0, 2, 1, 3)
                j += 1

        if self.add_space_attn:
            tokens = tokens[:, : Ntot - V]
        tokens = tokens + init_tokens
        # zero-init so a freshly-initialized tracker predicts exactly zero
        # deltas (preserving the matching init); converted checkpoints
        # overwrite this
        return nn.Dense(self.output_dim, name="flow_head",
                        kernel_init=nn.initializers.zeros,
                        dtype=self.dtype)(tokens)


class BaseTrackerPredictor(nn.Module):
    """Iterative track refinement head. Parity: base_track_predictor.py.

    The refinement iterations run under ``nn.scan`` (params broadcast, body
    compiled ONCE): the fully unrolled 6-iteration graph multiplied XLA
    compile time ~6x for zero steady-state benefit — iterations are data-
    dependent (coords feed the next step), so the unroll bought no
    cross-iteration parallelism. Param names are unchanged (setup-style
    submodules match the previous compact names).
    """

    stride: int = 4
    corr_levels: int = 5
    corr_radius: int = 4
    latent_dim: int = 128
    hidden_size: int = 384
    use_spaceatt: bool = True
    depth: int = 6
    fine: bool = False
    dtype: Any = jnp.float32
    use_pallas_corr: bool = False
    scan_iters: bool = True

    @property
    def transformer_dim(self) -> int:
        d = self.corr_levels * (self.corr_radius * 2 + 1) ** 2 \
            + self.latent_dim * 2
        if self.fine:
            return d + (4 if d % 2 == 0 else 5)
        return d + (4 - d % 4) % 4

    def setup(self):
        self.updateformer = EfficientUpdateFormer(
            space_depth=self.depth if self.use_spaceatt else 0,
            time_depth=self.depth,
            hidden_size=self.hidden_size,
            output_dim=self.latent_dim + 2,
            add_space_attn=self.use_spaceatt,
            dtype=self.dtype)
        self.norm_scale = self.param("norm_scale", nn.initializers.ones,
                                     (self.latent_dim,))
        self.norm_bias = self.param("norm_bias", nn.initializers.zeros,
                                    (self.latent_dim,))
        self.ffeat_updater = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.vis_predictor = nn.Dense(1, dtype=self.dtype)

    def _iter_step(self, carry, x, corr_cfirst: bool,
                   flat_hws: list | None = None):
        """One refinement iteration (the nn.scan body).

        carry = (coords (B,S,N,2) at fmap scale, track_feats (B,S,N,C));
        x = (pyramid tuple, sampled_pos, qp) — loop-invariant arrays,
        threaded through the broadcast input slot; `corr_cfirst` /
        `flat_hws` are static and bound via closure.
        """
        coords, track_feats = carry
        pyramid, sampled_pos, qp = x
        B, S, N, _ = coords.shape
        tdim = self.transformer_dim

        coords = jax.lax.stop_gradient(coords)
        if flat_hws is not None:
            fcorrs = corr_sample_flat(list(pyramid), flat_hws, coords,
                                      track_feats, self.corr_radius)
        else:
            fcorrs = corr_sample(list(pyramid), coords, track_feats,
                                 self.corr_radius,
                                 use_pallas=self.use_pallas_corr,
                                 cfirst=corr_cfirst)

        flows = coords - coords[:, 0:1]  # (B,S,N,2)
        flows_bn = flows.transpose(0, 2, 1, 3)  # (B,N,S,2)
        flows_emb = get_2d_embedding(flows_bn, self.latent_dim // 2,
                                     cat_coords=False)
        flows_emb = jnp.concatenate([flows_emb, flows_bn], axis=-1)

        fcorrs_bn = fcorrs.transpose(0, 2, 1, 3)  # (B,N,S,corrdim)
        tfeats_bn = track_feats.transpose(0, 2, 1, 3)  # (B,N,S,C)

        xx = jnp.concatenate([flows_emb, fcorrs_bn, tfeats_bn], axis=-1)
        pad = tdim - xx.shape[-1]
        if pad > 0:
            xx = jnp.concatenate(
                [xx, jnp.zeros(xx.shape[:-1] + (pad,), xx.dtype)], axis=-1)
        xx = xx + sampled_pos[:, :, None, :]

        delta = self.updateformer(xx)  # (B, N, S, latent+2)
        delta_coords = delta[..., :2].astype(jnp.float32).transpose(
            0, 2, 1, 3)
        delta_feats = delta[..., 2:]

        df = delta_feats.reshape(-1, self.latent_dim)
        df = group_norm_1(df, self.norm_scale, self.norm_bias)
        df = nn.gelu(self.ffeat_updater(df), approximate=False).astype(
            self.dtype)
        track_feats = (tfeats_bn.reshape(-1, self.latent_dim)
                       + df).reshape(B, N, S, self.latent_dim).transpose(
                           0, 2, 1, 3)

        coords = coords + delta_coords
        coords = coords.at[:, 0].set(jnp.broadcast_to(qp, (B, N, 2)))
        return (coords, track_feats), coords

    def __call__(self, query_points, fmaps, iters: int = 4,
                 down_ratio: int = 1, return_feat: bool = False,
                 matching_init: bool = False, matching_vis: bool = False,
                 fmaps_flat_hw: tuple | None = None):
        """query_points (B, N, 2) pixels; fmaps (B, S, HH, WW, C) — or,
        with ``fmaps_flat_hw=(HH, WW)``, flat channel-first
        (B, S, C, HH*WW) (the fine path's copy-free layout).

        Returns (coord_predictions list, visibility (B, S, N) or None
        [, track_feats, query_feats]).
        """
        B, N, _ = query_points.shape
        flat_hws = None
        if fmaps_flat_hw is not None:
            _, S, C, _ = fmaps.shape
            HH, WW = fmaps_flat_hw
        else:
            _, S, HH, WW, C = fmaps.shape
        assert C == self.latent_dim

        fmaps = fmaps.astype(self.dtype)
        scale = float(self.stride) * float(down_ratio)
        qp = query_points.astype(jnp.float32) / scale
        coords = jnp.broadcast_to(qp[:, None], (B, S, N, 2))

        if fmaps_flat_hw is not None:
            query_feats = _sample_flat(fmaps[:, 0], qp, (HH, WW))
        else:
            query_feats = sample_features4d(fmaps[:, 0], qp)
        track_feats = jnp.broadcast_to(query_feats[:, None], (B, S, N, C))

        match_cyc = None
        if matching_init:
            if fmaps_flat_hw is not None:
                assert not matching_vis, \
                    "cycle matching not supported on the flat fine path"
                coords = _global_match_flat(fmaps, query_feats, qp,
                                            (HH, WW))
            else:
                coords, _, match_cyc = global_match_coords(
                    fmaps, query_feats, qp, cycle=matching_vis)

        corr_cfirst = (fmaps_flat_hw is None and self.fine and N == 1
                       and HH * WW <= 4096 and C < 128)
        if fmaps_flat_hw is not None:
            pyramid, flat_hws = build_corr_pyramid_flat(
                fmaps, (HH, WW), self.corr_levels)
        else:
            pyramid = build_corr_pyramid(fmaps, self.corr_levels,
                                         cfirst=corr_cfirst)

        tdim = self.transformer_dim

        # the sincos grid is identical for every batch element: sample it
        # ONCE with the flattened (1, B*N, 2) query set — broadcasting to
        # (B, HH, WW, tdim) first would materialize gigabytes at the fine
        # former's B = tracks-per-chunk batch
        pos_grid = get_2d_sincos_pos_embed(tdim, (HH, WW))  # (1, HH, WW, D)
        sampled_pos = bilinear_sample(
            pos_grid, qp.reshape(1, B * N, 2)).reshape(B, N, tdim)

        invariants = (tuple(pyramid), sampled_pos, qp)
        if self.scan_iters and iters > 1:
            def body(mdl, carry, x):
                return mdl._iter_step(carry, x, corr_cfirst, flat_hws)

            scanned = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=nn.broadcast, out_axes=0, length=iters)
            (coords, track_feats), preds = scanned(
                self, (coords, track_feats), invariants)
            coord_preds = [preds[i] * scale for i in range(iters)]
        else:
            coord_preds = []
            for _ in range(iters):
                (coords, track_feats), pred = self._iter_step(
                    (coords, track_feats), invariants, corr_cfirst,
                    flat_hws)
                coord_preds.append(pred * scale)

        if not self.fine:
            if matching_vis and match_cyc is not None:
                # weights-free visibility: forward-backward consistency of
                # the global match (an untrained vis head outputs noise
                # that gates out most tracks). ~1: re-matches the query
                # cell; ->0 beyond ~3 cells of cycle drift.
                vis = jax.nn.sigmoid(2.0 * (1.5 - match_cyc))
            else:
                vis = self.vis_predictor(
                    track_feats.reshape(-1, self.latent_dim))
                vis = jax.nn.sigmoid(
                    vis.astype(jnp.float32).reshape(B, S, N))
        else:
            vis = None

        if return_feat:
            return coord_preds, vis, track_feats, query_feats
        return coord_preds, vis


class TrackerPredictor(nn.Module):
    """Coarse + fine two-stage tracker. Parity: track_predictor.py:21-155.

    Submodules mirror the reference config (cfgs/demo.yaml:73-91): coarse
    BasicEncoder(stride 4, down_ratio 2) + 6-layer space/time former; fine
    ShallowEncoder(stride 1) + 4-layer time-only former on 31x31 patches.
    """

    coarse_stride: int = 4
    coarse_down_ratio: int = 2
    dtype: Any = jnp.float32
    use_pallas_corr: bool = False

    def setup(self):
        self.coarse_fnet = BasicEncoder(output_dim=128,
                                        stride=self.coarse_stride,
                                        dtype=self.dtype)
        self.coarse_predictor = BaseTrackerPredictor(
            stride=self.coarse_stride, dtype=self.dtype,
            use_pallas_corr=self.use_pallas_corr)
        self.fine_fnet = ShallowEncoder(output_dim=32, stride=1,
                                        dtype=self.dtype)
        self.fine_predictor = BaseTrackerPredictor(
            stride=1, depth=4, corr_levels=3, corr_radius=3, latent_dim=32,
            hidden_size=256, fine=True, use_spaceatt=False,
            dtype=self.dtype, use_pallas_corr=self.use_pallas_corr)

    def init_all(self, images, query_points):
        """Touch every submodule so `.init(..., method='init_all')` creates
        the full parameter tree (linen materializes params lazily)."""
        track, vis = self(images, query_points, coarse_iters=1)
        B, S = images.shape[:2]
        psize = 31
        patches = jnp.zeros((B * S, psize, psize, 3), images.dtype)
        pf = self.fine_fnet(patches)
        pf = pf.reshape(B, S, psize, psize, -1)
        pq = jnp.full((B, 1, 2), psize / 2.0, images.dtype)
        self.fine_predictor(pq, pf, iters=1)
        return track, vis

    def apply_fine_fnet(self, patches, flat_cfirst: bool = False):
        return self.fine_fnet(patches, flat_cfirst=flat_cfirst)

    def apply_fine_predictor(self, query_points, fmaps, iters, return_feat,
                             matching_init=False, fmaps_flat_hw=None):
        return self.fine_predictor(query_points, fmaps, iters=iters,
                                   return_feat=return_feat,
                                   matching_init=matching_init,
                                   fmaps_flat_hw=fmaps_flat_hw)

    def process_images_to_fmaps(self, images):
        """(B, S, H, W, 3) in [0,1] -> (B, S, H', W', 128) coarse features."""
        B, S, H, W, _ = images.shape
        x = images.reshape(B * S, H, W, 3)
        if self.coarse_down_ratio > 1:
            x = interpolate_bilinear(
                x, (H // self.coarse_down_ratio,
                    W // self.coarse_down_ratio))
        fmaps = self.coarse_fnet(x)
        return fmaps.reshape((B, S) + fmaps.shape[1:])

    def __call__(self, images, query_points, fmaps=None, coarse_iters=6,
                 matching_init=False, matching_vis=False):
        """Coarse-only forward (fine refinement runs via refine_track).

        Returns (coarse_pred_track (B,S,N,2), pred_vis (B,S,N)).
        """
        if fmaps is None:
            fmaps = self.process_images_to_fmaps(images)
        coord_preds, vis = self.coarse_predictor(
            query_points, fmaps, iters=coarse_iters,
            down_ratio=self.coarse_down_ratio, matching_init=matching_init,
            matching_vis=matching_vis)
        return coord_preds[-1], vis
