"""Fine track refinement on 31x31 patches + confidence scoring.

Parity: vggsfm/models/track_modules/refine_track.py:24-294. The reference
extracts patches with `unfold` (materializing every sliding window, then
indexing); on TPU we gather exactly the N needed windows per frame with a
vectorized integer gather — same floored-corner + fractional-offset scheme,
without the (H*W*psize^2) unfold blow-up. Patch extraction clamps x and y
independently (the reference assumes H == W, refine_track.py:110-113).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggsfm_tpu.models.sampling import subpixel_parabola


def extract_patches(images: jax.Array, centers: jax.Array, pradius: int):
    """Gather psize x psize patches at integer-floored window corners.

    Args:
      images: (B, S, H, W, C).
      centers: (B, S, N, 2) xy patch centers (float pixels).
      pradius: patch radius; psize = 2*pradius + 1.

    Returns (patches (B, S, N, psize, psize, C), topleft (B, S, N, 2) the
    *unclamped* integer corners used to map patch coords back to image
    coords).
    """
    B, S, H, W, C = images.shape
    N = centers.shape[2]
    psize = 2 * pradius + 1

    track_int = jnp.floor(centers).astype(jnp.int32)
    topleft_raw = track_int - pradius
    tl_x = jnp.clip(topleft_raw[..., 0], 0, W - psize)
    tl_y = jnp.clip(topleft_raw[..., 1], 0, H - psize)

    if H % 8 == 0 and (W * C) % 128 == 0:
        # chunk the track axis: the selection-matmul transients scale
        # with N * psize * C * 256, and the remote TPU compiler falls
        # over past ~2048 windows per pass
        NC = 2048
        if N <= NC:
            patches = _extract_patches_tiled(images, tl_x, tl_y, psize)
        else:
            patches = jnp.concatenate(
                [_extract_patches_tiled(
                    images, tl_x[:, :, i: i + NC], tl_y[:, :, i: i + NC],
                    psize) for i in range(0, N, NC)], axis=2)
    else:
        # fallback: vmap'd dynamic_slice (unrolls to one kernel per
        # window on TPU — fine for small N / odd shapes)
        imgs = images.reshape(B * S, H, W, C)
        tl = jnp.stack([tl_y, tl_x], axis=-1).reshape(B * S, N, 2)

        def one(img, yx):
            return jax.lax.dynamic_slice(img, (yx[0], yx[1], 0),
                                         (psize, psize, C))

        patches = jax.vmap(jax.vmap(one, in_axes=(None, 0)))(imgs, tl)
        patches = patches.reshape(B, S, N, psize, psize, C)
    topleft = jnp.stack([tl_x, tl_y], axis=-1)
    return patches, topleft


def _extract_patches_tiled(images, tl_x, tl_y, psize: int):
    """Window extraction as tile gather + one-hot selection matmuls.

    The direct formulations are both slow on TPU: vmap'd dynamic_slice
    unrolls into one kernel launch per window (16384 launches ~ 130 ms
    per fine call), and gathers with unaligned multi-element slices
    lower to scalar granularity. Instead: view the frame as (8, 128)
    tiles, fetch each window's covering tile block with ONE batched
    row-gather (slice = a full 1024-element tile, the shape TPU gathers
    handle efficiently), then cut the exact (psize, psize*C) window out
    of the covering block with two one-hot matmuls. The one-hot matmul
    is EXACT (each output element sums exactly one input) as long as the
    matmul does not truncate its inputs — the selection einsums run at
    Precision.HIGHEST so f32 patches survive bit-identical to slicing
    (default TPU matmul precision would round f32 inputs through bf16).
    """
    B, S, H, W, C = images.shape
    N = tl_x.shape[2]
    TS, TL = 8, 128
    WC = W * C
    ntx = WC // TL
    rowlen = psize * C
    nrt = (psize + TS - 1) // TS + 1  # covering tile rows
    nct = (rowlen + TL - 1) // TL + 1  # covering tile cols
    dt = images.dtype

    tiles = images.reshape(B * S, H // TS, TS, ntx, TL)
    tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(
        B * S, (H // TS) * ntx, TS * TL)

    e0 = tl_x * C  # (B, S, N) start element within the merged row
    ty0 = tl_y // TS
    tx0 = e0 // TL
    row_t = jnp.minimum(ty0[..., None] + jnp.arange(nrt), H // TS - 1)
    col_t = jnp.minimum(tx0[..., None] + jnp.arange(nct), ntx - 1)
    # (clipped duplicate tiles are never selected by the one-hots: the
    # window spans at most nrt/nct tiles from its aligned origin)
    idx = (row_t[..., :, None] * ntx
           + col_t[..., None, :]).reshape(B * S, N * nrt * nct)
    g = jnp.take_along_axis(tiles, idx[..., None], axis=1)
    g = g.reshape(B * S, N, nrt, nct, TS, TL).transpose(0, 1, 2, 4, 3, 5)
    g = g.reshape(B * S, N, nrt * TS, nct * TL)

    dy = (tl_y - ty0 * TS).reshape(B * S, N)  # in [0, TS)
    dx = (e0 - tx0 * TL).reshape(B * S, N)  # in [0, TL)
    rsel = (jnp.arange(nrt * TS)
            == (dy[..., None, None]
                + jnp.arange(psize)[:, None])).astype(dt)
    csel = (jnp.arange(nct * TL)
            == (dx[..., None, None]
                + jnp.arange(rowlen)[:, None])).astype(dt)
    # rsel: (BS, N, psize, nrt*TS); csel: (BS, N, rowlen, nct*TL)
    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("tnpr,tnrl->tnpl", rsel, g, precision=hi)
    win = jnp.einsum("tnpl,tnql->tnpq", tmp, csel, precision=hi)
    return win.reshape(B, S, N, psize, psize, C)


def ncc_subpixel_refine(images: jax.Array, coords: jax.Array,
                        search: int = 3, win: int = 3) -> jax.Array:
    """Classical NCC template-matching polish on raw pixels.

    For every track and frame, slide the query frame's (2*win+1)^2
    grayscale window over a +/-search integer grid centered on the current
    estimate, take the NCC argmax, and parabola-fit to sub-pixel. This is
    the weights-free accuracy stage (the reference relies on its trained
    fine tracker for sub-pixel precision; with random weights feature
    matching bottoms out at ~1-2 px, while raw-pixel NCC is exact wherever
    appearance is locally preserved).

    Args:
      images: (B, S, H, W, 3) in [0, 1].
      coords: (B, S, N, 2) track estimates (frame 0 = query, stays pinned).

    Returns refined coords (B, S, N, 2).
    """
    B, S, H, W, _ = images.shape
    N = coords.shape[2]
    gray = (0.299 * images[..., 0] + 0.587 * images[..., 1]
            + 0.114 * images[..., 2])  # (B, S, H, W)
    wsz = 2 * win + 1
    gsz = wsz + 2 * search  # gathered region per frame

    # template: bilinear window at the (fractional) query position
    qxy = coords[:, 0]  # (B, N, 2)
    dy, dx = jnp.meshgrid(jnp.arange(-win, win + 1),
                          jnp.arange(-win, win + 1), indexing="ij")
    tx = qxy[..., 0, None, None] + dx  # (B, N, w, w)
    ty = qxy[..., 1, None, None] + dy
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = (tx - x0)[..., None]
    fy = (ty - y0)[..., None]

    def gather0(ix, iy):
        ixc = jnp.clip(ix.astype(jnp.int32), 0, W - 1)
        iyc = jnp.clip(iy.astype(jnp.int32), 0, H - 1)
        flat = gray[:, 0].reshape(B, H * W)
        return jnp.take_along_axis(
            flat, (iyc * W + ixc).reshape(B, -1), axis=1
        ).reshape(B, N, wsz, wsz)[..., None]

    tmpl = ((1 - fy) * ((1 - fx) * gather0(x0, y0)
                        + fx * gather0(x0 + 1, y0))
            + fy * ((1 - fx) * gather0(x0, y0 + 1)
                    + fx * gather0(x0 + 1, y0 + 1)))[..., 0]
    tmpl = tmpl.reshape(B, N, wsz * wsz)
    tmpl = tmpl - jnp.mean(tmpl, axis=-1, keepdims=True)
    tmpl = tmpl * jax.lax.rsqrt(
        jnp.sum(tmpl * tmpl, axis=-1, keepdims=True) + 1e-8)

    # gathered (wsz+2*search)^2 region at the rounded estimate, per frame.
    # Tile-gather + one-hot selection (same machinery as patch
    # extraction) when the frame shape allows: the per-tap
    # take_along_axis was ~22 ms of scalar gathers per 16k-track call
    # (profiler trace, tools/perf_profile_tracking.py). Border handling
    # shifts the window inside the frame (vs per-tap edge clamping
    # before) — the recovered position accounts for the shift via the
    # returned topleft, and interior tracks are bit-identical.
    base = jnp.round(coords).astype(jnp.int32)  # (B, S, N, 2)
    if H % 8 == 0 and W % 128 == 0:
        tl_x = jnp.clip(base[..., 0] - (win + search), 0, W - gsz)
        tl_y = jnp.clip(base[..., 1] - (win + search), 0, H - gsz)
        region = _extract_patches_tiled(
            gray[..., None], tl_x, tl_y, gsz)[..., 0]
        # re-center: the NCC argmax below assumes the region's center
        # (win+search, win+search) sits at `base`
        base = jnp.stack([tl_x + win + search, tl_y + win + search],
                         axis=-1)
    else:
        gy, gx = jnp.meshgrid(jnp.arange(-win - search, win + search + 1),
                              jnp.arange(-win - search, win + search + 1),
                              indexing="ij")
        rx = jnp.clip(base[..., 0, None, None] + gx, 0, W - 1)
        ry = jnp.clip(base[..., 1, None, None] + gy, 0, H - 1)
        flat = gray.reshape(B * S, H * W)
        idx = (ry * W + rx).reshape(B * S, N * gsz * gsz)
        region = jnp.take_along_axis(flat, idx, axis=1).reshape(
            B, S, N, gsz, gsz)

    # NCC over the (2*search+1)^2 offsets
    osz = 2 * search + 1
    offs = []
    for oy in range(osz):
        for ox in range(osz):
            w = region[..., oy: oy + wsz, ox: ox + wsz].reshape(
                B, S, N, wsz * wsz)
            w = w - jnp.mean(w, axis=-1, keepdims=True)
            denom = jax.lax.rsqrt(jnp.sum(w * w, axis=-1) + 1e-8)
            offs.append(jnp.einsum("bnk,bsnk->bsn", tmpl, w) * denom)
    ncc = jnp.stack(offs, axis=-1)  # (B, S, N, osz*osz)

    best = jnp.argmax(ncc, axis=-1)
    by = best // osz
    bx = best % osz

    def val(dy_, dx_):
        yy = jnp.clip(by + dy_, 0, osz - 1)
        xx = jnp.clip(bx + dx_, 0, osz - 1)
        return jnp.take_along_axis(ncc, (yy * osz + xx)[..., None],
                                   axis=-1)[..., 0]

    sub_x, sub_y, c0 = subpixel_parabola(val)
    out = jnp.stack(
        [base[..., 0] + (bx - search) + sub_x,
         base[..., 1] + (by - search) + sub_y], axis=-1)
    # peak NCC doubles as the weights-free match confidence: a correct
    # match on locally-preserved appearance scores ~1, a mismatch decays
    # toward 0 (query frame pinned to 1)
    conf = jnp.clip(c0, 0.0, 1.0).at[:, 0].set(1.0)
    return out.at[:, 0].set(coords[:, 0]), conf


def refine_track(images, fine_fnet_apply, fine_tracker_apply, coarse_pred,
                 compute_score: bool = True, pradius: int = 15,
                 sradius: int = 2, fine_iters: int = 6,
                 matching_init: bool = False, subpixel_refine: bool = False,
                 patch_dtype=None, flat_fnet: bool = False):
    """Refine coarse tracks on local patches with the fine tracker.

    Args:
      images: (B, S, H, W, 3) in [0, 1].
      fine_fnet_apply: (B', psize, psize, 3) -> (B', psize, psize, C)
        bound ShallowEncoder apply — or, with ``flat_fnet``, a closure
        returning flat channel-first (B', C, psize*psize) (the
        copy-free layout; see ShallowEncoder.flat_cfirst).
      fine_tracker_apply: (query_points, fmaps, iters, return_feat,
        matching_init[, fmaps_flat_hw]) -> (coord_preds, vis,
        track_feats, query_feats) bound fine BaseTrackerPredictor apply.
      coarse_pred: (B, S, N, 2) coarse track positions.

    Returns (refined_tracks (B, S, N, 2), score (B, S, N) or None).
    """
    B, S, N, _ = coarse_pred.shape
    psize = 2 * pradius + 1

    # patch extraction is HBM-random-access bound (~90 ms per 16k windows
    # at f32 on v5e, identical for slice-loop vs window-gather): when the
    # fine fnet computes in bf16 anyway, gathering in bf16 halves the
    # traffic (the NCC polish below reads the original f32 pixels, not
    # these patches). patch_dtype=None keeps the input dtype.
    img_for_patches = (images if patch_dtype is None
                       else images.astype(patch_dtype))
    patches, topleft = extract_patches(img_for_patches, coarse_pred,
                                       pradius)
    # reorder (B, S, N) -> (B, N, S) track-video layout at the PIXEL
    # level: transposing the 3-channel patches moves ~10x fewer bytes
    # than transposing the 32-channel feature tensor after the fnet
    # (the feature transpose was ~1 GB of pure copy per fine call)
    patches = patches.transpose(0, 2, 1, 3, 4, 5)

    # query point inside its patch = fractional offset + pradius
    track_frac = coarse_pred - jnp.floor(coarse_pred)
    patch_query = (track_frac[:, 0] + pradius).reshape(B * N, 1, 2)

    if flat_fnet:
        # flat channel-first feature path: no (.., psize, psize, C)
        # feature tensor ever materializes (its (8, 128)-tiled layouts
        # pad ~4x and cost ~40 ms/call in pure copies — profiler trace,
        # tools/perf_profile_tracking.py)
        pf = fine_fnet_apply(patches.reshape(B * N * S, psize, psize, 3))
        C_out = pf.shape[1]
        patch_feat = pf.reshape(B, N, S, C_out, psize * psize)
        patch_fmaps = pf.reshape(B * N, S, C_out, psize * psize)
        coord_preds, _, _, query_feat = fine_tracker_apply(
            patch_query, patch_fmaps, fine_iters, True, matching_init,
            (psize, psize))
    else:
        patch_feat = fine_fnet_apply(
            patches.reshape(B * N * S, psize, psize, 3))
        C_out = patch_feat.shape[-1]
        # (B*N, S, psize, psize, C): each track is its own "video" — a
        # free reshape in the (B, N, S) order
        patch_feat = patch_feat.reshape(B, N, S, psize, psize, C_out)
        patch_fmaps = patch_feat.reshape(B * N, S, psize, psize, C_out)
        coord_preds, _, _, query_feat = fine_tracker_apply(
            patch_query, patch_fmaps, fine_iters, True, matching_init)

    fine_patch_track = coord_preds[-1]  # (B*N, S, 1, 2) patch coords
    fine_level = fine_patch_track.reshape(B, N, S, 2).transpose(0, 2, 1, 3)
    refined = fine_level + topleft
    refined = refined.at[:, 0].set(coarse_pred[:, 0])
    ncc_conf = None
    if subpixel_refine:
        refined, ncc_conf = ncc_subpixel_refine(images, refined)

    score = None
    if compute_score:
        if ncc_conf is not None:
            # weights-free mode: the NCC peak IS the confidence (same
            # downstream gate, score <= 0.5 invalid) — the dsnt spread of
            # random features carries no signal
            score = ncc_conf
        else:
            score = compute_score_fn(query_feat, patch_feat,
                                     fine_patch_track, sradius, psize,
                                     B, N, S, C_out, flat=flat_fnet)
    return refined, score


def compute_score_fn(query_feat, patch_feat, fine_patch_track, sradius,
                     psize, B, N, S, C_out, flat: bool = False):
    """Confidence = spread (std) of the local similarity heatmap.

    Parity: refine_track.py:190-294 (kornia dsnt soft-argmax inlined).
    Low std ~ a peaked, unambiguous match. With ``flat`` the patch
    features arrive flat channel-first (B, N, S, C, psize*psize).
    """
    ssize = 2 * sradius + 1

    # small ssize x ssize windows of patch features at the refined
    # position — patch_feat arrives in (B, N, S, ...) track-video order
    centers = fine_patch_track.reshape(B, N, S, 2)
    tl = jnp.clip(jnp.floor(centers).astype(jnp.int32) - sradius, 0,
                  psize - ssize)
    dy, dx = jnp.meshgrid(jnp.arange(ssize), jnp.arange(ssize),
                          indexing="ij")
    ys = tl[..., 1, None, None] + dy
    xs = tl[..., 0, None, None] + dx
    idx = (ys * psize + xs).reshape(B, N, S, ssize * ssize)
    qf = query_feat.reshape(B, N, C_out)
    if flat:
        # (B, N, S, C, psize*psize): gather the window on the flat axis
        windows = jnp.take_along_axis(
            patch_feat, idx[..., None, :], axis=4)
        sim = jnp.einsum("bnc,bnscr->bnsr", qf, windows[:, :, 1:])
    else:
        flat_patch = patch_feat.reshape(B, N, S, psize * psize, C_out)
        windows = jnp.take_along_axis(flat_patch, idx[..., None], axis=3)
        # (B, N, S, ssize*ssize, C)
        sim = jnp.einsum("bnc,bnsrc->bnsr", qf, windows[:, :, 1:])
    heat = jax.nn.softmax(sim / jnp.sqrt(C_out), axis=-1)

    # normalized [-1, 1] grid, soft-argmax spread
    lin = jnp.linspace(-1.0, 1.0, ssize)
    gx, gy = jnp.meshgrid(lin, lin, indexing="xy")
    grid = jnp.stack([gx, gy], axis=-1).reshape(ssize * ssize, 2)
    mean = jnp.einsum("bnsr,rd->bnsd", heat, grid)
    second = jnp.einsum("bnsr,rd->bnsd", heat, grid**2)
    var = second - mean**2
    # (B, N, S-1) -> (B, S-1, N): tiny f32, transpose at the end
    std = jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10)), axis=-1)
    std = std.transpose(0, 2, 1)

    return jnp.concatenate([jnp.ones_like(std[:, :1]), std], axis=1)
