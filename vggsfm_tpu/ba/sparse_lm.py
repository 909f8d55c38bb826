"""Observation-major sparse bundle adjustment: implicit Schur + PCG.

The dense solver (vggsfm_tpu.ba.lm) materializes the reduced camera system
(S*C x S*C) — perfect for <= a few hundred frames. The sequential video
pipeline's joint BA spans 1000+ frames x 100k+ points
(reference: runners/video_runner.py:494-541, solved there by CPU Ceres
with sparse Schur), where the dense reduced system would be tens of GB.

This solver never forms it: observations are flat (frame_idx, point_idx,
xy) triplets, normal-equation blocks are `segment_sum`s, and the reduced
camera system is solved by preconditioned conjugate gradients whose matvec
applies U x - W V^-1 Wᵀ x through two gather/segment passes — the classic
implicit-Schur CG, mapped to TPU gathers + MXU batched small matmuls.
Padding observations (weight 0) is free; the point axis shards over a mesh
with `psum` on the segment sums (multi-chip distributed BA).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from vggsfm_tpu.ba.lm import (
    _BEHIND_PENALTY_SQ,
    BAConfig,
    _apply_camera_delta,
    _delta_dim,
    _inv3x3,
    _project_one,
    _residual_one,
    _robust_sqrt_weight,
)
from vggsfm_tpu.geometry.rotations import axis_angle_to_matrix
from vggsfm_tpu.ops.eigh import eigh_small
from vggsfm_tpu.utils.precision import f32_matmuls


@dataclasses.dataclass(frozen=True)
class SparseBAConfig(BAConfig):
    cg_iters: int = 40


def _spd_inverse_small(M: jax.Array, eps: float) -> jax.Array:
    """Batched SPD inverse of (..., n, n), n <= 8, via the Jacobi eigh."""
    w, V = eigh_small(M, num_sweeps=6, sort=False)
    w_inv = 1.0 / jnp.maximum(w, eps)
    return jnp.einsum("...ij,...j,...kj->...ik", V, w_inv, V)


def bundle_adjust_sparse(*args, **kwargs):
    """FLOP-ledger wrapper over the jitted solver (utils/mfu.py): eager
    calls record their shapes so the bench can report joint-BA MFU.
    Trace-time calls (inside shard_map / an outer jit) skip the ledger."""
    from vggsfm_tpu.utils import mfu

    return mfu.timed_call("ba_sparse", _bundle_adjust_sparse, args,
                          kwargs)


@partial(jax.jit, static_argnames=("cfg", "num_frames", "num_points",
                                   "axis_name"))
@f32_matmuls
def _bundle_adjust_sparse(
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    points3d: jax.Array,
    obs_frame: jax.Array,
    obs_point: jax.Array,
    obs_xy: jax.Array,
    obs_weight: jax.Array,
    extra_params: jax.Array | None = None,
    pose_free: jax.Array | None = None,
    intr_free: jax.Array | None = None,
    point_free: jax.Array | None = None,
    cfg: SparseBAConfig = SparseBAConfig(),
    num_frames: int | None = None,
    num_points: int | None = None,
    axis_name: str | None = None,
):
    """LM bundle adjustment over flat observation lists.

    Args:
      extrinsics (S,3,4), intrinsics (S,3,3), points3d (P,3).
      obs_frame / obs_point: (O,) int32 indices; obs_xy (O, 2) pixels;
      obs_weight: (O,) — 0 disables an observation (padding).
      pose_free/intr_free (S,), point_free (P,): False freezes.
      axis_name: when called inside `shard_map` with the observation
        lists partitioned over a mesh axis, pass that axis' name — every
        observation reduction (frame/point segment sums, total cost) is
        then `psum`'d across shards, making this the distributed BA:
        cameras and points replicate, observations shard (the dominant
        memory axis), and the CG loop stays bitwise-replicated because
        all its inputs are global sums.

    Returns (extrinsics, intrinsics, extra_params, points3d, info).
    """
    S = num_frames or extrinsics.shape[0]
    P = num_points or points3d.shape[0]
    K = 0 if extra_params is None else extra_params.shape[-1]
    C = _delta_dim(K)
    dtype = jnp.float32

    R0 = extrinsics[..., :3].astype(dtype)
    t0 = extrinsics[..., 3].astype(dtype)
    f0 = intrinsics[:, 0, 0].astype(dtype)
    pp0 = intrinsics[:, :2, 2].astype(dtype)
    k0 = (extra_params.astype(dtype) if extra_params is not None
          else jnp.zeros((S, 0), dtype))
    X0 = points3d.astype(dtype)
    obs_xy = obs_xy.astype(dtype)
    w_obs = obs_weight.astype(dtype)

    if cfg.shared_intrinsics:
        # the tying projector acts on the *delta* (one shared logf/extra
        # step), so the values must be unified up front or per-frame
        # differences from earlier stages persist forever (same fix as
        # the dense solver, lm.py). Only frames with a plausible focal
        # vote: the video runner passes not-yet-registered frames whose
        # K rows are still zero, which would poison a plain mean-log.
        ok = (f0 > 1e-3).astype(dtype)
        n_ok = jnp.maximum(jnp.sum(ok), 1.0)
        logf = jnp.sum(jnp.where(ok > 0,
                                 jnp.log(jnp.maximum(f0, 1e-6)), 0.0)) / n_ok
        f0 = jnp.broadcast_to(jnp.exp(logf), f0.shape)
        pp_mean = jnp.sum(pp0 * ok[:, None], axis=0,
                          keepdims=True) / n_ok
        pp0 = jnp.broadcast_to(pp_mean, pp0.shape)
        if K:
            k_mean = jnp.sum(k0 * ok[:, None], axis=0,
                             keepdims=True) / n_ok
            k0 = jnp.broadcast_to(k_mean, k0.shape)

    if pose_free is None:
        pose_free = jnp.arange(S) != 0
    if intr_free is None:
        intr_free = jnp.ones((S,), bool)
    if point_free is None:
        point_free = jnp.ones((P,), bool)

    slot_mask = jnp.concatenate([
        jnp.repeat(pose_free[:, None].astype(dtype), 6, axis=1),
        jnp.repeat(intr_free[:, None].astype(dtype), 1 + K, axis=1),
    ], axis=1)
    if not cfg.refine_focal:
        slot_mask = slot_mask.at[:, 6].set(0.0)
    if not cfg.refine_extra and K:
        slot_mask = slot_mask.at[:, 7:].set(0.0)
    pmask = point_free.astype(dtype)

    def tie(x):
        """Orthogonal projection onto the shared-intrinsics subspace.

        With `cfg.shared_intrinsics` the logf/extra delta slots are one
        variable across frames (the dense solver's tying matrix,
        lm.py:131-147, expressed here as a projector so the implicit-Schur
        CG never changes shape): running CG with A -> tie(A(tie(x))) and
        rhs -> tie(rhs) solves the constrained normal equations exactly on
        the tied subspace.
        """
        if not cfg.shared_intrinsics:
            return x
        m = jnp.mean(x[:, 6:], axis=0, keepdims=True)
        return jnp.concatenate(
            [x[:, :6], jnp.broadcast_to(m, (S, C - 6))], axis=1)

    zc = jnp.zeros((C,), dtype)
    zp = jnp.zeros((3,), dtype)
    jac_fn = jax.jacfwd(_residual_one, argnums=(0, 1))

    def per_obs_linearize(params):
        R_, t_, f_, pp_, k_ = (params["R"], params["t"], params["f"],
                               params["pp"], params["k"])

        def one(s, j, xy, w):
            args = (R_[s], t_[s], f_[s], pp_[s], k_[s], params["X"][j], xy)
            r = _residual_one(zc, zp, *args)
            Jc, Jp = jac_fn(zc, zp, *args)
            _, z = _project_one(R_[s], t_[s], f_[s], pp_[s], k_[s],
                                params["X"][j])
            valid = w * (z > 0)
            sw = _robust_sqrt_weight(jnp.sum(r * r), cfg) * valid
            return (sw * r, sw * Jc * slot_mask[s][None, :],
                    sw * Jp * pmask[j])

        return jax.vmap(one)(obs_frame, obs_point, obs_xy, w_obs)

    def seg_f(x):  # segment over frames (global across obs shards)
        s = jax.ops.segment_sum(x, obs_frame, num_segments=S)
        return jax.lax.psum(s, axis_name) if axis_name else s

    def seg_p(x):  # segment over points (global across obs shards)
        s = jax.ops.segment_sum(x, obs_point, num_segments=P)
        return jax.lax.psum(s, axis_name) if axis_name else s

    def lm_step(carry):
        params, lam, cost, hist, it, _ = carry
        r, Jc, Jp = per_obs_linearize(params)
        # normal-equation blocks
        U = seg_f(jnp.einsum("oic,oid->ocd", Jc, Jc))  # (S,C,C)
        b_c = -seg_f(jnp.einsum("oic,oi->oc", Jc, r))
        V = seg_p(jnp.einsum("oia,oib->oab", Jp, Jp))  # (P,3,3)
        b_p = -seg_p(jnp.einsum("oia,oi->oa", Jp, r))
        W = jnp.einsum("oic,oia->oca", Jc, Jp)  # (O,C,3)

        eyeC = jnp.eye(C, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        frozen = 1.0 - slot_mask
        U_d = U + lam * U * eyeC + cfg.diag_eps * eyeC \
            + jnp.einsum("sc,cd->scd", frozen, eyeC)
        V_d = V + lam * V * eye3 + cfg.diag_eps * eye3
        Vinv = _inv3x3(V_d)

        def schur_matvec(x):  # x (S,C)
            x = tie(x)
            t1 = jnp.einsum("scd,sd->sc", U_d, x)
            y = jnp.einsum("oca,oc->oa", W, x[obs_frame])  # (O,3)
            z = seg_p(y)  # (P,3)
            z = jnp.einsum("pab,pb->pa", Vinv, z)
            u = jnp.einsum("oca,oa->oc", W, z[obs_point])  # (O,C)
            return tie(t1 - seg_f(u))

        rhs = tie(b_c - seg_f(
            jnp.einsum("oca,oa->oc", W,
                       jnp.einsum("pab,pb->pa", Vinv, b_p)[obs_point])))

        # block-Jacobi preconditioner from the damped camera blocks
        M_inv = _spd_inverse_small(U_d, cfg.diag_eps)

        def precond(v):
            return tie(jnp.einsum("scd,sd->sc", M_inv, tie(v)))

        def cg_body(state, _):
            x, rr, p, rz = state
            Ap = schur_matvec(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return (x, rr, p, rz_new), None

        x0 = jnp.zeros((S, C), dtype)
        z0 = precond(rhs)
        (dc, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, rhs, z0, jnp.sum(rhs * z0)), None,
            length=cfg.cg_iters)
        dc = dc * slot_mask

        # back-substitute point updates
        wdc = seg_p(jnp.einsum("oca,oc->oa", W, dc[obs_frame]))
        dX = jnp.einsum("pab,pb->pa", Vinv, b_p - wdc) * pmask[:, None]

        # apply
        dR = jax.vmap(axis_angle_to_matrix)(dc[:, :3])
        cand = {
            "R": jnp.einsum("sij,sjk->sik", dR, params["R"]),
            "t": params["t"] + dc[:, 3:6],
            "f": params["f"] * jnp.exp(dc[:, 6]),
            "pp": params["pp"],
            "k": params["k"] + dc[:, 7:] if K else params["k"],
            "X": params["X"] + dX,
        }
        new_cost = total_cost(cand)
        accept = new_cost < cost
        params = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand,
                              params)
        rel_dec = (cost - new_cost) / jnp.maximum(cost, 1e-12)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * cfg.lambda_down,
                                 lam * cfg.lambda_up),
                       cfg.lambda_min, cfg.lambda_max)
        converged = ((accept & (rel_dec < cfg.function_tolerance))
                     | (~accept & (lam >= cfg.lambda_max)))
        return (params, lam, cost, hist.at[it].set(cost), it + 1,
                converged)

    def total_cost(params):
        def one(s, j, xy, w):
            proj, z = _project_one(params["R"][s], params["t"][s],
                                   params["f"][s], params["pp"][s],
                                   params["k"][s], params["X"][j])
            r = proj - xy
            # behind-camera observations must COST, not vanish — else an
            # LM step that flips a camera zeroes its residuals and is
            # accepted as an improvement (same fix as lm.py)
            sq = jnp.where(z > 0,
                           jnp.minimum(jnp.sum(r * r), _BEHIND_PENALTY_SQ),
                           _BEHIND_PENALTY_SQ)
            return sq * (_robust_sqrt_weight(sq, cfg) ** 2) * w
        c = jnp.sum(jax.vmap(one)(obs_frame, obs_point, obs_xy, w_obs))
        return jax.lax.psum(c, axis_name) if axis_name else c

    params0 = {"R": R0, "t": t0, "f": f0, "pp": pp0, "k": k0, "X": X0}
    cost0 = total_cost(params0)

    def lm_cond(carry):
        it, converged = carry[4], carry[5]
        return (it < cfg.max_iterations) & ~converged

    hist0 = jnp.full((cfg.max_iterations,), cost0, dtype)
    params, _, final_cost, cost_hist, n_iters, _ = jax.lax.while_loop(
        lm_cond, lm_step,
        (params0, jnp.asarray(cfg.lambda_init, dtype), cost0, hist0,
         jnp.zeros((), jnp.int32), jnp.zeros((), bool)))
    cost_hist = jnp.where(jnp.arange(cfg.max_iterations) < n_iters,
                          cost_hist, final_cost)

    extri = jnp.concatenate([params["R"], params["t"][..., None]], axis=-1)
    intr = jnp.zeros((S, 3, 3), dtype)
    intr = intr.at[:, 0, 0].set(params["f"]).at[:, 1, 1].set(params["f"])
    intr = intr.at[:, :2, 2].set(params["pp"]).at[:, 2, 2].set(1.0)
    extra = params["k"] if K else None
    info = {"cost": cost_hist, "initial_cost": cost0,
            "final_cost": final_cost}
    return extri, intr, extra, params["X"], info
