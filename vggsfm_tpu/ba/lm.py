"""Batched Levenberg-Marquardt bundle adjustment with a Schur complement.

The normal equations of bundle adjustment have the classic arrow shape:
camera blocks U (C x C per frame), point blocks V (3 x 3 per track) and
coupling blocks W. We eliminate the points (Schur complement), solve the
small dense reduced camera system on-device, and back-substitute — the
standard sparse-BA factorization (Ceres' SPARSE_SCHUR) re-expressed as a
handful of einsums so XLA maps it onto the MXU.

Behavioral parity with the reference's Ceres setup
(vggsfm/utils/triangulation_helpers.py:626-635 + pycolmap defaults):
trivial loss by default (huber/cauchy available), refine focal length and
distortion, never the principal point, <= `max_iterations` LM steps.

Design notes (TPU-first):
  * static shapes: observations are a dense (S, N, 2) track tensor with a
    validity mask — padded lanes simply carry zero Jacobians;
  * freezing (gauge fix, shared-camera tying, constant poses/points for the
    incremental video pipeline) is *linear algebra*, not control flow:
    frozen parameters get zeroed Jacobian columns, tied parameters act
    through a static tying matrix T (solve Tᵀ S T z = Tᵀ b);
  * the LM loop is a `lax.scan` with accept/reject on the carried state —
    one compiled program, no host round-trips;
  * point-side assembly streams over chunks (`lax.map`) so the W coupling
    tensor never materializes for more points than one chunk.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.geometry.distortion import apply_distortion
from vggsfm_tpu.geometry.rotations import axis_angle_to_matrix
from vggsfm_tpu.utils.precision import f32_matmuls

_EPS = 1e-12
# squared-pixel cost charged for a behind-camera observation (and the cap on
# any single observation's squared error): ~(100 px)^2
_BEHIND_PENALTY_SQ = 1e4


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Static BA options (hashable: used as a jit static argument)."""

    max_iterations: int = 30
    refine_focal: bool = True
    refine_extra: bool = True
    shared_intrinsics: bool = False
    robust_loss: str = "trivial"  # trivial | huber | cauchy
    loss_scale: float = 1.0
    lambda_init: float = 1e-3
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    lambda_min: float = 1e-9
    lambda_max: float = 1e6
    # per-LM-iteration point-chunking bound: each fori_loop chunk pays
    # its own serialized kernel suite, so prefer ONE chunk whenever the
    # (S, PC, 2, C) Jacobian transients fit (tens of MB at 32k points)
    point_chunk: int = 32768
    diag_eps: float = 1e-8
    # stop when an accepted step's relative cost decrease falls below
    # this (Ceres function_tolerance, default 1e-6), or when a rejected
    # step has already driven lambda to lambda_max (no progress
    # possible). The LM loop is a while_loop: converged solves stop
    # paying for the remaining iteration budget (measured 34 ms per
    # 24k-track iteration on v5e — a 25-cap solve that converges in 8
    # iterations was spending 3x its useful time).
    function_tolerance: float = 1e-6
    # points statically frozen: skip the entire point-Schur machinery
    # (point Jacobians, V/W coupling blocks, back-substitution) — the
    # normal equations decouple into independent per-camera blocks.
    # Used by refine_poses, where every point is constant and the full
    # Schur path was pure overhead (~40% of each LM iteration).
    pose_only: bool = False


# ---------------------------------------------------------------------------
# residual model
# ---------------------------------------------------------------------------


def _apply_camera_delta(R0, t0, f0, pp, k0, delta):
    """delta = [omega(3), dt(3), dlogf(1), dk(K)] -> updated camera."""
    omega, dt = delta[:3], delta[3:6]
    R = axis_angle_to_matrix(omega) @ R0
    t = t0 + dt
    f = f0 * jnp.exp(delta[6])
    k = k0 + delta[7:] if k0.shape[0] else k0
    return R, t, f, pp, k


def _project_one(R, t, f, pp, k, X):
    """World point -> pixel. Parity: triangulation_helpers.py:311-395."""
    Xc = R @ X + t
    z = Xc[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
    u = Xc[0] / z_safe
    v = Xc[1] / z_safe
    if k.shape[0]:
        du, dv = apply_distortion(k, u[None], v[None])
        u, v = du[0], dv[0]
    return f * jnp.stack([u, v]) + pp, z


def _residual_one(delta_c, delta_p, R0, t0, f0, pp, k0, X0, obs):
    R, t, f, pp_, k = _apply_camera_delta(R0, t0, f0, pp, k0, delta_c)
    proj, _ = _project_one(R, t, f, pp_, k, X0 + delta_p)
    return proj - obs


def _robust_sqrt_weight(sq_norm, cfg: BAConfig):
    s = cfg.loss_scale
    if cfg.robust_loss == "trivial":
        return jnp.ones_like(sq_norm)
    if cfg.robust_loss == "huber":
        return jnp.where(sq_norm <= s * s, 1.0,
                         jnp.sqrt(s / jnp.sqrt(jnp.maximum(sq_norm, _EPS))))
    if cfg.robust_loss == "cauchy":
        return 1.0 / jnp.sqrt(1.0 + sq_norm / (s * s))
    raise ValueError(f"unknown robust loss {cfg.robust_loss}")


def _inv3x3(M):
    """Closed-form batched 3x3 inverse via adjugate."""
    a = M[..., 0, :]
    b = M[..., 1, :]
    c = M[..., 2, :]
    r0 = jnp.cross(b, c)
    r1 = jnp.cross(c, a)
    r2 = jnp.cross(a, b)
    det = jnp.sum(a * r0, axis=-1, keepdims=True)[..., None]
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    adj = jnp.stack([r0, r1, r2], axis=-1)  # transpose of cofactor rows
    return adj / det


def _num_extra(extra_params):
    return 0 if extra_params is None else extra_params.shape[-1]


def _delta_dim(K):
    return 7 + K  # omega(3) + t(3) + logf(1) + extra(K)


def _tying_matrix(S: int, K: int, shared: bool) -> np.ndarray:
    """T: stacked per-camera deltas (S*C) <- reduced free params.

    Per-camera pose blocks always independent; the intrinsic slots
    (logf + extra) map either per-camera or to one shared block.
    """
    C = _delta_dim(K)
    ni = 1 + K
    if not shared:
        return np.eye(S * C, dtype=np.float32)
    P = S * 6 + ni
    T = np.zeros((S * C, P), dtype=np.float32)
    for s in range(S):
        for i in range(6):
            T[s * C + i, s * 6 + i] = 1.0
        for i in range(ni):
            T[s * C + 6 + i, S * 6 + i] = 1.0
    return T


# ---------------------------------------------------------------------------
# cost
# ---------------------------------------------------------------------------


def reprojection_cost(extrinsics, focal, pp, extra, points3d, tracks, mask,
                      cfg: BAConfig = BAConfig()):
    """Total (robust) squared reprojection error. tracks (S,N,2), mask (S,N)."""
    R = extrinsics[..., :3]
    t = extrinsics[..., 3]
    k = extra if extra is not None else jnp.zeros(focal.shape[:1] + (0,),
                                                 focal.dtype)

    def per_cam(R_s, t_s, f_s, pp_s, k_s, obs_s, m_s):
        def per_pt(X, o):
            proj, z = _project_one(R_s, t_s, f_s, pp_s, k_s, X)
            r = proj - o
            sq = jnp.minimum(jnp.sum(r * r), _BEHIND_PENALTY_SQ)
            # behind-camera observations must COST, not vanish: a zero
            # contribution lets LM drive the total to 0 by flipping the
            # camera until every point is behind it (accepted as a
            # perfect fit). Constant penalty: no gradient through it,
            # but the accept/reject test sees the flip as worse.
            return jnp.where(z > 0, sq, _BEHIND_PENALTY_SQ)
        sq = jax.vmap(per_pt)(points3d, obs_s)
        w = _robust_sqrt_weight(sq, cfg) ** 2
        return jnp.sum(jnp.where(m_s > 0, sq * w, 0.0))

    costs = jax.vmap(per_cam)(R, t, focal, pp, k, tracks, mask)
    return jnp.sum(costs)


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------


def bundle_adjust(*args, **kwargs):
    """FLOP-ledger wrapper over the jitted solver (utils/mfu.py): every
    eager call records its shapes so the bench can report BA MFU."""
    from vggsfm_tpu.utils import mfu

    return mfu.timed_call("ba_dense", _bundle_adjust, args, kwargs)


@partial(jax.jit, static_argnames=("cfg",))
@f32_matmuls
def _bundle_adjust(
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    points3d: jax.Array,
    tracks: jax.Array,
    mask: jax.Array,
    extra_params: jax.Array | None = None,
    pose_free: jax.Array | None = None,
    intr_free: jax.Array | None = None,
    point_free: jax.Array | None = None,
    cfg: BAConfig = BAConfig(),
):
    """Joint refinement of cameras and points by damped Gauss-Newton.

    Args:
      extrinsics: (S, 3, 4) world->cam [R|t], OpenCV.
      intrinsics: (S, 3, 3) K matrices (fx == fy assumed, COLMAP SIMPLE_*).
      points3d:   (N, 3) world points.
      tracks:     (S, N, 2) observed pixels.
      mask:       (S, N) observation validity.
      extra_params: optional (S, K) radial distortion (K in {1, 2, 4}).
      pose_free:  (S,) bool — False freezes that camera's pose (gauge fix;
        default: frame 0 frozen, rest free).
      intr_free:  (S,) bool — False freezes that camera's intrinsics.
      point_free: (N,) bool — False freezes that point (video-runner
        constant points).
      cfg: static solver options.

    Returns (extrinsics, intrinsics, extra_params, points3d, info) with
    ``info = {"cost": per-iteration cost, "initial_cost", "final_cost"}``.
    """
    S, N = mask.shape
    K = _num_extra(extra_params)
    C = _delta_dim(K)
    dtype = jnp.float32

    tracks = tracks.astype(dtype)
    m = mask.astype(dtype)
    R0 = extrinsics[..., :3].astype(dtype)
    t0 = extrinsics[..., 3].astype(dtype)
    f0 = intrinsics[:, 0, 0].astype(dtype)
    pp0 = intrinsics[:, :2, 2].astype(dtype)
    k0 = (extra_params.astype(dtype) if extra_params is not None
          else jnp.zeros((S, 0), dtype))
    X0 = points3d.astype(dtype)

    if cfg.shared_intrinsics:
        # tying acts on the *delta* (one shared logf/extra step), so the
        # values must be unified up front or per-frame differences from
        # earlier stages persist forever
        f0 = jnp.broadcast_to(jnp.exp(jnp.mean(jnp.log(
            jnp.maximum(f0, 1e-6)))), f0.shape)
        pp0 = jnp.broadcast_to(jnp.mean(pp0, axis=0, keepdims=True),
                               pp0.shape)
        if K:
            k0 = jnp.broadcast_to(jnp.mean(k0, axis=0, keepdims=True),
                                  k0.shape)

    if pose_free is None:
        pose_free = jnp.arange(S) != 0
    if intr_free is None:
        intr_free = jnp.ones((S,), bool)
    if point_free is None:
        point_free = jnp.ones((N,), bool)

    # per-slot camera delta mask (S, C)
    slot_mask = jnp.concatenate([
        jnp.repeat(pose_free[:, None].astype(dtype), 6, axis=1),
        jnp.repeat(intr_free[:, None].astype(dtype), 1 + K, axis=1),
    ], axis=1)
    if not cfg.refine_focal:
        slot_mask = slot_mask.at[:, 6].set(0.0)
    if not cfg.refine_extra and K:
        slot_mask = slot_mask.at[:, 7:].set(0.0)
    pmask = point_free.astype(dtype)

    T = jnp.asarray(_tying_matrix(S, K, cfg.shared_intrinsics))
    P = T.shape[1]

    jac_fn = jax.jacfwd(_residual_one,
                        argnums=(0,) if cfg.pose_only else (0, 1))

    # pad points to a chunk multiple
    PC = min(cfg.point_chunk, N)
    n_pad = (-N) % PC
    Np = N + n_pad

    def pad_pts(x, value=0.0):
        return jnp.pad(x, [(0, n_pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=value)

    def pad_obs(x):
        return jnp.pad(x, [(0, 0), (0, n_pad)] + [(0, 0)] * (x.ndim - 2))

    tracks_p = pad_obs(tracks)
    m_p = pad_obs(m)
    pmask_p = pad_pts(pmask)
    n_chunks = Np // PC

    def linearize_chunk(params, X_chunk, obs_chunk, m_chunk, pm_chunk, lam):
        """One point chunk: accumulate camera-side terms, return point terms."""
        R_, t_, f_, k_ = params["R"], params["t"], params["f"], params["k"]
        zc = jnp.zeros((C,), dtype)
        zp = jnp.zeros((3,), dtype)

        def per_cam(R_s, t_s, f_s, pp_s, k_s, obs_s, m_s, sm_s):
            def per_pt(X, o, mm, pm):
                r = _residual_one(zc, zp, R_s, t_s, f_s, pp_s, k_s, X, o)
                _, z = _project_one(R_s, t_s, f_s, pp_s, k_s, X)
                valid = mm * (z > 0)
                sw = _robust_sqrt_weight(jnp.sum(r * r), cfg) * valid
                if cfg.pose_only:
                    (Jc,) = jac_fn(zc, zp, R_s, t_s, f_s, pp_s, k_s, X, o)
                    return sw * r, sw * Jc * sm_s[None, :]
                Jc, Jp = jac_fn(zc, zp, R_s, t_s, f_s, pp_s, k_s, X, o)
                return sw * r, sw * Jc * sm_s[None, :], sw * Jp * pm
            return jax.vmap(per_pt)(X_chunk, obs_s, m_s, pm_chunk)

        out = jax.vmap(per_cam)(
            R_, t_, f_, params["pp"], k_, obs_chunk, m_chunk, slot_mask)
        if cfg.pose_only:
            # points statically frozen: the normal equations decouple per
            # camera — no V/W/Y Schur blocks, no back-substitution
            r, Jc = out
            cost = jnp.sum(r * r)
            U = jnp.einsum("snic,snid->scd", Jc, Jc)
            b_c = -jnp.einsum("snic,sni->sc", Jc, r)
            return cost, U, b_c
        r, Jc, Jp = out
        # r (S,PC,2), Jc (S,PC,2,C), Jp (S,PC,2,3)
        cost = jnp.sum(r * r)
        U = jnp.einsum("snic,snid->scd", Jc, Jc)
        b_c = -jnp.einsum("snic,sni->sc", Jc, r)
        V = jnp.einsum("snia,snib->nab", Jp, Jp)
        b_p = -jnp.einsum("snia,sni->na", Jp, r)
        W = jnp.einsum("snic,snia->snca", Jc, Jp)

        V_d = V + lam * V * jnp.eye(3, dtype=dtype) + \
            cfg.diag_eps * jnp.eye(3, dtype=dtype)
        Vinv = _inv3x3(V_d)
        Y = jnp.einsum("snca,nab->sncb", W, Vinv)
        S_cross = jnp.einsum("snca,tnda->sctd", Y, W)
        b_corr = jnp.einsum("snca,na->sc", Y, b_p)
        return cost, U, b_c, S_cross, b_corr, Vinv, b_p, W

    def assemble(params, lam):
        X_p = pad_pts(params["X"])

        def slices(i):
            return (
                jax.lax.dynamic_slice_in_dim(X_p, i * PC, PC),
                jax.lax.dynamic_slice_in_dim(tracks_p, i * PC, PC, axis=1),
                jax.lax.dynamic_slice_in_dim(m_p, i * PC, PC, axis=1),
                jax.lax.dynamic_slice_in_dim(pmask_p, i * PC, PC),
            )

        if cfg.pose_only:
            def body_po(i, acc):
                cost, U, b_c = linearize_chunk(params, *slices(i), lam)
                cost_a, U_a, b_c_a = acc
                return (cost_a + cost, U_a + U, b_c_a + b_c)

            init_po = (jnp.zeros((), dtype),
                       jnp.zeros((S, C, C), dtype),
                       jnp.zeros((S, C), dtype))
            return jax.lax.fori_loop(0, n_chunks, body_po, init_po)

        def body(i, acc):
            (cost, U, b_c, S_cross, b_corr, Vinv, b_p,
             W) = linearize_chunk(params, *slices(i), lam)
            (cost_a, U_a, b_c_a, S_a, bcor_a, Vinv_a, b_p_a, W_a) = acc
            Vinv_a = jax.lax.dynamic_update_slice_in_dim(
                Vinv_a, Vinv, i * PC, axis=0)
            b_p_a = jax.lax.dynamic_update_slice_in_dim(
                b_p_a, b_p, i * PC, axis=0)
            W_a = jax.lax.dynamic_update_slice_in_dim(
                W_a, W, i * PC, axis=1)
            return (cost_a + cost, U_a + U, b_c_a + b_c, S_a + S_cross,
                    bcor_a + b_corr, Vinv_a, b_p_a, W_a)

        init = (jnp.zeros((), dtype),
                jnp.zeros((S, C, C), dtype),
                jnp.zeros((S, C), dtype),
                jnp.zeros((S, C, S, C), dtype),
                jnp.zeros((S, C), dtype),
                jnp.zeros((Np, 3, 3), dtype),
                jnp.zeros((Np, 3), dtype),
                jnp.zeros((S, Np, C, 3), dtype))
        return jax.lax.fori_loop(0, n_chunks, body, init)

    def solve_cameras(U, b_c, S_cross, b_corr, lam):
        eyeC = jnp.eye(C, dtype=dtype)
        U_d = U + lam * U * eyeC
        S_red = jnp.einsum("scd,st->sctd", U_d,
                           jnp.eye(S, dtype=dtype)) - S_cross
        A = S_red.reshape(S * C, S * C)
        # frozen slots: unit diagonal keeps the system SPD, delta stays 0
        frozen = 1.0 - slot_mask.reshape(-1)
        A = A + jnp.diag(frozen) + cfg.diag_eps * jnp.eye(S * C, dtype=dtype)
        rhs = (b_c - b_corr).reshape(S * C)
        At = T.T @ A @ T
        rt = T.T @ rhs
        z = jnp.linalg.solve(At, rt)
        return (T @ z).reshape(S, C) * slot_mask

    def back_substitute(dc, Vinv, b_p, W_full):
        # the W coupling blocks were already built during assemble — the
        # back-substitution is pure linear algebra on them (the previous
        # re-linearization pass cost ~1/3 of every LM iteration)
        rhs_p = b_p - jnp.einsum("snca,sc->na", W_full, dc)
        return jnp.einsum("nab,nb->na", Vinv, rhs_p)

    def apply_deltas(params, dc, dX):
        omega = dc[:, :3]
        dR = jax.vmap(axis_angle_to_matrix)(omega)
        return {
            "R": jnp.einsum("sij,sjk->sik", dR, params["R"]),
            "t": params["t"] + dc[:, 3:6],
            "f": params["f"] * jnp.exp(dc[:, 6]),
            "pp": params["pp"],
            "k": params["k"] + dc[:, 7:] if K else params["k"],
            "X": params["X"] + dX[:N] * pmask[:, None] if n_pad
                 else params["X"] + dX * pmask[:, None],
        }

    def total_cost(params):
        extri = jnp.concatenate([params["R"], params["t"][..., None]],
                                axis=-1)
        return reprojection_cost(extri, params["f"], params["pp"],
                                 params["k"] if K else None, params["X"],
                                 tracks, m, cfg)

    params0 = {"R": R0, "t": t0, "f": f0, "pp": pp0, "k": k0, "X": X0}
    cost0 = total_cost(params0)

    def lm_step(carry):
        params, lam, cost, hist, it, _ = carry
        if cfg.pose_only:
            _, U, b_c = assemble(params, lam)
            zSC = jnp.zeros((S, C, S, C), dtype)
            dc = solve_cameras(U, b_c, zSC, jnp.zeros((S, C), dtype), lam)
            dX = jnp.zeros((Np, 3), dtype)
        else:
            (_, U, b_c, S_cross, b_corr, Vinv, b_p,
             W_full) = assemble(params, lam)
            dc = solve_cameras(U, b_c, S_cross, b_corr, lam)
            dX = back_substitute(dc, Vinv, b_p, W_full)
        cand = apply_deltas(params, dc, dX)
        new_cost = total_cost(cand)
        accept = new_cost < cost
        params = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, params)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * cfg.lambda_down,
                                 lam * cfg.lambda_up),
                       cfg.lambda_min, cfg.lambda_max)
        rel_dec = (carry[2] - new_cost) / jnp.maximum(carry[2], _EPS)
        converged = ((accept & (rel_dec < cfg.function_tolerance))
                     | (~accept & (lam >= cfg.lambda_max)))
        return (params, lam, cost, hist.at[it].set(cost), it + 1,
                converged)

    def lm_cond(carry):
        it, converged = carry[4], carry[5]
        return (it < cfg.max_iterations) & ~converged

    hist0 = jnp.full((cfg.max_iterations,), cost0, dtype)
    # NOTE: while_loop makes the solver non-reverse-mode-differentiable —
    # intentional for this inference framework (the early exit is worth
    # 3x on converged solves); a training path through BA would need a
    # bounded lax.scan variant instead.
    params, _, final_cost, cost_hist, n_iters, _ = jax.lax.while_loop(
        lm_cond, lm_step,
        (params0, jnp.asarray(cfg.lambda_init, dtype), cost0, hist0,
         jnp.zeros((), jnp.int32), jnp.zeros((), bool)))
    # untouched tail entries report the final cost (monotone history)
    cost_hist = jnp.where(jnp.arange(cfg.max_iterations) < n_iters,
                          cost_hist, final_cost)

    extri = jnp.concatenate([params["R"], params["t"][..., None]], axis=-1)
    f = params["f"]
    intr = jnp.zeros((S, 3, 3), dtype)
    intr = intr.at[:, 0, 0].set(f).at[:, 1, 1].set(f)
    intr = intr.at[:, :2, 2].set(params["pp"]).at[:, 2, 2].set(1.0)
    extra = params["k"] if K else None
    info = {"cost": cost_hist, "initial_cost": cost0,
            "final_cost": final_cost}
    return extri, intr, extra, params["X"], info
