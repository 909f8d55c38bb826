"""Multi-host scale-out: process init + observation-sharded distributed BA.

Two pieces of the SURVEY §2.3 multi-host story:

* `init_multihost()` — `jax.distributed.initialize` over DCN from standard
  env vars (coordinator address / process count / process id). After it,
  `jax.devices()` spans every host and the same `Mesh`-based code paths
  (GSPMD jit, shard_map) run unchanged across hosts; collectives ride ICI
  within a host and DCN across.
* `distributed_bundle_adjust` — the joint BA sharded over a mesh axis with
  `shard_map`: cameras + points replicate, the observation lists (the
  dominant memory axis: 100k+ observations for 1000+-frame videos)
  partition, and every reduction inside the solver `psum`s across shards
  (see bundle_adjust_sparse(axis_name=...)). The reference runs this step
  on single-host CPU Ceres (runners/video_runner.py:494-541) — here it
  scales over chips and hosts.

Windows of the sequential video pipeline partition over hosts with
`windows_for_host`; each host tracks its own window range (embarrassingly
parallel) and the map merge + joint BA are the only cross-host steps.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vggsfm_tpu.ba.sparse_lm import SparseBAConfig, bundle_adjust_sparse

_MAPPED_CACHE: dict = {}


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or environment.

    Env fallbacks: VGGSFM_COORDINATOR (host:port), VGGSFM_NUM_PROCESSES,
    VGGSFM_PROCESS_ID (also the standard JAX_* names). Returns True when
    a multi-process runtime was initialized, False for single-process.
    """
    coord = coordinator_address or os.environ.get(
        "VGGSFM_COORDINATOR", os.environ.get("JAX_COORDINATOR_ADDRESS"))
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("VGGSFM_NUM_PROCESSES",
                       os.environ.get("JAX_NUM_PROCESSES", "1")))
    pid = process_id if process_id is not None else int(
        os.environ.get("VGGSFM_PROCESS_ID",
                       os.environ.get("JAX_PROCESS_ID", "0")))
    if coord is None or nproc <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    return True


def windows_for_host(num_frames: int, init_window: int, window: int,
                     num_hosts: int, host_id: int) -> list[tuple[int, int]]:
    """Contiguous window ranges [(start, end), ...] owned by `host_id`.

    Frames after the initial window split into `window`-sized chunks that
    round-robin over hosts — each host tracks ~1/num_hosts of the video.
    """
    starts = list(range(init_window, num_frames, window))
    return [(s, min(s + window, num_frames))
            for i, s in enumerate(starts) if i % num_hosts == host_id]


def distributed_bundle_adjust(
    mesh,
    extrinsics,
    intrinsics,
    points3d,
    obs_frame,
    obs_point,
    obs_xy,
    obs_weight,
    extra_params=None,
    pose_free=None,
    cfg: SparseBAConfig = SparseBAConfig(),
    axis: str = "points",
):
    """Joint sparse BA with the observation lists sharded over `axis`.

    Pads the observation lists to a multiple of the axis size (weight-0
    padding is inert, tested), shard_maps the solver, and returns the
    replicated (extrinsics, intrinsics, extra | None, points3d, cost).
    """
    n = mesh.shape[axis]
    O = len(obs_frame)
    pad = (-O) % n
    if pad:
        zpad = np.zeros(pad, np.int32)
        obs_frame = jnp.concatenate([jnp.asarray(obs_frame),
                                     jnp.asarray(zpad)])
        obs_point = jnp.concatenate([jnp.asarray(obs_point),
                                     jnp.asarray(zpad)])
        obs_xy = jnp.concatenate([jnp.asarray(obs_xy),
                                  jnp.zeros((pad, 2), jnp.float32)])
        obs_weight = jnp.concatenate([jnp.asarray(obs_weight),
                                      jnp.zeros(pad, jnp.float32)])

    S = extrinsics.shape[0]
    P_ = points3d.shape[0]
    if pose_free is None:
        pose_free = jnp.arange(S) != 0
    has_extra = extra_params is not None
    extra_in = (jnp.asarray(extra_params) if has_extra
                else jnp.zeros((S, 0), jnp.float32))

    fn = partial(bundle_adjust_sparse, cfg=cfg, num_frames=S,
                 num_points=P_, axis_name=axis)

    def body(extr, intr, X, of, op, oxy, ow, pf, ext):
        out = fn(extr, intr, X, of, op, oxy, ow,
                 extra_params=(ext if has_extra else None), pose_free=pf)
        extr_o, intr_o, extra_o, X_o, info = out
        if extra_o is None:
            extra_o = jnp.zeros((S, 0), jnp.float32)
        return extr_o, intr_o, extra_o, X_o, info["final_cost"]

    # the shard_map MUST go through jit: called eagerly it re-traces and
    # dispatches per call (measured 2.7x slower at N=1 than the plain
    # jitted solver). Cache per (mesh, shapes, cfg) signature.
    key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names,
           S, P_, len(obs_frame), cfg, axis, has_extra)
    mapped = _MAPPED_CACHE.get(key)
    if mapped is None:
        mapped = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis),
                      P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False))
        _MAPPED_CACHE[key] = mapped
    extr_o, intr_o, extra_o, X_o, cost = mapped(
        jnp.asarray(extrinsics), jnp.asarray(intrinsics),
        jnp.asarray(points3d), jnp.asarray(obs_frame),
        jnp.asarray(obs_point), jnp.asarray(obs_xy),
        jnp.asarray(obs_weight), jnp.asarray(pose_free), extra_in)
    return extr_o, intr_o, (extra_o if has_extra else None), X_o, cost
