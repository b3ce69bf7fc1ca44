"""Multi-chip sharded bundle adjustment.

The 10k-image scale-out path (SURVEY section 7 step 7): the survey's
camera graph is partitioned into bounded groups (ops.clustering), each
group's bundle adjustment is an independent dense problem — *except* the
camera intrinsics, which are shared across every group of the same
physical camera.

Mapping to the TPU mesh:
* groups are data-parallel across devices (leading G axis sharded over a
  1-d 'groups' mesh axis) — the device-parallel analogue of the
  reference's OMP-parallel RelaxGroups (reference relax_stage.cpp:100-111);
* the shared-intrinsics coupling is solved exactly with a distributed
  Schur complement: each device reduces its groups' (H_ss, g_s,
  H_sl H_ll^-1 H_ls, H_sl H_ll^-1 g_l) contributions, one psum over the
  mesh forms the reduced intrinsics system, every device solves the tiny
  replicated system, then back-substitutes its local groups' camera
  updates. One collective per LM iteration, sized |intrinsics|^2 — rides
  ICI, never materializes the global problem anywhere.

This module is self-contained over relax.blocks/lm machinery and is
exercised on a virtual CPU mesh in tests and by __graft_entry__'s
dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opencalibration_tpu.ops.distort import image_from_3d_world
from opencalibration_tpu.ops.quaternion import (
    quat_from_axis_angle,
    quat_multiply,
)
from opencalibration_tpu.relax import blocks as B
from opencalibration_tpu.relax import lm
from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout
from opencalibration_tpu.types.camera import CameraModel


def make_group_layout(C: int, P_pts: int) -> TangentLayout:
    """Per-group tangent: C rotations + P points + 1 shared camera model."""
    return TangentLayout(C, 0, P_pts, 1)


def make_synthetic_groups(
    G: int, C: int = 4, P_pts: int = 16, focal: float = 600.0, seed: int = 0
):
    """G small synthetic BA groups sharing one camera model: per group,
    C nadir cameras over a point grid, pixels from the forward model,
    orientations perturbed. Returns (params [G-batched], pixel block data,
    free_mask, layout)."""
    rng = np.random.default_rng(seed)
    layout = make_group_layout(C, P_pts)
    DOWN = np.array([0.0, 1.0, 0.0, 0.0])

    model = CameraModel.create(
        focal, (400.0, 300.0), pixels_cols=800, pixels_rows=600, dtype=jnp.float32
    )

    quats_all, pos_all, pts_all, pix_all = [], [], [], []
    for g in range(G):
        offs = np.array([g * 100.0, 0.0, 0.0])
        # varied altitudes make the shared focal strongly observable
        positions = np.array(
            [[9, 9, 9], [11, 9, 14], [11, 11, 20], [9, 11, 27]], np.float64
        )[:C] + offs
        quats = []
        for i in range(C):
            yaw = rng.uniform(-0.2, 0.2)
            q = quat_multiply(
                quat_from_axis_angle(jnp.asarray([0.0, 0, 1]), jnp.asarray(yaw)),
                jnp.asarray(DOWN),
            )
            quats.append(np.asarray(q))
        side = int(np.ceil(np.sqrt(P_pts)))
        gx, gy = np.meshgrid(np.arange(side), np.arange(side))
        pts = np.stack(
            [5 + gx.ravel()[:P_pts], 5 + gy.ravel()[:P_pts], ((gx + gy) % 2).ravel()[:P_pts] * 1.0 - 10],
            axis=1,
        ).astype(np.float64) + offs
        pix = np.zeros((C, P_pts, 2), np.float32)
        for i in range(C):
            pix[i] = np.asarray(
                jax.vmap(
                    lambda p: image_from_3d_world(
                        p.astype(jnp.float32), model,
                        jnp.asarray(positions[i], jnp.float32),
                        jnp.asarray(quats[i], jnp.float32),
                    )
                )(jnp.asarray(pts, jnp.float32))
            )
        # perturb initial state
        noisy_quats = [
            np.asarray(
                quat_multiply(
                    jnp.asarray(q),
                    quat_from_axis_angle(
                        jnp.asarray(rng.normal(size=3)), jnp.asarray(0.02)
                    ),
                )
            )
            for q in quats
        ]
        quats_all.append(np.stack(noisy_quats))
        pos_all.append(positions)
        pts_all.append(pts + rng.normal(0, 0.05, pts.shape))
        pix_all.append(pix)

    def mk_params(g):
        return RelaxParams.create(
            jnp.asarray(quats_all[g], jnp.float32),
            jnp.asarray(pos_all[g], jnp.float32),
            points=jnp.asarray(pts_all[g], jnp.float32),
            focal=jnp.asarray([focal * 1.02], jnp.float32),  # shared, 2% off
            principal=jnp.asarray([[400.0, 300.0]], jnp.float32),
        )

    params = jax.tree.map(lambda *xs: jnp.stack(xs), *[mk_params(g) for g in range(G)])

    cam_i = jnp.repeat(jnp.arange(C, dtype=jnp.int32), P_pts)
    point_i = jnp.tile(jnp.arange(P_pts, dtype=jnp.int32), C)
    model_i = jnp.zeros(C * P_pts, jnp.int32)
    pixels = jnp.stack([jnp.asarray(pix_all[g].reshape(C * P_pts, 2)) for g in range(G)])

    free = layout.build_free_mask(points_free=True, focal_free=True)
    block_template = B.pixel_error_block(
        layout, cam_i, point_i, model_i, pixels[0], jnp.ones(C * P_pts, jnp.float32)
    )
    return params, block_template, pixels, free, layout


def _shared_slot_mask(layout: TangentLayout):
    """Tangent entries shared across groups (the intrinsics tail)."""
    m = np.zeros(layout.dim, bool)
    m[layout.focal_off :] = True
    return jnp.asarray(m)


def lm_step_single(params_g, block_template, pixels_g, free, layout, lam):
    """One damped GN step for one group (no sharing) — reference for tests."""
    blk = jax.tree.map(lambda x: x, block_template)
    blk = B.BlockSpec(
        slots=block_template.slots,
        data=dict(block_template.data, pixel=pixels_g),
        weight=block_template.weight,
        resid_one=block_template.resid_one,
        num_residuals=block_template.num_residuals,
        huber_delta=block_template.huber_delta,
        name=block_template.name,
    )
    H, g = lm.normal_equations(params_g, [blk], layout, free)
    dtype = H.dtype
    A = H + lam * jnp.diag(jnp.clip(jnp.diag(H), 1e-8, 1e30)) + jnp.diag(
        (~free).astype(dtype)
    )
    delta = -jnp.linalg.solve(A, g)
    delta = jnp.where(free, delta, 0.0)
    return layout.retract(params_g, delta), delta


def make_sharded_lm_step(mesh: Mesh, block_template, free, layout, lam=1e-7):
    """Build the sharded one-iteration LM step over mesh axis 'groups'.

    Exact distributed Schur complement over the shared intrinsics slots:
      per group:  [H_ll  H_ls] [d_l]   [g_l]
                  [H_sl  H_ss] [d_s] = [g_s]
      S   = psum_g (H_ss - H_sl H_ll^-1 H_ls)
      rhs = psum_g (g_s  - H_sl H_ll^-1 g_l)
      d_s = -S^-1 rhs   (replicated), then per group
      d_l = -H_ll^-1 (g_l + H_ls d_s)
    """
    shared = _shared_slot_mask(layout)
    local_idx = jnp.where(~shared, size=int((~shared).sum()))[0]
    shared_idx = jnp.where(shared, size=int(shared.sum()))[0]
    n_shared = shared_idx.shape[0]

    free_l = free[local_idx]
    free_s = free[shared_idx]

    def group_hg(params_g, pixels_g):
        blk = B.BlockSpec(
            slots=block_template.slots,
            data=dict(block_template.data, pixel=pixels_g),
            weight=block_template.weight,
            resid_one=block_template.resid_one,
            num_residuals=block_template.num_residuals,
            huber_delta=block_template.huber_delta,
            name=block_template.name,
        )
        return lm.normal_equations(params_g, [blk], layout, free)

    def device_step(params_shard, pixels_shard):
        # params_shard leaves: [G_local, ...]; pixels_shard: [G_local, B, 2]
        H, g = jax.vmap(group_hg)(params_shard, pixels_shard)
        dtype = H.dtype
        damp = lam * jnp.clip(
            jax.vmap(jnp.diag)(H), 1e-8, 1e30
        )
        Hd = H + jax.vmap(jnp.diag)(damp)

        H_ll = Hd[:, local_idx[:, None], local_idx[None, :]]
        H_ls = Hd[:, local_idx[:, None], shared_idx[None, :]]
        H_ss = Hd[:, shared_idx[:, None], shared_idx[None, :]]
        g_l = g[:, local_idx]
        g_s = g[:, shared_idx]

        H_ll = H_ll + jnp.diag((~free_l).astype(dtype))[None]
        # local factorization once, reused for both solves
        X = jnp.linalg.solve(H_ll, jnp.concatenate([H_ls, g_l[..., None]], axis=-1))
        Hinv_Hls = X[..., :n_shared]
        Hinv_gl = X[..., n_shared]

        S_local = jnp.sum(
            H_ss - jnp.einsum("gls,glt->gst", H_ls, Hinv_Hls), axis=0
        )
        rhs_local = jnp.sum(g_s - jnp.einsum("gls,gl->gs", H_ls, Hinv_gl), axis=0)

        S = jax.lax.psum(S_local, "groups")
        rhs = jax.lax.psum(rhs_local, "groups")
        S = S + jnp.diag((~free_s).astype(dtype))
        d_s = -jnp.linalg.solve(S, rhs)
        d_s = jnp.where(free_s, d_s, 0.0)

        d_l = -jnp.einsum(
            "gab,gb->ga",
            jnp.linalg.inv(H_ll),
            g_l + jnp.einsum("gls,s->gl", H_ls, d_s),
        )
        d_l = jnp.where(free_l[None], d_l, 0.0)

        delta = jnp.zeros((H.shape[0], layout.dim), dtype)
        delta = delta.at[:, local_idx].set(d_l)
        delta = delta.at[:, shared_idx].set(d_s[None].repeat(H.shape[0], 0))
        new_params = jax.vmap(layout.retract)(params_shard, delta)
        return new_params, delta

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def step(params, pixels):
        return shard_map(
            device_step,
            mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P("groups"), params), P("groups")),
            out_specs=(jax.tree.map(lambda _: P("groups"), params), P("groups")),
        )(params, pixels)

    return jax.jit(step)


def run_sharded_ba(
    n_devices: int,
    groups_per_device: int = 1,
    iterations: int = 5,
    devices=None,
):
    """Create a groups-mesh, build synthetic groups, run `iterations`
    sharded LM steps. Returns (mesh, initial params, final params, cost_fn).
    """
    devices = devices if devices is not None else jax.devices()[:n_devices]
    mesh = Mesh(np.asarray(devices), ("groups",))
    G = n_devices * groups_per_device
    params, block_template, pixels, free, layout = make_synthetic_groups(G)

    sharding = NamedSharding(mesh, P("groups"))
    params = jax.tree.map(lambda x: jax.device_put(x, sharding), params)
    pixels = jax.device_put(pixels, sharding)

    step = make_sharded_lm_step(mesh, block_template, free, layout)

    def cost(params_all):
        def one(params_g, pix_g):
            blk = B.BlockSpec(
                slots=block_template.slots,
                data=dict(block_template.data, pixel=pix_g),
                weight=block_template.weight,
                resid_one=block_template.resid_one,
                num_residuals=block_template.num_residuals,
                huber_delta=block_template.huber_delta,
                name=block_template.name,
            )
            return lm.block_cost(params_g, blk)

        return jnp.sum(jax.vmap(one)(params_all, pixels))

    p0 = params
    for _ in range(iterations):
        params, _ = step(params, pixels)
    return mesh, p0, params, jax.jit(cost)
