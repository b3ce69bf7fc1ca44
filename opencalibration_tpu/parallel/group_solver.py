"""Batched multi-group relax solver.

The reference solves each RelaxGroup with its own Ceres run on an OMP
thread (reference src/pipeline/relax_stage.cpp:100-111). The TPU-native
equivalent is ONE device dispatch for *all* groups: every group's
BuiltProblem is padded to a common tangent layout and common per-family
block shapes, stacked along a leading `G` axis, and solved with a vmapped
masked-LM loop. On a multi-device `jax.sharding.Mesh` the same stacked
arrays are placed with a `P("groups")` sharding so XLA runs groups
data-parallel across chips (one `any(active)` all-reduce per LM
iteration is the only collective — halo freezing keeps groups
independent; shared-intrinsics coupling across groups lives in
parallel.sharded_ba's psum-Schur step).

Padding contract:
* camera / mesh-vertex / point / model slots beyond a group's real count
  are frozen (free mask False) and never touched;
* block instances beyond a group's real count carry weight 0 and slot 0 —
  lm's finite-guard + weight masking make them exact no-ops;
* a group missing a block family entirely gets an all-zero dummy block of
  that family.

The batched solve is numerically equivalent to the serial per-group
lm.solve: jax.vmap of lax.while_loop masks per-lane updates, so each
group's LM trajectory (lambda schedule, accept/reject sequence) is
identical to its solo run; only the padded frozen slots add benign
unit-diagonal rows to the Cholesky factorization.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.relax import lm
from opencalibration_tpu.relax.blocks import BlockSpec
from opencalibration_tpu.relax.problem_builder import BuiltProblem, _bucket
from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout

DOWN_QUAT = np.array([0.0, 1.0, 0.0, 0.0])

# tangent segments in layout order: (offset attr, length fn)
_SEGMENTS = (
    ("rot_off", lambda l: 3 * l.C),
    ("mesh_off", lambda l: l.V),
    ("point_off", lambda l: 3 * l.P),
    ("focal_off", lambda l: l.M),
    ("principal_off", lambda l: 2 * l.M),
    ("radial_off", lambda l: 3 * l.M),
    ("tangential_off", lambda l: 2 * l.M),
)


# intrinsics segments: (offset attr, per-model width)
_MODEL_SEGMENTS = (
    ("focal_off", 1),
    ("principal_off", 2),
    ("radial_off", 3),
    ("tangential_off", 2),
)


def _translate_slots(
    slots, old: TangentLayout, new: TangentLayout, model_perm=None
) -> np.ndarray:
    """Map tangent slot indices from a group's own layout into the common
    padded layout (segment-wise shift; within-segment order is preserved).
    With `model_perm`, intrinsics slots are additionally remapped from the
    group's local model slot k to the global slot model_perm[k] (shared-
    intrinsics batches align every group on one global model list)."""
    s = np.asarray(slots, np.int64)
    old_offs = np.array([getattr(old, a) for a, _ in _SEGMENTS] + [old.dim])
    new_offs = np.array([getattr(new, a) for a, _ in _SEGMENTS])
    seg = np.clip(np.searchsorted(old_offs[1:], s, side="right"), 0, 6)
    out = new_offs[seg] + (s - old_offs[seg])
    if model_perm is not None and len(model_perm):
        perm = np.asarray(model_perm, np.int64)
        for seg_id, (attr, width) in enumerate(_MODEL_SEGMENTS, start=3):
            in_seg = seg == seg_id
            rel = s - old_offs[seg_id]
            k = np.clip(rel // width, 0, len(perm) - 1)
            r = rel % width
            out = np.where(
                in_seg, getattr(new, attr) + perm[k] * width + r, out
            )
    return out.astype(np.int32)


def _translate_mask(
    mask, old: TangentLayout, new: TangentLayout, model_perm=None
) -> np.ndarray:
    out = np.zeros(new.dim, bool)
    m = np.asarray(mask)
    for attr, length in _SEGMENTS[:3]:
        ln = length(old)
        o, n = getattr(old, attr), getattr(new, attr)
        out[n : n + ln] = m[o : o + ln]
    for attr, width in _MODEL_SEGMENTS:
        o, n = getattr(old, attr), getattr(new, attr)
        for k in range(old.M):
            kk = k if model_perm is None else int(model_perm[k])
            out[n + kk * width : n + (kk + 1) * width] = m[
                o + k * width : o + (k + 1) * width
            ]
    return out


def _pad_rows_np(arr: np.ndarray, target: int, fill=0) -> np.ndarray:
    if len(arr) >= target:
        return arr[:target]
    pad_shape = (target - len(arr),) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)])


def _pad_params(p: RelaxParams, C: int, V: int, P: int, M: int) -> RelaxParams:
    """Pad every leaf to the common dims. Padded quats are valid unit
    quaternions (nadir) so retraction/normalization stay finite."""
    quats = np.asarray(p.quats)
    pad_q = np.broadcast_to(DOWN_QUAT, (C - quats.shape[0], 4)).astype(quats.dtype)
    return RelaxParams(
        quats=jnp.asarray(np.concatenate([quats, pad_q])),
        positions=jnp.asarray(_pad_rows_np(np.asarray(p.positions), C)),
        mesh_z=jnp.asarray(_pad_rows_np(np.asarray(p.mesh_z), V)),
        points=jnp.asarray(_pad_rows_np(np.asarray(p.points), P)),
        focal=jnp.asarray(_pad_rows_np(np.asarray(p.focal), M, fill=1.0)),
        principal=jnp.asarray(_pad_rows_np(np.asarray(p.principal), M)),
        radial=jnp.asarray(_pad_rows_np(np.asarray(p.radial), M)),
        tangential=jnp.asarray(_pad_rows_np(np.asarray(p.tangential), M)),
    )


@dataclasses.dataclass
class GroupBatch:
    """Stacked problems: params/blocks/free leaves carry a leading G axis."""

    params: RelaxParams
    blocks: tuple  # of BlockSpec, leaves [G, ...]
    free: jnp.ndarray  # [G, T]
    surface_free: jnp.ndarray  # [G, T]
    layout: TangentLayout  # common padded layout
    builts: List[BuiltProblem]
    num_groups: int  # real (unpadded) group count
    shared_intrinsics: bool = False  # intrinsics tail aligned on one
    # global model list (every group carries identical intrinsics leaves)


def build_group_batch(
    builts: Sequence[BuiltProblem], shared_intrinsics: bool = False
) -> GroupBatch:
    """Pad + stack a list of BuiltProblems into one batched problem.

    With ``shared_intrinsics`` the groups' camera models are aligned on a
    single global model list: every group's intrinsics leaves hold the
    same global values, intrinsics slots/data indices are permuted to the
    global positions, and each built's model_index is rewritten to global
    slots (so apply_solution writes back consistently). The shared solver
    then couples the tail across groups with a psum-Schur complement."""
    assert builts, "no problems to batch"
    C = _bucket(max(b.params.C for b in builts), minimum=4)
    V = _bucket(max(b.params.V for b in builts), minimum=1) if any(
        b.params.V for b in builts
    ) else 0
    P = _bucket(max(b.params.P for b in builts), minimum=1) if any(
        b.params.P for b in builts
    ) else 0

    model_perms: List[Optional[np.ndarray]] = [None] * len(builts)
    if shared_intrinsics:
        global_mids = sorted({mid for b in builts for mid in b.model_index})
        global_slot = {mid: i for i, mid in enumerate(global_mids)}
        M = max(1, len(global_mids))
        # global intrinsics values: take each model's leaves from the first
        # group that carries it (identical across groups by construction —
        # they come from the same model_store)
        leaves = {
            "focal": np.ones(M), "principal": np.zeros((M, 2)),
            "radial": np.zeros((M, 3)), "tangential": np.zeros((M, 2)),
        }
        for mid in global_mids:
            for b in builts:
                if mid in b.model_index:
                    k = b.model_index[mid]
                    leaves["focal"][global_slot[mid]] = np.asarray(b.params.focal)[k]
                    leaves["principal"][global_slot[mid]] = np.asarray(b.params.principal)[k]
                    leaves["radial"][global_slot[mid]] = np.asarray(b.params.radial)[k]
                    leaves["tangential"][global_slot[mid]] = np.asarray(b.params.tangential)[k]
                    break
        for i, b in enumerate(builts):
            perm = np.zeros(max(1, b.params.M), np.int64)
            for mid, k in b.model_index.items():
                perm[k] = global_slot[mid]
            model_perms[i] = perm
            b.model_index = {mid: global_slot[mid] for mid in b.model_index}
        padded = []
        for b in builts:
            p = _pad_params(b.params, C, V, P, b.params.M)
            dt = np.asarray(p.focal).dtype
            padded.append(
                dataclasses.replace(
                    p,
                    focal=jnp.asarray(leaves["focal"], dt),
                    principal=jnp.asarray(leaves["principal"], dt),
                    radial=jnp.asarray(leaves["radial"], dt),
                    tangential=jnp.asarray(leaves["tangential"], dt),
                )
            )
    else:
        M = max(b.params.M for b in builts)
        padded = [_pad_params(b.params, C, V, P, M) for b in builts]
    layout = TangentLayout(C, V, P, M)

    params = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
    free = jnp.asarray(
        np.stack(
            [
                _translate_mask(b.free_mask, b.layout, layout, model_perms[i])
                for i, b in enumerate(builts)
            ]
        )
    )
    surface_free = jnp.asarray(
        np.stack(
            [
                _translate_mask(
                    b.surface_free_mask, b.layout, layout, model_perms[i]
                )
                for i, b in enumerate(builts)
            ]
        )
    )

    # --- block families: union across groups, canonical first-seen order ---
    family_order: List[str] = []
    donors = {}
    for b in builts:
        for blk in b.blocks:
            if blk.name not in donors:
                donors[blk.name] = blk
                family_order.append(blk.name)

    stacked_blocks = []
    for name in family_order:
        donor = donors[name]
        group_blks = [
            next((blk for blk in b.blocks if blk.name == name), None)
            for b in builts
        ]
        B_target = _bucket(
            max(blk.slots.shape[0] for blk in group_blks if blk is not None),
            minimum=16,
        )
        L = donor.slots.shape[1]

        slots_g, weight_g, data_g = [], [], []
        for i, (b, blk) in enumerate(zip(builts, group_blks)):
            if blk is None:
                slots_g.append(np.zeros((B_target, L), np.int32))
                weight_g.append(
                    np.zeros(B_target, np.asarray(donor.weight).dtype)
                )
                data_g.append(
                    {
                        k: np.zeros(
                            (B_target,) + np.asarray(v).shape[1:],
                            np.asarray(v).dtype,
                        )
                        for k, v in donor.data.items()
                    }
                )
            else:
                assert set(blk.data.keys()) == set(donor.data.keys()), (
                    f"mixed {name} block variants in one batch"
                )
                slots_g.append(
                    _pad_rows_np(
                        _translate_slots(
                            blk.slots, b.layout, layout, model_perms[i]
                        ),
                        B_target,
                    )
                )
                weight_g.append(
                    _pad_rows_np(np.asarray(blk.weight), B_target)
                )
                d = {
                    k: _pad_rows_np(np.asarray(v), B_target)
                    for k, v in blk.data.items()
                }
                if model_perms[i] is not None and "model_i" in d:
                    perm = model_perms[i]
                    d["model_i"] = perm[
                        np.clip(d["model_i"], 0, len(perm) - 1)
                    ].astype(np.int32)
                data_g.append(d)

        stacked_blocks.append(
            BlockSpec(
                slots=jnp.asarray(np.stack(slots_g)),
                data={
                    k: jnp.asarray(np.stack([d[k] for d in data_g]))
                    for k in donor.data
                },
                weight=jnp.asarray(np.stack(weight_g)),
                resid_one=donor.resid_one,
                num_residuals=donor.num_residuals,
                huber_delta=donor.huber_delta,
                name=donor.name,
            )
        )

    return GroupBatch(
        params=params,
        blocks=tuple(stacked_blocks),
        free=free,
        surface_free=surface_free,
        layout=layout,
        builts=list(builts),
        num_groups=len(builts),
        shared_intrinsics=shared_intrinsics,
    )


@functools.partial(
    jax.jit, static_argnames=("layout", "pre_solve", "max_iterations")
)
def _solve_batch(params, blocks, free, surface_free, layout, pre_solve,
                 max_iterations):
    def one(p, blks, fr, sfr):
        if pre_solve:
            p, _ = lm.solve(
                p, blks, layout, sfr, max_iterations=max_iterations
            )
        return lm.solve(p, blks, layout, fr, max_iterations=max_iterations)

    return jax.vmap(one)(params, blocks, free, surface_free)


def _duplicate_group(tree, src: int, times: int):
    """Append `times` copies of group `src` along axis 0 of every leaf."""
    return jax.tree.map(
        lambda x: jnp.concatenate(
            [x] + [x[src : src + 1]] * times, axis=0
        ),
        tree,
    )


def solve_group_batch(
    batch: GroupBatch,
    pre_solve: bool,
    max_iterations: int = lm.DEFAULT_MAX_ITERATIONS,
    devices=None,
) -> Tuple[RelaxParams, "lm.SolveInfo"]:
    """Solve all groups in one dispatch; shard over devices when several
    are visible. Returns (solved params [G-stacked], SolveInfo [G])."""
    devices = list(jax.devices()) if devices is None else list(devices)
    params, blocks, free, surface_free = (
        batch.params, batch.blocks, batch.free, batch.surface_free,
    )
    G = batch.num_groups
    D = len(devices)
    if D == 1 and G > 1:
        # Single chip: run groups through ONE compiled single-group solve
        # instead of a G-vmapped program — a vmapped while-loop body
        # recompiles for every distinct G (minutes per compile on TPU),
        # while serial dispatches of the shared-shape program compile once
        # and execute back-to-back on the same MXU.
        one = lambda t, g: jax.tree.map(lambda x: x[g : g + 1], t)
        solved_parts, info_parts = [], []
        for g in range(G):
            s, i = _solve_batch(
                one(params, g), one(blocks, g), free[g : g + 1],
                surface_free[g : g + 1], batch.layout, pre_solve,
                max_iterations,
            )
            solved_parts.append(s)
            info_parts.append(i)
        cat = lambda parts: jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts
        )
        return cat(solved_parts), cat(info_parts)
    if D > 1:
        pad = (-G) % D
        if pad:
            params = _duplicate_group(params, 0, pad)
            blocks = _duplicate_group(blocks, 0, pad)
            # padded replicas are fully frozen: they no-op in 1 iteration
            frozen = jnp.zeros((pad, batch.layout.dim), bool)
            free = jnp.concatenate([free, frozen])
            surface_free = jnp.concatenate([surface_free, frozen])
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(devices), ("groups",))
        sh = NamedSharding(mesh, P("groups"))
        put = lambda t: jax.tree.map(lambda x: jax.device_put(x, sh), t)
        params, blocks = put(params), put(blocks)
        free, surface_free = put(free), put(surface_free)

    solved, info = _solve_batch(
        params, blocks, free, surface_free, batch.layout, pre_solve,
        max_iterations,
    )
    if D > 1 and (-G) % D:
        solved = jax.tree.map(lambda x: x[:G], solved)
        info = jax.tree.map(lambda x: x[:G], info)
    return solved, info


@functools.partial(
    jax.jit,
    static_argnames=("layout", "mesh", "max_iterations", "init_lambda"),
)
def _solve_shared(
    params, blocks, free, layout, mesh, max_iterations, init_lambda=1.0,
    parameter_tolerance=1e-8, function_tolerance=1e-6,
):
    """Joint LM over all groups with the intrinsics tail shared.

    One global trust-region loop: per iteration every group assembles its
    damped normal equations, Schur-eliminates its local (pose/mesh/point)
    slots, the reduced |intrinsics|^2 system is psum-reduced over the
    'groups' mesh axis and solved replicated, local steps back-substitute,
    and a GLOBAL cost (psum over groups) drives one shared accept/lambda —
    exactly the trust-region trajectory of the joint problem
    (reference solves the single biggest group instead,
    relax_stage.cpp:100-111 + pipeline.cpp:634; this scales past it)."""
    from jax import lax

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    dtype = params.quats.dtype
    T = layout.dim
    n_local = layout.focal_off
    n_shared = T - n_local

    def device_fn(params, blocks, free):
        # leaves carry the device-local group shard [Gl, ...]
        free_l = free[:, :n_local]  # [Gl, nl]
        # shared tail must be identical across groups for a joint problem
        free_s = lax.psum(
            jnp.any(free[:, n_local:], axis=0).astype(jnp.int32), "groups"
        ) > 0  # [ns]
        free_join = jnp.concatenate(
            [free_l, jnp.broadcast_to(free_s[None], (free.shape[0], n_shared))],
            axis=1,
        )

        def cost_all(p):
            per = jax.vmap(lambda pg, bg: lm.total_cost(pg, bg))(p, blocks)
            return lax.psum(jnp.sum(per), "groups")

        def body(state):
            p, lam, it, done, cost = state
            H, g = jax.vmap(
                lambda pg, bg, fg: lm.normal_equations(pg, bg, layout, fg)
            )(p, blocks, free_join)
            diag = jnp.clip(
                jax.vmap(jnp.diag)(H), 1e-10, 1e32
            )  # [Gl, T]

            H_ll = H[:, :n_local, :n_local] + jax.vmap(jnp.diag)(
                lam * diag[:, :n_local] + (~free_l).astype(dtype)
            )
            H_ls = H[:, :n_local, n_local:]
            H_ss = H[:, n_local:, n_local:]
            g_l = g[:, :n_local]
            g_s = g[:, n_local:]

            X = jnp.linalg.solve(
                H_ll, jnp.concatenate([H_ls, g_l[..., None]], axis=-1)
            )
            Hinv_Hls = X[..., :n_shared]
            Hinv_gl = X[..., n_shared]

            S_local = jnp.sum(
                H_ss - jnp.einsum("gls,glt->gst", H_ls, Hinv_Hls), axis=0
            )
            rhs_local = jnp.sum(
                g_s - jnp.einsum("gls,gl->gs", H_ls, Hinv_gl), axis=0
            )
            dss_local = jnp.sum(
                jax.vmap(jnp.diag)(H_ss), axis=0
            )
            packed = jnp.concatenate(
                [S_local, rhs_local[:, None], dss_local[:, None]], axis=1
            )
            packed = lax.psum(packed, "groups")
            S = packed[:, :n_shared]
            rhs = packed[:, n_shared]
            dss = jnp.clip(packed[:, n_shared + 1], 1e-10, 1e32)
            S = S + jnp.diag(lam * dss) + jnp.diag((~free_s).astype(dtype))
            d_s = -jnp.linalg.solve(S, rhs)
            d_s = jnp.where(free_s, d_s, 0.0)

            d_l = -(Hinv_gl + jnp.einsum("gls,s->gl", Hinv_Hls, d_s))
            d_l = jnp.where(free_l, d_l, 0.0)

            Gl = H.shape[0]
            delta = jnp.concatenate(
                [d_l, jnp.broadcast_to(d_s[None], (Gl, n_shared))], axis=1
            )
            p_new = jax.vmap(layout.retract)(p, delta)
            new_cost = cost_all(p_new)
            accept = jnp.isfinite(new_cost) & (new_cost < cost)

            p = jax.tree.map(lambda a, b: jnp.where(accept, b, a), p, p_new)
            cost_next = jnp.where(accept, new_cost, cost)
            lam = jnp.where(
                accept,
                jnp.maximum(lam / 3.0, 1e-12),
                jnp.minimum(lam * 4.0, 1e12),
            )
            step = jnp.max(jnp.abs(delta))
            step = lax.pmax(step, "groups")
            step_small = step < parameter_tolerance
            cost_flat = accept & (
                (cost - new_cost)
                < function_tolerance * jnp.maximum(cost, 1e-30)
            )
            done = step_small | cost_flat | (lam > 1e10)
            return (p, lam, it + 1, done, cost_next)

        def cond(state):
            _, _, it, done, _ = state
            return (~done) & (it < max_iterations)

        cost0 = cost_all(params)
        state0 = (
            params,
            jnp.asarray(init_lambda, dtype),
            jnp.asarray(0, jnp.int32),
            ~jnp.isfinite(cost0),
            cost0,
        )
        p, _, iters, _, cost = lax.while_loop(cond, body, state0)
        return p, lm.SolveInfo(
            initial_cost=cost0, final_cost=cost, iterations=iters
        )

    from jax.sharding import PartitionSpec as P

    gspec = jax.tree.map(lambda _: P("groups"), params)
    bspec = jax.tree.map(lambda _: P("groups"), blocks)
    rep = lm.SolveInfo(
        initial_cost=P(), final_cost=P(), iterations=P()
    )
    return shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(gspec, bspec, P("groups")),
        out_specs=(gspec, rep),
    )(params, blocks, free)


def solve_group_batch_shared(
    batch: GroupBatch,
    pre_solve: bool,
    max_iterations: int = lm.DEFAULT_MAX_ITERATIONS,
    devices=None,
) -> Tuple[RelaxParams, "lm.SolveInfo"]:
    """Joint solve of a shared-intrinsics batch (built with
    shared_intrinsics=True): groups data-parallel over the device mesh,
    intrinsics coupled exactly via the distributed Schur complement."""
    assert batch.shared_intrinsics, "build the batch with shared_intrinsics"
    devices = list(jax.devices()) if devices is None else list(devices)
    params, blocks, free = batch.params, batch.blocks, batch.free
    if pre_solve:
        # the surface pre-solve touches only local (mesh/point) slots —
        # groups are independent there, reuse the plain batched solver
        params, _ = _solve_batch(
            params, blocks, batch.surface_free,
            jnp.zeros_like(batch.surface_free), batch.layout, False,
            max_iterations,
        )
    G = batch.num_groups
    D = min(len(devices), G)
    pad = (-G) % D
    if pad:
        params = _duplicate_group(params, 0, pad)
        blocks = _duplicate_group(blocks, 0, pad)
        free = jnp.concatenate(
            [free, jnp.zeros((pad, batch.layout.dim), bool)]
        )
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(devices[:D]), ("groups",))
    sh = NamedSharding(mesh, P("groups"))
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, sh), t)
    solved, info = _solve_shared(
        put(params), put(blocks), put(free), batch.layout, mesh,
        max_iterations,
    )
    if pad:
        solved = jax.tree.map(lambda x: x[:G], solved)
    return solved, info


def extract_group_params(
    batch: GroupBatch, solved: RelaxParams, g: int
) -> RelaxParams:
    """Slice group g's solved parameters back to its own (unpadded) shapes.
    In a shared-intrinsics batch, model slots are global: keep the full
    intrinsics leaves (built.model_index was rewritten to global slots)."""
    b = batch.builts[g]
    M = batch.layout.M if batch.shared_intrinsics else b.params.M
    pg = jax.tree.map(lambda x: x[g], solved)
    return RelaxParams(
        quats=pg.quats[: b.params.C],
        positions=pg.positions[: b.params.C],
        mesh_z=pg.mesh_z[: b.params.V],
        points=pg.points[: b.params.P],
        focal=pg.focal[:M],
        principal=pg.principal[:M],
        radial=pg.radial[:M],
        tangential=pg.tangential[:M],
    )
