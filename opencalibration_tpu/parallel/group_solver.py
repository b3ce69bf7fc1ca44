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
    # local->global model slot permutation per group (shared batches);
    # kept so refresh_group_batch can re-translate masks without a rebuild
    model_perms: Optional[List[Optional[np.ndarray]]] = None
    # (lam_l [G], lam_s scalar|None) written by the solvers after each
    # solve; the next solve of the same batch (REPEAT iteration with
    # refreshed values) warm-starts its trust region from these
    warm_lambda: Optional[tuple] = None


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
        padded = []
        for i, b in enumerate(builts):
            perm = np.zeros(max(1, b.params.M), np.int64)
            for mid, k in b.model_index.items():
                perm[k] = global_slot[mid]
            model_perms[i] = perm
            b.model_index = {mid: global_slot[mid] for mid in b.model_index}
            dt = np.asarray(b.params.focal).dtype
            # the built's OWN intrinsics leaves switch to the global list
            # too, consistent with the rewritten model_index — so
            # refresh_problem (which writes focal[model_index[mid]]) stays
            # correct on cached-plan reuse with several camera models
            b.params = dataclasses.replace(
                b.params,
                focal=np.asarray(leaves["focal"], dt),
                principal=np.asarray(leaves["principal"], dt),
                radial=np.asarray(leaves["radial"], dt),
                tangential=np.asarray(leaves["tangential"], dt),
            )
            padded.append(_pad_params(b.params, C, V, P, M))
    else:
        M = max(b.params.M for b in builts)
        padded = [_pad_params(b.params, C, V, P, M) for b in builts]
    layout = TangentLayout(C, V, P, M)

    # numpy stacking: this is host orchestration — the stacked pytree
    # crosses into XLA at the jitted group-solve boundary, and eager
    # jnp.stack here costs an XLA compile per new (G, ...) shape
    params = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *padded)
    free = (
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
        model_perms=model_perms,
    )


def refresh_group_batch(batch: GroupBatch) -> GroupBatch:
    """Re-stack ONLY the parts of a cached GroupBatch that change when its
    builts were value-refreshed (problem_builder.refresh_problem): params,
    free masks (the intrinsics tier schedule lives in the masks), and the
    mesh_anchor targets (re-anchored to the pass-entry mesh). The stacked
    measurement blocks — the expensive part of build_group_batch — are
    structure and carry over untouched (~35 s of a 104-image run was
    re-stacking unchanged blocks)."""
    layout = batch.layout
    builts = batch.builts
    perms = batch.model_perms or [None] * len(builts)
    padded = [
        _pad_params(b.params, layout.C, layout.V, layout.P, layout.M)
        for b in builts
    ]
    # numpy stacking: this is host orchestration — the stacked pytree
    # crosses into XLA at the jitted group-solve boundary, and eager
    # jnp.stack here costs an XLA compile per new (G, ...) shape
    params = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *padded)
    free = (
        np.stack(
            [
                _translate_mask(b.free_mask, b.layout, layout, perms[i])
                for i, b in enumerate(builts)
            ]
        )
    )
    surface_free = jnp.asarray(
        np.stack(
            [
                _translate_mask(b.surface_free_mask, b.layout, layout, perms[i])
                for i, b in enumerate(builts)
            ]
        )
    )
    blocks = []
    for blk in batch.blocks:
        if blk.name != "mesh_anchor":
            blocks.append(blk)
            continue
        B_target = blk.slots.shape[1]
        targets = []
        for b in builts:
            own = next(
                (x for x in b.blocks if x.name == "mesh_anchor"), None
            )
            if own is None:
                targets.append(np.zeros(B_target, np.asarray(blk.data["target"]).dtype))
            else:
                targets.append(
                    _pad_rows_np(np.asarray(own.data["target"]), B_target)
                )
        data = dict(blk.data)
        data["target"] = jnp.asarray(np.stack(targets))
        blocks.append(dataclasses.replace(blk, data=data))
    return dataclasses.replace(
        batch,
        params=params,
        free=free,
        surface_free=surface_free,
        blocks=tuple(blocks),
    )


@functools.partial(
    jax.jit, static_argnames=("layout", "pre_solve", "max_iterations")
)
def _solve_batch(params, blocks, free, surface_free, layout, pre_solve,
                 max_iterations, init_lambda=None):
    if init_lambda is None:
        init_lambda = jnp.ones(free.shape[0], params.quats.dtype)

    def one(p, blks, fr, sfr, lam0):
        if pre_solve:
            p, _ = lm.solve(
                p, blks, layout, sfr, max_iterations=max_iterations
            )
        return lm.solve(
            p, blks, layout, fr, max_iterations=max_iterations,
            init_lambda=lam0,
        )

    return jax.vmap(one)(params, blocks, free, surface_free,
                         jnp.asarray(init_lambda))


def _duplicate_group(tree, src: int, times: int):
    """Append `times` copies of group `src` along axis 0 of every leaf.

    Host-path helper: numpy-concatenate numpy leaves (eager jnp here
    costs an XLA compile per new pad count), jnp for device leaves."""
    def dup(x):
        xp = np if isinstance(x, np.ndarray) else jnp
        return xp.concatenate([x] + [x[src : src + 1]] * times, axis=0)

    return jax.tree.map(dup, tree)


def solve_group_batch(
    batch: GroupBatch,
    pre_solve: bool,
    max_iterations: int = lm.DEFAULT_MAX_ITERATIONS,
    devices=None,
    init_lambda=None,
) -> Tuple[RelaxParams, "lm.SolveInfo"]:
    """Solve all groups in one dispatch; shard over devices when several
    are visible. Returns (solved params [G-stacked], SolveInfo [G]).
    ``init_lambda`` ([G] array) warm-starts each group's trust region
    (use info.final_lambda from the previous REPEAT solve)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    params, blocks, free, surface_free = (
        batch.params, batch.blocks, batch.free, batch.surface_free,
    )
    if init_lambda is None and batch.warm_lambda is not None:
        init_lambda = batch.warm_lambda[0]
    if init_lambda is not None:
        # clamp: a fully-converged previous solve leaves lambda at its
        # floor — restarting there risks a long doubling climb if the
        # refreshed problem moved; restarting too high wastes shrink steps
        init_lambda = jnp.clip(jnp.asarray(init_lambda), 1e-6, 1e2)
    G = batch.num_groups
    D = len(devices)
    if D > 1:
        pad = (-G) % D
    else:
        # Single chip: bucket the group count to a power of two so ALL
        # groups run in ONE vmapped dispatch with a bounded compile
        # family ({1,2,4,8,...} x layouts, served by the persistent
        # compilation cache) — small pose-group systems batched along G
        # fill the MXU far better than G serial dispatches
        # (reference parallelism semantics: relax_stage.cpp:100-111).
        pad = _bucket(G, minimum=1) - G
    if pad:
        params = _duplicate_group(params, 0, pad)
        blocks = _duplicate_group(blocks, 0, pad)
        # padded replicas are fully frozen: they no-op in 1 iteration
        frozen = np.zeros((pad, batch.layout.dim), bool)
        free = np.concatenate([np.asarray(free), frozen])
        surface_free = np.concatenate([np.asarray(surface_free), frozen])
        if init_lambda is not None:
            init_lambda = np.concatenate(
                [np.asarray(init_lambda), np.ones(pad, np.asarray(init_lambda).dtype)]
            )
    lam0 = (
        None
        if init_lambda is None
        else jnp.asarray(init_lambda, batch.params.quats.dtype)
    )
    if D > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(devices), ("groups",))
        sh = NamedSharding(mesh, P("groups"))
        put = lambda t: jax.tree.map(lambda x: jax.device_put(x, sh), t)
        params, blocks = put(params), put(blocks)
        free, surface_free = put(free), put(surface_free)
        if lam0 is not None:
            lam0 = jax.device_put(lam0, sh)

    # HBM relief valve for very large surveys on one chip: cap groups per
    # dispatch (power of two so every chunk reuses one compiled module).
    # The vmapped solve holds every group's per-block quadratics at once;
    # at 10k-image scale (200+ pose groups) that can exceed a single v5e's
    # 16 GB. Chunks run sequentially on the device queue — same total
    # compute, bounded live memory.
    import os

    chunk_env = os.environ.get("OC_TPU_MAX_GROUPS_PER_DISPATCH")
    Gp = free.shape[0]
    chunk = int(chunk_env) if chunk_env else 0
    if D == 1 and chunk > 0 and Gp > chunk:
        chunk = 1 << (chunk.bit_length() - 1)  # round down to power of 2
        parts = []
        for i in range(0, Gp, chunk):
            sl = lambda t: jax.tree.map(lambda x: x[i : i + chunk], t)
            parts.append(
                _solve_batch(
                    sl(params), sl(blocks), free[i : i + chunk],
                    surface_free[i : i + chunk], batch.layout, pre_solve,
                    max_iterations,
                    None if lam0 is None else lam0[i : i + chunk],
                )
            )
        solved = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *[p[0] for p in parts]
        )
        info = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *[p[1] for p in parts]
        )
    else:
        solved, info = _solve_batch(
            params, blocks, free, surface_free, batch.layout, pre_solve,
            max_iterations, lam0,
        )
    if pad:
        solved = jax.tree.map(lambda x: x[:G], solved)
        info = jax.tree.map(lambda x: x[:G], info)
    batch.warm_lambda = (info.final_lambda, None)
    return solved, info


@functools.partial(
    jax.jit,
    static_argnames=("layout", "mesh", "max_iterations", "n_local"),
)
def _solve_shared(
    params, blocks, free, layout, mesh, max_iterations, n_local=None,
    init_lam_l=None, init_lam_s=1.0,
    parameter_tolerance=1e-8, function_tolerance=1e-6,
):
    """Joint LM over all groups with the trailing tangent block SHARED.

    `n_local` splits the tangent: slots < n_local are group-local (poses,
    and points when present), slots >= n_local are one shared copy across
    every group. For mesh problems the caller shares [mesh_z, intrinsics]
    (n_local = mesh_off, exact because mesh problems carry no points) —
    making the joint solve THE global calibration problem (one surface,
    one set of intrinsics, all cameras) minus cross-group edges; for
    point problems only the intrinsics tail is shared (n_local =
    focal_off).

    Trust region: per iteration every group assembles its damped normal
    equations, Schur-eliminates its local slots, the reduced |shared|^2
    system is psum-reduced over the 'groups' mesh axis and solved
    replicated, local steps back-substitute, and a GLOBAL cost (psum over
    groups) drives the accept test — the joint objective only ever
    decreases. Damping is split: each group's LOCAL blocks carry their
    own lambda (adapted from that group's own cost change), the shared
    Schur system carries one shared lambda — so a single ill-conditioned
    group raises only its own damping instead of throttling every
    group's step (the reference's independent per-group solves get this
    for free, relax_stage.cpp:100-111 + pipeline.cpp:634; this keeps it
    while scaling past the single-biggest-group shortcut)."""
    from jax import lax

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    dtype = params.quats.dtype
    T = layout.dim
    if n_local is None:
        n_local = layout.focal_off
    n_shared = T - n_local
    G_tot = free.shape[0]
    if init_lam_l is None:
        init_lam_l = jnp.full((G_tot,), init_lam_s, dtype)
    init_lam_l = jnp.asarray(init_lam_l, dtype)
    init_lam_s = jnp.asarray(init_lam_s, dtype)

    def device_fn(params, blocks, free, lam_l0, lam_s0):
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

        def cost_per(p):
            return jax.vmap(lambda pg, bg: lm.total_cost(pg, bg))(p, blocks)

        def body(state):
            p, lam_l, lam_s, nu_s, it, done, cost, per = state
            H, g = jax.vmap(
                lambda pg, bg, fg: lm.normal_equations(pg, bg, layout, fg)
            )(p, blocks, free_join)
            diag = jnp.clip(
                jax.vmap(jnp.diag)(H), 1e-10, 1e32
            )  # [Gl, T]

            H_ll = H[:, :n_local, :n_local] + jax.vmap(jnp.diag)(
                lam_l[:, None] * diag[:, :n_local] + (~free_l).astype(dtype)
            )
            H_ls = H[:, :n_local, n_local:]
            H_ss = H[:, n_local:, n_local:]
            g_l = g[:, :n_local]
            g_s = g[:, n_local:]

            # Jacobi-scaled block solves (see lm._jacobi_solve): required
            # for f32/TPU factorizations over mixed-unit tangents
            s_l = jax.lax.rsqrt(
                jnp.clip(jax.vmap(jnp.diag)(H_ll), 1e-24, 1e32)
            )  # [Gl, nl]
            H_ll_s = H_ll * s_l[:, :, None] * s_l[:, None, :]
            B = jnp.concatenate([H_ls, g_l[..., None]], axis=-1)
            X = s_l[:, :, None] * jnp.linalg.solve(
                H_ll_s, s_l[:, :, None] * B
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
            S = S + jnp.diag(lam_s * dss) + jnp.diag((~free_s).astype(dtype))
            d_s = -lm._jacobi_solve(S, rhs)
            d_s = jnp.where(free_s, d_s, 0.0)

            d_l = -(Hinv_gl + jnp.einsum("gls,s->gl", Hinv_Hls, d_s))
            d_l = jnp.where(free_l, d_l, 0.0)

            Gl = H.shape[0]
            delta = jnp.concatenate(
                [d_l, jnp.broadcast_to(d_s[None], (Gl, n_shared))], axis=1
            )
            p_new = jax.vmap(layout.retract)(p, delta)
            per_new = cost_per(p_new)
            new_cost = lax.psum(jnp.sum(per_new), "groups")

            # gain ratio for the JOINT step: predicted decrease of the
            # (undamped) Gauss-Newton model, summed over groups — each
            # group's quadratic uses its own H/g slice, the shared-tail
            # contributions add up to the joint model exactly
            lin_g = jnp.einsum("gs,gs->g", g, delta)
            quad_g = jnp.einsum("gst,gs,gt->g", H, delta, delta)
            pred_g = -(lin_g + 0.5 * quad_g)
            pred = lax.psum(jnp.sum(pred_g), "groups")
            rho = (cost - new_cost) / jnp.maximum(pred, 1e-30)
            accept = jnp.isfinite(new_cost) & (new_cost < cost) & (pred > 0)

            p = jax.tree.map(lambda a, b: jnp.where(accept, b, a), p, p_new)
            cost_next = jnp.where(accept, new_cost, cost)
            per_next = jnp.where(accept, per_new, per)
            # per-group local damping from each group's OWN gain ratio:
            # a group that worsened raises its lambda even on a global
            # accept; on a global reject, groups that improved keep theirs
            rho_g = (per - per_new) / jnp.maximum(pred_g, 1e-30)
            shrink_g = jnp.maximum(
                1.0 / 3.0, 1.0 - (2.0 * rho_g - 1.0) ** 3
            )
            improved = (
                jnp.isfinite(per_new) & (per_new <= per) & (pred_g > 0)
            )
            lam_l = jnp.where(
                improved & accept,
                lam_l * shrink_g,
                jnp.where(improved, lam_l, lam_l * 4.0),
            )
            lam_l = jnp.clip(lam_l, 1e-12, 1e12)
            # shared lambda: Nielsen schedule on the joint gain ratio
            shrink_s = jnp.maximum(
                1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3
            )
            lam_s = jnp.where(
                accept,
                jnp.clip(lam_s * shrink_s, 1e-12, 1e12),
                jnp.minimum(lam_s * nu_s, 1e12),
            )
            nu_s = jnp.where(
                accept, jnp.asarray(2.0, dtype), jnp.minimum(nu_s * 2.0, 1e6)
            )
            step = jnp.max(jnp.abs(delta))
            step = lax.pmax(step, "groups")
            step_small = step < parameter_tolerance
            cost_flat = accept & (
                (cost - new_cost)
                < function_tolerance * jnp.maximum(cost, 1e-30)
            )
            done = step_small | cost_flat | (lam_s > 1e10)
            return (p, lam_l, lam_s, nu_s, it + 1, done, cost_next, per_next)

        def cond(state):
            _, _, _, _, it, done, _, _ = state
            return (~done) & (it < max_iterations)

        per0 = cost_per(params)
        cost0 = lax.psum(jnp.sum(per0), "groups")
        state0 = (
            params,
            lam_l0,
            lam_s0,
            jnp.asarray(2.0, dtype),
            jnp.asarray(0, jnp.int32),
            ~jnp.isfinite(cost0),
            cost0,
            per0,
        )
        p, lam_l, lam_s, _, iters, _, cost, _ = lax.while_loop(
            cond, body, state0
        )
        return (
            p,
            lm.SolveInfo(
                initial_cost=cost0, final_cost=cost, iterations=iters,
                final_lambda=lam_s,
            ),
            lam_l,
        )

    from jax.sharding import PartitionSpec as P

    gspec = jax.tree.map(lambda _: P("groups"), params)
    bspec = jax.tree.map(lambda _: P("groups"), blocks)
    rep = lm.SolveInfo(
        initial_cost=P(), final_cost=P(), iterations=P(), final_lambda=P()
    )
    # f32 matmul inputs (TPU default is bfloat16) — see lm._solve_impl
    with jax.default_matmul_precision("float32"):
        return shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(gspec, bspec, P("groups"), P("groups"), P()),
            out_specs=(gspec, rep, P("groups")),
        )(params, blocks, free, init_lam_l, init_lam_s)


def solve_group_batch_shared(
    batch: GroupBatch,
    pre_solve: bool,
    max_iterations: int = lm.DEFAULT_MAX_ITERATIONS,
    devices=None,
) -> Tuple[RelaxParams, "lm.SolveInfo"]:
    """Joint solve of a shared-intrinsics batch (built with
    shared_intrinsics=True): groups data-parallel over the device mesh,
    the shared tangent tail coupled exactly via the distributed Schur
    complement.

    For mesh problems the shared tail is [mesh_z, intrinsics] — every
    group carries a copy of the SAME surface, so sharing it recovers the
    global calibration problem; per-group private meshes would let focal
    drift along the focal/height valley (each tiny group's mesh absorbing
    the scale change). For point problems only intrinsics are shared."""
    assert batch.shared_intrinsics, "build the batch with shared_intrinsics"
    devices = list(jax.devices()) if devices is None else list(devices)
    layout = batch.layout
    params, blocks, free = batch.params, batch.blocks, batch.free
    surface_free = batch.surface_free
    G = batch.num_groups

    # share [mesh_z, intrinsics] when the tail is contiguous (no points)
    # and every group's mesh copy is still value-identical
    share_mesh = layout.V > 0 and layout.P == 0
    if share_mesh:
        mz = np.asarray(params.mesh_z)
        share_mesh = bool(np.allclose(mz, mz[0:1], atol=1e-9, equal_nan=True))
    n_local = layout.mesh_off if share_mesh else layout.focal_off

    # block instances living ENTIRELY in the shared tail (mesh priors,
    # radial monotonicity) are duplicated per group copy — scale them by
    # 1/G so the joint objective counts them once
    def _downweight(b):
        all_shared = jnp.all(b.slots >= n_local, axis=-1)
        return dataclasses.replace(
            b, weight=jnp.where(all_shared, b.weight / G, b.weight)
        )

    blocks = tuple(_downweight(b) for b in blocks)

    D = min(len(devices), G)
    pad = (-G) % D
    if pad:
        params = _duplicate_group(params, 0, pad)
        blocks = _duplicate_group(blocks, 0, pad)
        # padded replicas must carry ZERO block weight: unlike the plain
        # batched solve (independent per-lane accept), the shared solve
        # psums costs/normal equations across lanes — a live duplicate
        # would double-count group 0's measurements in the joint problem
        blocks = tuple(
            dataclasses.replace(b, weight=b.weight.at[G:].set(0.0))
            for b in blocks
        )
        frozen = np.zeros((pad, layout.dim), bool)
        free = np.concatenate([np.asarray(free), frozen])
        surface_free = np.concatenate([np.asarray(surface_free), frozen])
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(devices[:D]), ("groups",))
    sh = NamedSharding(mesh, P("groups"))
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, sh), t)
    params, blocks = put(params), put(blocks)
    free, surface_free = put(free), put(surface_free)
    if pre_solve:
        if share_mesh:
            # the pre-solve moves the (shared) surface: solve it jointly
            # so every group's copy stays identical
            params, _, _ = _solve_shared(
                params, blocks, surface_free, layout, mesh,
                max_iterations, n_local=n_local,
            )
        else:
            # surface slots are group-local (points): independent lanes
            params, _ = _solve_batch(
                params, blocks, surface_free,
                jnp.zeros_like(surface_free), layout, False,
                max_iterations,
            )
    # warm-start the main joint solve from the previous REPEAT's exit
    # damping (clamped away from both rails — see solve_group_batch)
    lam_l0, lam_s0 = None, 1.0
    if batch.warm_lambda is not None and batch.warm_lambda[1] is not None:
        wl, ws = batch.warm_lambda
        lam_s0 = np.clip(np.asarray(ws), 1e-6, 1e2)
        if wl is not None:
            wl = np.clip(np.asarray(wl), 1e-6, 1e2)
            if pad:
                wl = np.concatenate([wl, np.ones(pad, wl.dtype)])
            lam_l0 = jax.device_put(
                wl.astype(batch.params.quats.dtype), sh
            )
    solved, info, lam_l = _solve_shared(
        params, blocks, free, layout, mesh, max_iterations, n_local=n_local,
        init_lam_l=lam_l0, init_lam_s=lam_s0,
    )
    if pad:
        solved = jax.tree.map(lambda x: x[:G], solved)
        lam_l = lam_l[:G]
    batch.warm_lambda = (lam_l, info.final_lambda)
    return solved, info


def fetch_solved(solved: RelaxParams) -> RelaxParams:
    """ONE device_get of the whole solved batch. Also uncommits the leaves
    from any multi-device sharding (mixing committed with uncommitted
    arrays downstream, e.g. model-conversion jits, is an error)."""
    return jax.tree.map(np.asarray, jax.device_get(solved))


def extract_group_params(
    batch: GroupBatch, solved: RelaxParams, g: int
) -> RelaxParams:
    """Slice group g's solved parameters back to its own (unpadded) shapes.
    In a shared-intrinsics batch, model slots are global: keep the full
    intrinsics leaves (built.model_index was rewritten to global slots).

    Pass `solved` through fetch_solved first when extracting several
    groups — a per-leaf-per-group device pull costs a synchronizing
    round-trip each through a remote-TPU tunnel."""
    b = batch.builts[g]
    M = batch.layout.M if batch.shared_intrinsics else b.params.M
    pg = jax.tree.map(lambda x: np.asarray(x[g]), solved)
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
