"""Masked Levenberg-Marquardt solver over dense normal equations.

The TPU-native replacement for Ceres' trust-region solve
(reference src/relax/relax_problem.cpp:1390-1420, options at :29-37:
SPARSE_NORMAL_CHOLESKY, max 100 iterations, initial trust region 1).

Shape discipline: residual blocks are vmapped per-instance functions with
*local* jacobians (jacfwd at delta = 0); each instance scatter-adds its
L x L normal-equation contribution into a dense [T, T] system, which one
Cholesky factorization solves per LM iteration. For the reference's group
sizes (<= ~150 cameras + mesh, T on the order of 1e3) a dense solve on the
MXU beats sparse bookkeeping by a wide margin; the multi-chip path shards
*groups*, not the factorization.

Robust losses use the standard IRLS approximation: residual and jacobian
scaled by sqrt(rho'(s)), cost accumulated with the true rho — matching
Ceres' Huber behavior to first order.

Ceres-failure semantics: a residual block evaluating to NaN makes the
candidate cost NaN, which the accept test rejects (as Ceres rejects steps
whose cost functions fail).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp

from opencalibration_tpu.relax.blocks import BlockSpec
from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout

DEFAULT_MAX_ITERATIONS = 100  # reference relax_problem.cpp:32


def _huber_rho_and_weight(s, delta):
    """Ceres HuberLoss: rho(s) = s for s <= d^2 else 2 d sqrt(s) - d^2;
    weight rho'(s) = min(1, d / sqrt(s))."""
    if delta is None:
        return s, jnp.ones_like(s)
    d2 = delta * delta
    sqrt_s = jnp.sqrt(jnp.maximum(s, 1e-30))
    rho = jnp.where(s <= d2, s, 2.0 * delta * sqrt_s - d2)
    w = jnp.where(s <= d2, 1.0, delta / sqrt_s)
    return rho, w


def _block_values(params: RelaxParams, blk: BlockSpec):
    """Residuals at delta=0 for every instance: [B, R]."""
    L = blk.slots.shape[1]
    dtype = params.quats.dtype

    def one(data_slice):
        return blk.resid_one(jnp.zeros(L, dtype), data_slice, params)

    return jax.vmap(one)(blk.data)


def block_cost(params: RelaxParams, blk: BlockSpec):
    r = _block_values(params, blk)
    s = jnp.sum(r * r, axis=-1)
    rho, _ = _huber_rho_and_weight(s, blk.huber_delta)
    w = blk.weight
    # NaN residual on an active instance poisons the cost (Ceres-failure)
    rho = jnp.where(w > 0, rho, 0.0)
    return 0.5 * jnp.sum(rho * w)


def total_cost(params: RelaxParams, blocks: Sequence[BlockSpec]):
    return sum(block_cost(params, b) for b in blocks)


# instances per one-hot assembly chunk: bounds the [chunk, L, T] one-hot
# buffer (~chunk*24*T*4 bytes) while keeping the matmuls MXU-sized
_ASSEMBLE_CHUNK = 2048


def _accumulate_hg(H, g, JtJ, Jtr, slots):
    """Accumulate per-instance L x L normal-equation contributions into
    the dense [T, T] system via one-hot matmuls on the MXU.

    The obvious scatter-add (`H.at[slots, slots].add`) lowers erratically
    on TPU — compile time swings 2s..34s with block count and the kernel
    runs 20-30x slower than the einsum at 16k+ instances — so the
    assembly is expressed as H += O^T (w JtJ) O with O the [B, L, T]
    slot one-hot, chunked over instances to bound the one-hot buffer."""
    T = H.shape[0]
    B, L = slots.shape
    chunk = _ASSEMBLE_CHUNK

    def chunk_hg(jt, jr, sl):
        O = jax.nn.one_hot(sl, T, dtype=jt.dtype)
        dH = jnp.einsum("blm,blt,bms->ts", jt, O, O)
        dg = jnp.einsum("bl,blt->t", jr, O)
        return dH, dg

    if B <= chunk:
        dH, dg = chunk_hg(JtJ, Jtr, slots)
        return H + dH, g + dg
    pad = (-B) % chunk
    if pad:  # zero-weight padding rows contribute nothing
        JtJ = jnp.concatenate([JtJ, jnp.zeros((pad, L, L), JtJ.dtype)])
        Jtr = jnp.concatenate([Jtr, jnp.zeros((pad, L), Jtr.dtype)])
        slots = jnp.concatenate([slots, jnp.zeros((pad, L), slots.dtype)])
    n = (B + pad) // chunk
    JtJc = JtJ.reshape(n, chunk, L, L)
    Jtrc = Jtr.reshape(n, chunk, L)
    slotsc = slots.reshape(n, chunk, L)

    def add_chunk(carry, xs):
        Hc, gc = carry
        dH, dg = chunk_hg(*xs)
        return (Hc + dH, gc + dg), None

    # seed the carry with the FIRST chunk's contribution (not replicated
    # zeros): under shard_map the data is varying over the mesh axis while
    # fresh zeros are not, and jax's vma check rejects a scan whose carry
    # gains varying-ness mid-body (seen at >2048-instance blocks inside
    # solve_group_batch_shared)
    carry0 = chunk_hg(JtJc[0], Jtrc[0], slotsc[0])
    (dH, dg), _ = jax.lax.scan(
        add_chunk, carry0, (JtJc[1:], Jtrc[1:], slotsc[1:])
    )
    return H + dH, g + dg


def _block_quadratics(params: RelaxParams, blk: BlockSpec, free_mask):
    """Per-instance Gauss-Newton quadratics for one block family:
    (JtJ_w [B, L, L], Jtr_w [B, L]) — robust-weighted, free-mask-column
    masked, non-finite instances zeroed."""
    L = blk.slots.shape[1]
    dtype = params.quats.dtype

    def one(data_slice):
        f = lambda d: blk.resid_one(d, data_slice, params)
        z = jnp.zeros(L, dtype)
        return f(z), jax.jacfwd(f)(z)

    r, J = jax.vmap(one)(blk.data)  # [B, R], [B, R, L]
    s = jnp.sum(r * r, axis=-1)
    _, w_rob = _huber_rho_and_weight(s, blk.huber_delta)
    w = blk.weight * w_rob
    # guard non-finite instances out of the normal equations
    finite = jnp.all(jnp.isfinite(r), axis=-1) & jnp.all(
        jnp.isfinite(J), axis=(-2, -1)
    )
    w = jnp.where(finite, w, 0.0)
    r = jnp.where(finite[:, None], r, 0.0)
    J = jnp.where(finite[:, None, None], J, 0.0)

    col_mask = free_mask[blk.slots].astype(dtype)  # [B, L]
    Jm = J * col_mask[:, None, :]
    JtJ = jnp.einsum("brl,brm->blm", Jm, Jm) * w[:, None, None]
    Jtr = jnp.einsum("brl,br->bl", Jm, r) * w[:, None]
    return JtJ, Jtr


def _block_hg(params: RelaxParams, blk: BlockSpec, H, g, free_mask):
    JtJ, Jtr = _block_quadratics(params, blk, free_mask)
    return _accumulate_hg(H, g, JtJ, Jtr, blk.slots)


def normal_equations(params: RelaxParams, blocks: Sequence[BlockSpec], layout, free_mask):
    dtype = params.quats.dtype
    T = layout.dim
    H = jnp.zeros((T, T), dtype)
    g = jnp.zeros((T,), dtype)
    for blk in blocks:
        H, g = _block_hg(params, blk, H, g, free_mask)
    return H, g


# ---------------------------------------------------------------------------
# Matrix-free normal-equation operator (the ITERATIVE/CGNR-scale path).
#
# The dense path's one-hot assembly costs O(B*L*T^2) per LM iteration and
# the factorization O(T^3); both explode with mesh vertex count (global
# ground-mesh relax at 1k images: T ~ 4-5k). The structure slots are not
# block-diagonal (triangle costs couple 3 vertices, smoothness priors
# couple neighbours), so a Ceres-SPARSE_SCHUR split
# (reference src/relax/relax_problem.cpp:122-145) degenerates to another
# dense factorization here. The scalable TPU-native equivalent is Ceres'
# other large-scale solver family (ITERATIVE_SCHUR / CGNR): keep the
# Gauss-Newton quadratics in per-instance block form and run a
# Jacobi-preconditioned conjugate-gradient solve whose matvec is
# gather -> [L,L] einsum -> sorted segment-sum scatter: O(B*L^2) per CG
# iteration, independent of T^2, at any mesh size.
# ---------------------------------------------------------------------------


def _quads_all(params, blocks, free):
    """Quadratics for every family + exact diag(H) + gradient g [T]."""
    quads = [_block_quadratics(params, b, free) for b in blocks]
    return quads


def _flat_slot_order(blocks, T):
    """Sort order over the concatenated flattened slot lists of all block
    families (slots are solve-constant, so this is computed once per
    solve and reused by every scatter)."""
    flat = jnp.concatenate([b.slots.reshape(-1) for b in blocks])
    perm = jnp.argsort(flat)
    return perm, flat[perm]


def _scatter_sorted(parts, perm, sorted_ids, T):
    """Sum a list of per-family [B, L] contributions into a [T] vector via
    the precomputed sorted order (sorted segment-sum lowers to an
    efficient segmented reduction on TPU, unlike random scatter-add)."""
    flat = jnp.concatenate([p.reshape(-1) for p in parts])[perm]
    return jax.ops.segment_sum(
        flat, sorted_ids, num_segments=T, indices_are_sorted=True
    )


def _gn_matvec(v, quads, blocks, perm, sorted_ids, T):
    """H @ v with H = sum_b O_b^T JtJ_b O_b, never materializing H."""
    parts = [
        jnp.einsum("blm,bm->bl", JtJ, v[blk.slots])
        for (JtJ, _), blk in zip(quads, blocks)
    ]
    return _scatter_sorted(parts, perm, sorted_ids, T)


def _gn_diag(quads, blocks, perm, sorted_ids, T):
    """Exact diag(H): within-instance duplicate slots (padded rays
    aliasing a live slot carry zero jacobian columns, but exactness is
    cheap) fold their cross terms into the diagonal, matching
    jnp.diag(one-hot-assembled H)."""
    parts = []
    for (JtJ, _), blk in zip(quads, blocks):
        eq = (blk.slots[:, :, None] == blk.slots[:, None, :]).astype(JtJ.dtype)
        parts.append(jnp.sum(JtJ * eq, axis=-1))
    return _scatter_sorted(parts, perm, sorted_ids, T)


def _gn_grad(quads, blocks, perm, sorted_ids, T):
    parts = [Jtr for (_, Jtr) in quads]
    return _scatter_sorted(parts, perm, sorted_ids, T)


# ---------------------------------------------------------------------------
# Block-Jacobi preconditioner (Ceres SCHUR_JACOBI analogue).
#
# Measured round 4 (BENCH_NOTES.md "CG preconditioner A/B"): on the
# CG-routed workload (global ground-mesh relax, T=4608) block-Jacobi does
# NOT reduce iteration counts vs scalar Jacobi (50 -> 50 at lam=1e-3,
# 100-cap -> 100-cap at lam=1e-6) — the conditioning bottleneck is the
# long-range camera<->mesh coupling, which no block-diagonal
# preconditioner addresses (a multigrid/hierarchical scheme would).
# Kept as a tested opt-in (OC_TPU_CG_PRECOND=block) for point-heavy
# problem classes where SCHUR_JACOBI classically wins; the default stays
# scalar Jacobi.
# The block preconditioner inverts, once per LM iteration,
#   * one 3x3 block per camera rotation,
#   * one 3x3 block per 3d point,
#   * one dense block over the whole intrinsics tail (8M slots),
#   * scalar diagonal for mesh-z (its off-diagonal coupling is the weak
#     smoothness prior),
# exactly as assembled in H (duplicate-slot folding matches _gn_diag).
# Build cost is one O(B*L^2) chunked segment-sum — about one extra matvec.
# ---------------------------------------------------------------------------

_BJ_CHUNK = 4096  # instances per [chunk, L, L] pair-segment buffer


def _bj_pair_segments(s, layout, TT):
    """Segment id [B, L, L] mapping slot pairs (l, m) into the block-
    diagonal accumulator; off-block pairs map to segment S (dropped).
    Segment space: [C*9 rot | P*9 points | TT*TT intrinsics tail]."""
    C, P = layout.C, layout.P
    S_rot, S_pt = 9 * C, 9 * P
    S = S_rot + S_pt + TT * TT
    rot = s < 3 * C
    pt = (s >= layout.point_off) & (s < layout.focal_off)
    tail = s >= layout.focal_off
    bid = s // 3
    pid = (s - layout.point_off) // 3
    sub_r = s % 3
    sub_p = (s - layout.point_off) % 3
    t = s - layout.focal_off

    def p2(a):  # pair-broadcast helpers over the trailing slot axis
        return a[..., :, None], a[..., None, :]

    rot_l, rot_m = p2(rot)
    pt_l, pt_m = p2(pt)
    tail_l, tail_m = p2(tail)
    bid_l, bid_m = p2(bid)
    pid_l, pid_m = p2(pid)
    sr_l, sr_m = p2(sub_r)
    sp_l, sp_m = p2(sub_p)
    t_l, t_m = p2(t)

    seg = jnp.full(s.shape[:-1] + (s.shape[-1], s.shape[-1]), S, jnp.int32)
    seg = jnp.where(
        rot_l & rot_m & (bid_l == bid_m), bid_l * 9 + sr_l * 3 + sr_m, seg
    )
    seg = jnp.where(
        pt_l & pt_m & (pid_l == pid_m), S_rot + pid_l * 9 + sp_l * 3 + sp_m, seg
    )
    seg = jnp.where(tail_l & tail_m, S_rot + S_pt + t_l * TT + t_m, seg)
    return seg


def _bj_block_sums(quads, blocks, layout, TT):
    """Accumulate the block-diagonal entries of H into a flat [S] vector
    (chunked over instances to bound the [chunk, L, L] buffers)."""
    C, P = layout.C, layout.P
    S = 9 * C + 9 * P + TT * TT
    dtype = quads[0][0].dtype
    acc = jnp.zeros((S,), dtype)
    for (JtJ, _), blk in zip(quads, blocks):
        seg_all = _bj_pair_segments(blk.slots, layout, TT)  # [B, L, L]
        B = JtJ.shape[0]
        L = JtJ.shape[1]
        chunk = _BJ_CHUNK

        def chunk_sum(vals, seg):
            return jax.ops.segment_sum(
                vals.reshape(-1), seg.reshape(-1), num_segments=S + 1
            )[:S]

        if B <= chunk:
            acc = acc + chunk_sum(JtJ, seg_all)
            continue
        pad = (-B) % chunk
        if pad:
            JtJ = jnp.concatenate([JtJ, jnp.zeros((pad, L, L), dtype)])
            seg_all = jnp.concatenate(
                [seg_all, jnp.full((pad, L, L), S, jnp.int32)]
            )
        n = (B + pad) // chunk
        JtJc = JtJ.reshape(n, chunk, L, L)
        segc = seg_all.reshape(n, chunk, L, L)

        def add_chunk(carry, xs):
            v, sg = xs
            return carry + chunk_sum(v, sg), None

        carry0 = chunk_sum(JtJc[0], segc[0])
        fam, _ = jax.lax.scan(add_chunk, carry0, (JtJc[1:], segc[1:]))
        acc = acc + fam
    return acc


def _bj_build(quads, blocks, layout, damp, diag):
    """Build the factorized block-Jacobi preconditioner; returns an apply
    callable z = M^-1 r. `damp` and `diag` are the [T] damping and exact
    diag(H) already computed for the CG outer loop."""
    C, V, P, M = layout.C, layout.V, layout.P, layout.M
    TT = layout.dim - layout.focal_off  # whole intrinsics tail (8M slots)
    sums = _bj_block_sums(quads, blocks, layout, TT)
    dtype = sums.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    def inv_blocks3(flat, d):  # [n*9] + damp [n, 3] -> [n, 3, 3] inverses
        n = d.shape[0]
        Bm = flat.reshape(n, 3, 3) + jax.vmap(jnp.diag)(d) + 1e-10 * eye3
        return jnp.linalg.inv(Bm)

    inv_rot = inv_blocks3(sums[: 9 * C], damp[: 3 * C].reshape(C, 3))
    pre_mesh = jnp.clip(
        (diag + damp)[layout.mesh_off : layout.point_off], 1e-20, 1e32
    )
    if P:
        inv_pt = inv_blocks3(
            sums[9 * C : 9 * C + 9 * P],
            damp[layout.point_off : layout.focal_off].reshape(P, 3),
        )
    tail = sums[9 * C + 9 * P :].reshape(TT, TT)
    tail = tail + jnp.diag(damp[layout.focal_off :]) + 1e-10 * jnp.eye(
        TT, dtype=dtype
    )
    # symmetric Jacobi scaling before the f32 inversion (same rationale as
    # _jacobi_solve): the intrinsics tail mixes focal (~1e2..1e3 px) and
    # distortion (~1e-1) units, and the raw block can be poorly enough
    # conditioned that a plain f32 inv loses the preconditioner's benefit
    s_tail = jax.lax.rsqrt(jnp.clip(jnp.diag(tail), 1e-24, 1e32))
    inv_tail = (
        s_tail[:, None]
        * jnp.linalg.inv(tail * s_tail[:, None] * s_tail[None, :])
        * s_tail[None, :]
    )

    def apply(r):
        zr = jnp.einsum(
            "cij,cj->ci", inv_rot, r[: 3 * C].reshape(C, 3)
        ).reshape(-1)
        zm = r[layout.mesh_off : layout.point_off] / pre_mesh
        parts = [zr, zm]
        if P:
            parts.append(
                jnp.einsum(
                    "cij,cj->ci",
                    inv_pt,
                    r[layout.point_off : layout.focal_off].reshape(P, 3),
                ).reshape(-1)
            )
        parts.append(inv_tail @ r[layout.focal_off :])
        return jnp.concatenate(parts)

    return apply


def _pcg(matvec, b, pre_apply, rtol, max_iters):
    """Preconditioned CG from x0 = 0 (pre_apply: r -> M^-1 r).
    Returns (x, r_final)."""
    dtype = b.dtype
    tol2 = (rtol * rtol) * jnp.maximum(jnp.sum(b * b), 1e-38)
    z0 = pre_apply(b)
    state0 = (
        jnp.zeros_like(b),  # x
        b,  # r
        z0,  # p
        jnp.sum(b * z0),  # rz
        jnp.asarray(0, jnp.int32),
        jnp.sum(b * b) <= 0.0,  # done (zero rhs)
    )

    def cond(s):
        x, r, p, rz, k, done = s
        return (~done) & (k < max_iters) & (jnp.sum(r * r) > tol2)

    def body(s):
        x, r, p, rz, k, done = s
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        ok = (pAp > 0) & jnp.isfinite(pAp)
        alpha = jnp.where(ok, rz / jnp.maximum(pAp, 1e-38), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = pre_apply(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-38), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new, k + 1, done | ~ok)

    x, r, _, _, _, _ = jax.lax.while_loop(cond, body, state0)
    return x, r


def _jacobi_solve(A, b):
    """Solve A x = b with symmetric Jacobi preconditioning:
    (S A S)(S^-1 x) = S b, S = diag(A)^-1/2. Algebraically identical, but
    the scaled system is well-conditioned enough for f32 factorization
    when tangent slots mix rotation (~1), mesh-z (~1e1 m) and focal
    (~1e2..1e3 px) units."""
    s = jax.lax.rsqrt(jnp.clip(jnp.diag(A), 1e-24, 1e32))
    As = A * s[:, None] * s[None, :]
    return s * jnp.linalg.solve(As, s * b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveInfo:
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray
    # trust-region damping at exit: feed back as init_lambda on the next
    # REPEAT solve of the same (moved-values) problem to skip the lambda
    # re-shrink phase (the reference gets this implicitly from Ceres'
    # per-Problem trust region state persisting across Solve calls)
    final_lambda: jnp.ndarray


# dense [T, T] assembly + factorization above this tangent dimension is
# slower than the matrix-free PCG path (assembly is O(B*L*T^2)); measured
# crossover on v5e/CPU sits near 1k — below it the dense Cholesky's exact
# steps win on LM iteration count
CG_DIM_THRESHOLD = 1024
CG_RTOL = 1e-2  # forcing tolerance (Ceres ITERATIVE_SCHUR eta default 0.1)
CG_MAX_ITERS = 100
# 'jacobi' (scalar, default — see the block-Jacobi note above for the
# measured A/B) or 'block' (SCHUR_JACOBI-style _bj_build)
CG_PRECOND = os.environ.get("OC_TPU_CG_PRECOND", "jacobi")


@functools.partial(
    jax.jit,
    static_argnames=(
        "layout", "max_iterations",
        "parameter_tolerance", "function_tolerance", "linear_solver",
        "cg_precond",
    ),
)
def solve(
    params: RelaxParams,
    blocks: Sequence[BlockSpec],
    layout: TangentLayout,
    free_mask,
    max_iterations: int = DEFAULT_MAX_ITERATIONS,
    init_lambda=1.0,
    parameter_tolerance: float = 1e-8,
    function_tolerance: float = 1e-6,
    linear_solver: str = "auto",
    cg_precond: str | None = None,
):
    """Run LM to convergence (data-dependent iteration count via
    lax.while_loop). Jitted: compilations are cached per (layout, block
    shapes) — builders pad block counts to buckets so repeated pipeline
    iterations reuse the compiled solver. ``init_lambda`` is a DYNAMIC
    argument (warm-started values don't recompile). ``linear_solver``:
    'cholesky' (dense normal equations), 'cg' (matrix-free Jacobi-PCG,
    scales past dense assembly), or 'auto' (by layout.dim). Returns
    (params, SolveInfo). `blocks` must be a tuple (hashable pytree
    structure)."""
    if linear_solver == "auto":
        linear_solver = (
            "cg" if layout.dim >= CG_DIM_THRESHOLD else "cholesky"
        )
    # NOTE: cg_precond=None callers inherit the env default at first-trace
    # time (cache-keyed on None); pass it explicitly to override per-call.
    if cg_precond is None:
        cg_precond = CG_PRECOND
    with jax.default_matmul_precision("float32"):
        return _solve_impl(
            params, blocks, layout, free_mask, max_iterations, init_lambda,
            parameter_tolerance, function_tolerance, linear_solver,
            cg_precond,
        )


def _solve_impl(
    params, blocks, layout, free_mask, max_iterations, init_lambda,
    parameter_tolerance, function_tolerance, linear_solver="cholesky",
    cg_precond="jacobi",
):
    # NOTE on TPU numerics: the caller wraps this trace in
    # default_matmul_precision("float32") — TPU matmuls/einsums otherwise
    # run with bfloat16 inputs, which destroys the normal equations
    # (measured: intrinsics calibration stalls at its prior in f32 while
    # the identical CPU x64 run converges). The linear solves are Jacobi-
    # scaled for the same reason: f32 Cholesky on raw H mixes rotation
    # (~1) and focal (~1e2..1e3 px) scales.
    blocks = tuple(blocks)
    dtype = params.quats.dtype
    free = jnp.asarray(free_mask)
    T = layout.dim

    cost0 = total_cost(params, blocks)

    def cond(state):
        _, _, _, it, done, _ = state
        return (~done) & (it < max_iterations)

    frozen = ~free
    if linear_solver == "cg":
        perm_so = _flat_slot_order(blocks, T)

    def body(state):
        p, lam, nu, it, done, cost = state
        if linear_solver == "cg":
            perm, sorted_ids = perm_so
            quads = _quads_all(p, blocks, free)
            g = _gn_grad(quads, blocks, perm, sorted_ids, T)
            diag = jnp.clip(
                _gn_diag(quads, blocks, perm, sorted_ids, T), 1e-10, 1e32
            )
            # A = H + lam diag(H) + I_frozen, applied matrix-free
            damp = lam * diag + frozen.astype(dtype)

            def matvec(v):
                return (
                    _gn_matvec(v, quads, blocks, perm, sorted_ids, T)
                    + damp * v
                )

            if cg_precond == "block":
                pre_apply = _bj_build(quads, blocks, layout, damp, diag)
            else:
                pre_diag = diag + damp
                pre_apply = lambda r: r / pre_diag  # noqa: E731
            delta, r_cg = _pcg(matvec, -g, pre_apply, CG_RTOL, CG_MAX_ITERS)
            delta = jnp.where(free, delta, 0.0)
            # inexact step: model decrease from the CG residual
            # (A delta = -g - r  =>  pred = 0.5 (delta.r - delta.g))
            pred = 0.5 * (jnp.sum(delta * r_cg) - jnp.sum(delta * g))
        else:
            H, g = normal_equations(p, blocks, layout, free)
            diag = jnp.clip(jnp.diag(H), 1e-10, 1e32)
            # frozen slots: unit diagonal keeps the system SPD, zero
            # gradient
            A = H + lam * jnp.diag(diag)
            A = A + jnp.diag(frozen.astype(dtype))
            delta = -_jacobi_solve(A, g)
            delta = jnp.where(free, delta, 0.0)
            # gain ratio (Nielsen/Ceres trust region): actual cost
            # decrease over the decrease the damped quadratic model
            # predicted —
            # (H + lam D) delta = -g  =>  pred = 0.5 delta^T (lam D delta - g)
            pred = 0.5 * jnp.sum(delta * (lam * diag * delta - g))

        p_new = layout.retract(p, delta)
        new_cost = total_cost(p_new, blocks)
        rho = (cost - new_cost) / jnp.maximum(pred, 1e-30)
        accept = jnp.isfinite(new_cost) & (new_cost < cost) & (pred > 0)

        p = jax.tree.map(lambda a, b: jnp.where(accept, b, a), p, p_new)
        cost_next = jnp.where(accept, new_cost, cost)
        # Nielsen's schedule: a near-perfect model (rho ~ 1) slashes
        # lambda (up to /3 per step compounding via the cubic), a poor one
        # barely relaxes it; consecutive rejects escalate geometrically.
        # Replaces the fixed /3 x4 schedule — measured ~2x fewer
        # iterations on the calibration problems at identical pose error.
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(
            accept,
            jnp.clip(lam * shrink, 1e-12, 1e12),
            jnp.minimum(lam * nu, 1e12),
        )
        nu = jnp.where(accept, jnp.asarray(2.0, dtype), jnp.minimum(nu * 2.0, 1e6))

        step_small = jnp.max(jnp.abs(delta)) < parameter_tolerance
        cost_flat = accept & (
            (cost - new_cost) < function_tolerance * jnp.maximum(cost, 1e-30)
        )
        lam_stuck = lam > 1e10
        done = step_small | cost_flat | lam_stuck
        return (p, lam, nu, it + 1, done, cost_next)

    state0 = (
        params,
        jnp.asarray(init_lambda, dtype),
        jnp.asarray(2.0, dtype),
        jnp.asarray(0, jnp.int32),
        ~jnp.isfinite(cost0),
        cost0,
    )
    p, lam, _, iters, _, cost = jax.lax.while_loop(cond, body, state0)
    return p, SolveInfo(
        initial_cost=cost0, final_cost=cost, iterations=iters, final_lambda=lam
    )
