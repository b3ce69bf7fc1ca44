"""LM linear-solver scaling A/B: dense Cholesky vs matrix-free Jacobi-PCG.

Synthetic ground-mesh bundle-adjustment problems at growing tangent
dimension T = 3C + V + intrinsics (the global ground-mesh relax shape;
reference solves these with Ceres SPARSE_SCHUR / ITERATIVE_SCHUR,
src/relax/relax_problem.cpp:122-145). Records ms per LM iteration for
each backend; justifies lm.CG_DIM_THRESHOLD.

Usage:
  BENCH_PLAT=cpu python bench_lm_solvers.py [C,Vgrid,NB ...]
  BENCH_SOLVERS=cg python bench_lm_solvers.py 1000,4096,32768
"""

import os, sys, time
import jax
jax.config.update("jax_platforms", os.environ.get("BENCH_PLAT", "cpu"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax.numpy as jnp
from opencalibration_tpu.relax import blocks as B
from opencalibration_tpu.relax import lm
from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout


def make_big_mesh_problem(C, Vg, NB, seed=0):
    """Synthetic ground-mesh problem: C cameras over a sqrt(Vg) grid,
    NB plane-ray track blocks, + anchors + downward priors."""
    rng = np.random.default_rng(seed)
    side = int(np.sqrt(Vg))
    V = side * side
    layout = TangentLayout(C, V, 0, 1)
    quats = np.tile(np.array([0.0, 1.0, 0.0, 0.0]), (C, 1))
    quats += rng.normal(0, 0.01, size=(C, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    positions = np.stack([
        rng.uniform(0, side * 10.0, C), rng.uniform(0, side * 10.0, C),
        np.full(C, 30.0)
    ], 1)
    params = RelaxParams(
        quats=jnp.asarray(quats, jnp.float32),
        positions=jnp.asarray(positions, jnp.float32),
        mesh_z=jnp.zeros(V, jnp.float32),
        points=jnp.zeros((0, 3), jnp.float32),
        focal=jnp.full((1,), 600.0, jnp.float32),
        principal=jnp.asarray([[400.0, 300.0]], jnp.float32),
        radial=jnp.zeros((1, 3), jnp.float32),
        tangential=jnp.zeros((1, 2), jnp.float32),
    )
    # random triangles on the grid
    r = rng.integers(0, side - 1, NB)
    c = rng.integers(0, side - 1, NB)
    i00 = r * side + c
    vert_idx = np.stack([i00, i00 + 1, i00 + side], 1).astype(np.int32)
    xy = np.stack([
        np.stack([c * 10.0, r * 10.0], 1),
        np.stack([(c + 1) * 10.0, r * 10.0], 1),
        np.stack([c * 10.0, (r + 1) * 10.0], 1),
    ], 1)
    cam_idx = rng.integers(0, C, (NB, 5)).astype(np.int32)
    ray_valid = np.zeros((NB, 5), bool)
    ray_valid[:, :3] = True
    pixel = np.array([400.0, 300.0]) + rng.normal(0, 60.0, (NB, 5, 2))
    blk = B.plane_ray_block(
        layout, jnp.asarray(vert_idx), jnp.asarray(xy, jnp.float32),
        jnp.asarray(cam_idx), jnp.asarray(ray_valid),
        jnp.ones(NB, jnp.float32), model_i=jnp.zeros(NB, jnp.int32),
        pixel=jnp.asarray(pixel, jnp.float32),
    )
    anchor = B.mesh_anchor_block(
        layout, jnp.arange(V, dtype=jnp.int32), jnp.zeros(V, jnp.float32),
        jnp.ones(V, jnp.float32),
    )
    down = B.downwards_prior_block(
        layout, jnp.arange(C, dtype=jnp.int32), jnp.ones(C, jnp.float32)
    )
    free = layout.build_free_mask(mesh_free=True, focal_free=True)
    return params, (blk, anchor, down), layout, free


def bench(C, Vg, NB, iters=10, solvers=("cholesky", "cg")):
    params, blocks, layout, free = make_big_mesh_problem(C, Vg, NB)
    print(f"C={C} V={layout.V} NB={NB} T={layout.dim}", flush=True)
    for s in solvers:
        try:
            t0 = time.perf_counter()
            out, info = lm.solve(
                params, blocks, layout, free, max_iterations=iters,
                linear_solver=s,
            )
            jax.block_until_ready(out.mesh_z)
            t_cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            out, info = lm.solve(
                params, blocks, layout, free, max_iterations=iters,
                linear_solver=s, init_lambda=0.9999,
            )
            jax.block_until_ready(out.mesh_z)
            t = time.perf_counter() - t0
            it = int(np.asarray(info.iterations))
            print(
                f"  {s:9s}: warm {t:7.2f}s ({t/max(it,1)*1e3:8.1f} ms/it,"
                f" {it} its) cold {t_cold:.2f}s cost->"
                f"{float(np.asarray(info.final_cost)):.4f}", flush=True,
            )
        except Exception as e:
            print(f"  {s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    cfgs = sys.argv[1:] or ["150,400,4096", "512,1024,8192", "1000,1600,16384"]
    solvers = tuple(
        os.environ.get("BENCH_SOLVERS", "cholesky,cg").split(",")
    )
    for cfg in cfgs:
        C, Vg, NB = map(int, cfg.split(","))
        bench(C, Vg, NB, solvers=solvers)
