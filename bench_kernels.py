"""Kernel-level microbenchmarks + roofline accounting on the default
(TPU) platform.

For each hot kernel: measured steady-state time, analytic FLOP / byte
counts, achieved FLOP/s and HBM bandwidth, and the fraction of v5e peak
(roofline: 394 TFLOP/s bf16 / ~49 TFLOP/s f32 MXU, ~819 GB/s HBM per
chip). Prints one JSON line per kernel. Usage: python bench_kernels.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

V5E_F32_PEAK = 49e12  # MXU f32 FLOP/s (bf16 ~197e12 with f32 accum x2 packing)
V5E_HBM = 819e9  # bytes/s


def timeit(fn, *args, repeats=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def report(name, seconds, flops, bytes_moved, extra=None):
    rec = dict(
        kernel=name,
        time_ms=round(seconds * 1e3, 3),
        gflops=round(flops / 1e9, 2),
        achieved_tflops=round(flops / seconds / 1e12, 3),
        mxu_fraction=round(flops / seconds / V5E_F32_PEAK, 4),
        achieved_gbps=round(bytes_moved / seconds / 1e9, 1),
        hbm_fraction=round(bytes_moved / seconds / V5E_HBM, 4),
    )
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def bench_extract():
    from opencalibration_tpu.ops import features as F

    B, H, W = 8, 1200, 1600  # the reference's full extraction resolution
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W), np.float32))
    fn = jax.jit(lambda x: F.extract_features(x, max_features=2048))
    t = timeit(fn, imgs, repeats=5)
    # FLOPs: per level 2 separable Toeplitz matmuls (~2*H*W*(kh+kw) per
    # conv-equivalent, but implemented as [H,W]x[W,W] banded matmuls:
    # 2*H*W*W + 2*H*H*W) x ~12 level/derivative passes + descriptor
    # sampling (negligible FLOPs, gather-bound)
    per_level = 2 * H * W * W + 2 * H * H * W
    flops = B * per_level * 12
    bytes_moved = B * H * W * 4 * 12 * 3
    report(
        "feature extraction (8x1200x1600, 2048 kp)", t, flops, bytes_moved,
        dict(images_per_sec=round(B / t, 1)),
    )


def bench_hamming():
    from opencalibration_tpu.ops import hamming as Hm

    rng = np.random.default_rng(1)
    N = 4096
    d1 = jnp.asarray(rng.integers(0, 2**32, (N, 16), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (N, 16), dtype=np.uint32))
    fn = jax.jit(Hm.hamming_matrix)
    t = timeit(fn, d1, d2)
    # +-1 int8 matmul: [N, 512] x [512, N] -> 2*N*N*512 ops
    flops = 2 * N * N * 512
    bytes_moved = 2 * N * 512 + N * N * 4
    report(f"hamming matrix {N}x{N} (486-bit)", t, flops, bytes_moved,
           dict(pairs_per_sec=round(N * N / t / 1e6, 1)))


def bench_ransac():
    from opencalibration_tpu.ops import ransac as R

    rng = np.random.default_rng(2)
    N, Hyp = 1024, 4096
    r1 = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    r2 = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    dist = jnp.asarray(rng.random(N).astype(np.float32))
    valid = jnp.ones(N, bool)
    fn = jax.jit(
        lambda a, b, d, v: R.ransac_homography_with_poses(
            a, b, d, v, num_hypotheses=Hyp
        )
    )
    t = timeit(fn, r1, r2, dist, valid)
    # per hypothesis: 4pt closed-form fit (~2k flops) + N error evals (~60)
    flops = Hyp * (2000 + N * 60)
    bytes_moved = Hyp * N * 4
    report(f"RANSAC homography ({Hyp} hyp x {N} matches)", t, flops, bytes_moved)


def bench_lm():
    from opencalibration_tpu.relax import blocks as B_, lm
    from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout

    C, V, M, NB = 50, 512, 1, 2048
    rng = np.random.default_rng(3)
    DOWN = np.array([0.0, 1, 0, 0], np.float32)
    params = RelaxParams.create(
        jnp.asarray(np.tile(DOWN, (C, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 100, (C, 3)), jnp.float32),
        mesh_z=jnp.zeros(V, jnp.float32),
        focal=jnp.asarray([400.0], jnp.float32),
        principal=jnp.asarray([[800.0, 600.0]], jnp.float32),
        dtype=jnp.float32,
    )
    layout = TangentLayout(C, V, 0, M)
    blk = B_.plane_ray_block(
        layout,
        jnp.asarray(rng.integers(0, V, (NB, 3)), jnp.int32),
        jnp.asarray(rng.uniform(0, 100, (NB, 3, 2)), jnp.float32),
        jnp.asarray(rng.integers(0, C, (NB, 5)), jnp.int32),
        jnp.asarray(rng.random((NB, 5)) < 0.6),
        jnp.ones(NB, jnp.float32),
        fixed_dir=jnp.asarray(rng.normal(size=(NB, 5, 3)).astype(np.float32)),
    )
    down = B_.downwards_prior_block(
        layout, jnp.arange(C, dtype=jnp.int32), jnp.ones(C, jnp.float32)
    )
    free = layout.build_free_mask()
    n_iter = 30

    def run(p):
        solved, info = lm.solve(
            p, (blk, down), layout, free, max_iterations=n_iter,
            function_tolerance=0.0, parameter_tolerance=0.0,
        )
        return solved.quats, info.iterations

    fn = jax.jit(run)
    t = timeit(fn, params, repeats=3)
    T = layout.dim
    L = 24
    R_ = 15
    # per iteration: residual+jacfwd (~NB*L*R*40) + JtJ (NB*R*L*L*2)
    # + dense solve (2/3 T^3)
    per_iter = NB * L * R_ * 40 + NB * 2 * R_ * L * L + (2 / 3) * T**3
    flops = per_iter * n_iter
    bytes_moved = n_iter * (NB * (R_ * L) * 4 + T * T * 4)
    report(
        f"LM bundle adjust (C={C} V={V} blocks={NB}, {n_iter} iters)", t,
        flops, bytes_moved,
        dict(lm_iters_per_sec=round(n_iter / t, 1)),
    )


def main():
    for b in (bench_extract, bench_hamming, bench_ransac, bench_lm):
        b()


if __name__ == "__main__":
    main()
