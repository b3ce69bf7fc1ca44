"""Stage-level profile of extract_features on the default device.

Times, steady-state (post-compile): the decimated-octave blur pyramid,
hessian responses, NMS+topk+subpixel candidate selection, describe(),
and the full fused extract_features — to locate the extraction
bottleneck (VERDICT r4: extraction 779 ms / 8 images = 2.7% MXU).

Usage: python bench_extract_profile.py [batch]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops import features as F

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H, W = 1200, 1600


def timeit(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def main():
    rng = np.random.default_rng(0)
    # upload PER IMAGE as uint8 (~1.9 MB each) and stack on device: one
    # >=64 MB device_put through the tunneled link can hang forever (the
    # bulk-transfer collapse mode, .claude/skills/verify/SKILL.md), and
    # the pipeline itself ships uint8
    host = (rng.random((B, H, W)) * 255).astype(np.uint8)
    print("uploading", flush=True)
    parts = [jax.device_put(host[i]) for i in range(B)]
    imgs = jnp.stack(parts).astype(jnp.float32) / 255.0
    imgs.block_until_ready()
    print("uploaded", flush=True)

    # full fused path
    print("compiling extract_features", flush=True)
    t_full = timeit(
        lambda x: F.extract_features(x, max_features=2048), imgs
    )
    print("full done", t_full, flush=True)

    # detect only
    t_detect = timeit(lambda x: F.detect(x, max_features=2048), imgs)
    print("detect done", t_detect, flush=True)

    # describe only (fixed detections)
    det = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)),
        F.detect(imgs, max_features=2048),
    )
    t_describe = timeit(
        jax.jit(lambda x, d: F.describe(x, d)), imgs, det
    )

    # pyramid blurs only (all octaves, no hessian/NMS)
    import math

    @jax.jit
    def pyramid_only(images):
        base = F._blur(images, F.BASE_SIGMA)
        outs = []
        for o in range(F.NUM_OCTAVES):
            cur = base
            cur_rel = F.BASE_SIGMA
            for s in range(F.SUBLEVELS):
                rel = F.BASE_SIGMA * (2.0 ** (s / F.SUBLEVELS))
                if rel > cur_rel:
                    cur = F._blur(cur, math.sqrt(rel * rel - cur_rel**2))
                    cur_rel = rel
            outs.append(cur.sum())
            nxt = F._blur(cur, math.sqrt((2 * F.BASE_SIGMA) ** 2 - cur_rel**2))
            base = nxt[:, ::2, ::2]
        return jnp.stack(outs)

    t_pyr = timeit(pyramid_only, imgs)

    # hessian responses on one full-res 4-level stack (octave-0 cost)
    L0 = jnp.stack([imgs] * F.SUBLEVELS)
    sig = jnp.asarray([1.6, 1.9, 2.26, 2.69], jnp.float32)
    t_hess = timeit(
        jax.jit(lambda L, s: F.hessian_response(L, s)), L0, sig
    )

    # NMS + topk + subpixel on octave-0-sized responses
    Rb = jnp.transpose(F.hessian_response(L0, sig), (1, 0, 2, 3))
    Rb = jax.device_put(np.asarray(Rb))
    t_cand = timeit(
        jax.jit(
            lambda r: F._candidates_from_levels(r, 1e-4, 16, 2048, 1.0)
        ),
        Rb,
    )

    print(f"batch={B} {H}x{W} on {jax.devices()[0].platform}")
    for name, t in [
        ("extract_features (fused)", t_full),
        ("detect", t_detect),
        ("describe", t_describe),
        ("pyramid blurs only", t_pyr),
        ("hessian octave-0 (4 levels, full res)", t_hess),
        ("NMS+topk+subpixel octave-0", t_cand),
    ]:
        print(f"{name:42s} {t * 1e3:8.1f} ms  {B / t:7.1f} img/s")


if __name__ == "__main__":
    main()
