"""Scale sweep over BASELINE.json-style survey sizes.

Not part of the driver contract (bench.py prints the official one-liner);
this records throughput across survey sizes on the real TPU to document
scaling behaviour. Usage: python bench_scale.py [sizes...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def run_config(n_images: int):
    import bench
    from tests.synthetic_survey import camera_grid, make_texture, render_views

    rows = max(2, int(np.sqrt(n_images / 1.5)))
    cols = max(2, (n_images + rows - 1) // rows)
    n = rows * cols
    tex = make_texture(0)
    positions, quats = camera_grid(rows, cols, spacing=12.0)
    views = render_views(tex, positions, quats)
    images = np.stack(views)

    pairs = []
    for i in range(n):
        d2 = np.sum((positions[:, :2] - positions[i, :2]) ** 2, axis=1)
        for j in np.argsort(d2)[1:4]:
            a, b = min(i, int(j)), max(i, int(j))
            if (a, b) not in pairs:
                pairs.append((a, b))
    pairs = sorted(pairs)
    pa = np.asarray([p[0] for p in pairs], np.int32)
    pb = np.asarray([p[1] for p in pairs], np.int32)

    def step():
        from opencalibration_tpu.ops import features as F

        feats = F.extract_features(jnp.asarray(images), max_features=1024)
        rq, rt, rs = bench._link_all(
            feats["descriptors"], feats["xy"], feats["valid"],
            jnp.asarray(pa), jnp.asarray(pb),
        )
        return bench._relax_all(
            jnp.asarray(positions, jnp.float32), jnp.asarray(pa),
            jnp.asarray(pb), rq, rt, rs,
        )

    out = step()
    jax.block_until_ready(out)  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return dict(images=n, pairs=len(pairs), seconds=round(dt, 3),
                images_per_sec=round(n / dt, 2))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2, 10, 24, 48, 96]
    results = []
    for s in sizes:
        r = run_config(s)
        results.append(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
