import jax.numpy as jnp
import numpy as np
import pytest

from opencalibration_tpu.ops import features as F
from opencalibration_tpu.ops import hamming as H


def textured_image(h=256, w=256, seed=0):
    """Smooth random texture with strong blob structure."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(h // 8, w // 8))
    img = np.kron(base, np.ones((8, 8)))
    # smooth a bit
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img, 2.0)
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


def test_detect_finds_blobs():
    img = textured_image()
    out = F.detect(jnp.asarray(img)[None], max_features=256)
    n = int(out["valid"][0].sum())
    assert n > 50
    xy = np.asarray(out["xy"][0][np.asarray(out["valid"][0])])
    # border suppression at 16px, minus up to 0.6px of subpixel refinement
    assert xy[:, 0].min() >= 15.4 and xy[:, 0].max() < 256 - 15.4


def test_detect_level_sigma_consistent():
    """Each keypoint's global level index (octave*SUBLEVELS + sublevel,
    the reference cv::KeyPoint octave/class_id) must determine its
    absolute sigma: sigma == BASE_SIGMA * 2^(level / SUBLEVELS)."""
    img = jnp.asarray(textured_image())[None]
    out = F.detect(img, max_features=256)
    v = np.asarray(out["valid"][0])
    lvl = np.asarray(out["level"][0])[v]
    sig = np.asarray(out["sigma"][0])[v]
    assert lvl.min() >= 0 and lvl.max() < F.NUM_OCTAVES * F.SUBLEVELS
    expect = F.BASE_SIGMA * (2.0 ** (lvl / F.SUBLEVELS))
    np.testing.assert_allclose(sig, expect, rtol=1e-5)
    # the pyramid must actually use coarser octaves on blobby texture
    assert lvl.max() >= F.SUBLEVELS


def test_detect_is_deterministic():
    img = jnp.asarray(textured_image())[None]
    a = F.detect(img, max_features=128)
    b = F.detect(img, max_features=128)
    np.testing.assert_array_equal(np.asarray(a["xy"]), np.asarray(b["xy"]))


def test_extract_and_match_translated():
    """Features of a translated image must match back to the original
    (the contract the link stage depends on)."""
    img = textured_image(320, 320, seed=1)
    shift = 24
    img2 = np.roll(img, (shift, shift), axis=(0, 1))

    batch = jnp.asarray(np.stack([img, img2]))
    feats = F.extract_features(batch, max_features=512)

    d1, d2 = feats["descriptors"][0], feats["descriptors"][1]
    v1, v2 = feats["valid"][0], feats["valid"][1]
    idx2, dist, matched = H.match_descriptors(d1, d2, v1, v2)

    m = np.asarray(matched)
    assert m.sum() > 30, f"only {m.sum()} matches"
    xy1 = np.asarray(feats["xy"][0])
    xy2 = np.asarray(feats["xy"][1])
    dxy = xy2[np.asarray(idx2)[m]] - xy1[m]
    # majority of matches consistent with the translation
    good = (np.abs(dxy - shift) < 3).all(axis=1)
    assert good.mean() > 0.6, f"only {good.mean():.2f} consistent"


def test_descriptor_rotation_tolerance():
    """Orientation normalization: a 90-degree rotated copy still matches."""
    img = textured_image(320, 320, seed=2)
    img2 = np.rot90(img).copy()
    batch = jnp.asarray(np.stack([img, img2]))
    feats = F.extract_features(batch, max_features=512)
    idx2, dist, matched = H.match_descriptors(
        feats["descriptors"][0], feats["descriptors"][1],
        feats["valid"][0], feats["valid"][1],
    )
    m = np.asarray(matched)
    assert m.sum() > 20, f"only {m.sum()} matches under rotation"
    # check spatial consistency under the rotation map (y, x) -> (W-1-x, y)
    xy1 = np.asarray(feats["xy"][0])[m]
    xy2 = np.asarray(feats["xy"][1])[np.asarray(idx2)[m]]
    expected = np.stack([xy1[:, 1], 320 - 1 - xy1[:, 0]], axis=1)
    good = (np.abs(xy2 - expected) < 3).all(axis=1)
    assert good.mean() > 0.5, f"only {good.mean():.2f} spatially consistent"


def test_fed_nonlinear_scale_space():
    """FED diffusion: matches still work, and edges survive diffusion
    better than under equivalent Gaussian blur."""
    import jax.numpy as jnp

    from opencalibration_tpu.ops import features as F
    from opencalibration_tpu.ops import hamming as H

    img = textured_image(256, 256, seed=9)
    img2 = np.roll(img, (16, 16), axis=(0, 1))
    batch = jnp.asarray(np.stack([img, img2]))
    feats = F.extract_features(batch, max_features=512, diffusion="fed")
    idx2, dist, matched = H.match_descriptors(
        feats["descriptors"][0], feats["descriptors"][1],
        feats["valid"][0], feats["valid"][1],
    )
    assert int(np.asarray(matched).sum()) > 30

    # edge preservation: a step edge keeps a sharper profile at a deep
    # scale level under FED than under Gaussian
    step = np.zeros((96, 96), np.float32)
    step[:, 48:] = 1.0
    L_g, s_g = F.scale_space(jnp.asarray(step)[None], "gaussian")
    L_f, s_f = F.scale_space(jnp.asarray(step)[None], "fed")
    lvl = 8
    mid_grad_g = float(np.abs(np.diff(np.asarray(L_g[lvl, 0, 48]))).max())
    mid_grad_f = float(np.abs(np.diff(np.asarray(L_f[lvl, 0, 48]))).max())
    assert mid_grad_f > mid_grad_g * 1.5, (mid_grad_f, mid_grad_g)


def test_external_detector_anchor():
    """Fidelity anchor against independent detectors (addresses the
    'AKAZE fidelity is self-referential' concern; OpenCV 5 dropped AKAZE
    so SIFT anchors detection repeatability and ORB, a binary-descriptor
    pipeline like ours, anchors matchability): the overwhelming majority
    of SIFT keypoints must coincide with one of ours, and our
    ratio-test match yield must at least equal ORB's on the same pair."""
    import cv2
    import scipy.spatial

    if not hasattr(cv2, "SIFT_create") or not hasattr(cv2, "ORB_create"):
        import pytest

        pytest.skip("cv2 lacks SIFT/ORB")

    import jax.numpy as jnp

    from opencalibration_tpu.ops import features as F
    from opencalibration_tpu.ops import hamming as H
    from tests.synthetic_survey import make_texture, render_views

    tex = make_texture(0)
    DOWN = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    positions = np.array([[60.0, 60.0, 60.0], [72.0, 64.0, 60.0]], np.float32)
    views = render_views(tex, positions, np.stack([DOWN, DOWN]))
    imgs8 = [(v * 255).astype(np.uint8) for v in views]

    out = F.extract_features(jnp.asarray(np.stack(views)), max_features=1024)
    ours_xy = [
        np.asarray(out["xy"][i])[np.asarray(out["valid"][i])] for i in range(2)
    ]

    sift = cv2.SIFT_create(nfeatures=1024)
    for i, im in enumerate(imgs8):
        pts = np.array([k.pt for k in sift.detect(im, None)])
        assert len(pts) > 50
        d, _ = scipy.spatial.cKDTree(ours_xy[i]).query(pts)
        coverage = (d <= 3.0).mean()
        assert coverage > 0.7, f"image {i}: only {coverage:.2f} of SIFT kps covered"

    _, _, matched = H.match_descriptors(
        out["descriptors"][0], out["descriptors"][1],
        out["valid"][0], out["valid"][1],
    )
    ours_matches = int(np.asarray(matched).sum())

    orb = cv2.ORB_create(nfeatures=1024)
    kp1, d1 = orb.detectAndCompute(imgs8[0], None)
    kp2, d2 = orb.detectAndCompute(imgs8[1], None)
    knn = cv2.BFMatcher(cv2.NORM_HAMMING).knnMatch(d1, d2, k=2)
    orb_matches = len([m for m, n in knn if m.distance < 0.8 * n.distance])
    assert ours_matches >= max(orb_matches, 100), (
        f"ours {ours_matches} vs ORB {orb_matches}"
    )


def test_uint8_batch_matches_float():
    """uint8 device upload (4x less host->device traffic) must produce
    IDENTICAL features to the float path: the on-device astype/255
    normalization is the exact op the host used to apply."""
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    img8 = (rng.random((1, 96, 128)) * 255).astype(np.uint8)
    imgf = img8.astype(np.float32) / 255.0
    a = F.extract_features(jnp.asarray(img8), max_features=128)
    b = F.extract_features(jnp.asarray(imgf), max_features=128)
    np.testing.assert_array_equal(np.asarray(a["valid"]), np.asarray(b["valid"]))
    np.testing.assert_array_equal(
        np.asarray(a["descriptors"]), np.asarray(b["descriptors"])
    )
    # XLA fuses the on-device /255 into the first blur (FMA), which can
    # shift last-ulp rounding that subpixel refinement amplifies; bound
    # the drift at a thousandth of a pixel instead of bit equality
    np.testing.assert_allclose(
        np.asarray(a["xy"]), np.asarray(b["xy"]), atol=1e-3
    )


def test_batched_blur_matches_incremental_chain():
    """Direct-from-base batched sublevel blurs equal the serial
    incremental blur chain up to kernel-truncation error (Gaussians
    compose), so the one-batched-matmul octave keeps detector math."""
    import math

    import jax.numpy as jnp

    from opencalibration_tpu.ops import features as F

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((2, 96, 128)), jnp.float32)
    # the equivalence under test is the Gaussian-composition MATH; pin
    # full f32 so operand-storage truncation doesn't widen the bound
    # (the bf16 deviation has its own bound test below)
    F.set_blur_precision("f32")
    try:
        base = F._blur(img, F.BASE_SIGMA)
        rels = [
            F.BASE_SIGMA * (2.0 ** (s / F.SUBLEVELS))
            for s in range(F.SUBLEVELS)
        ]
        batched = F._blur_levels(base, F.BASE_SIGMA, rels)

        cur, cur_rel = base, F.BASE_SIGMA
        for s, rel in enumerate(rels):
            if rel > cur_rel:
                cur = F._blur(cur, math.sqrt(rel * rel - cur_rel * cur_rel))
                cur_rel = rel
            # border rows differ by the two paths' different effective
            # kernel truncation against the edge clamp; the detector
            # excludes a 16 px border, so equivalence is asserted on the
            # interior
            diff = float(
                jnp.max(jnp.abs((batched[s] - cur)[:, 16:-16, 16:-16]))
            )
            assert diff < 1e-3, f"sublevel {s}: interior max diff {diff}"
    finally:
        F.set_blur_precision("bf16")


def test_bf16_blur_deviation_bounded():
    """bf16 operand storage (f32 accumulation) stays within a small
    absolute band of the f32 blur — the fidelity contract behind the
    default fast path (A/B: bench_blur_precision_ab.py)."""
    import jax.numpy as jnp

    from opencalibration_tpu.ops import features as F

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((2, 96, 128)), jnp.float32)
    F.set_blur_precision("f32")
    try:
        ref = F._blur(img, 2.0)
    finally:
        F.set_blur_precision("bf16")
    fast = F._blur(img, 2.0)
    diff = float(jnp.max(jnp.abs(fast - ref)))
    assert diff < 5e-3, f"bf16 blur deviates {diff} from f32"
