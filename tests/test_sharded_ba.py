"""Multi-device sharded BA tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencalibration_tpu.parallel import sharded_ba as S


def test_virtual_mesh_available():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"


def test_sharded_ba_converges_and_recovers_shared_focal():
    mesh, p0, pf, cost = S.run_sharded_ba(n_devices=8, groups_per_device=1, iterations=8)
    c0 = float(cost(jax.device_get(p0)))
    cf = float(cost(jax.device_get(pf)))
    assert cf < c0 * 1e-2, (c0, cf)
    # shared focal recovered toward 600 from 612 in every group replica
    focal = np.asarray(jax.device_get(pf.focal))
    np.testing.assert_allclose(focal, 600.0, atol=1.0)
    # replicas agree bitwise (psum-reduced shared system)
    assert np.all(focal == focal[0])


def test_sharded_step_matches_unsharded_semantics():
    """The distributed Schur step on 2 devices must equal the same math on
    one device with all groups local (exactness of the decomposition)."""
    devices = jax.devices()
    G = 2
    params, blk, pixels, free, layout = S.make_synthetic_groups(G)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # use a well-conditioned damping so f32 reduction-order differences
    # between device counts stay below tolerance
    lam = 1e-3
    mesh2 = Mesh(np.asarray(devices[:2]), ("groups",))
    step2 = S.make_sharded_lm_step(mesh2, blk, free, layout, lam=lam)
    sh2 = NamedSharding(mesh2, P("groups"))
    p2, _ = step2(
        jax.tree.map(lambda x: jax.device_put(x, sh2), params),
        jax.device_put(pixels, sh2),
    )

    mesh1 = Mesh(np.asarray(devices[:1]), ("groups",))
    step1 = S.make_sharded_lm_step(mesh1, blk, free, layout, lam=lam)
    sh1 = NamedSharding(mesh1, P("groups"))
    p1, _ = step1(
        jax.tree.map(lambda x: jax.device_put(x, sh1), params),
        jax.device_put(pixels, sh1),
    )

    # f32 reduction-order noise between device counts: ~1e-5 absolute on
    # O(100) coordinates; the math itself is exact
    for a, b in zip(jax.tree.leaves(jax.device_get(p1)), jax.tree.leaves(jax.device_get(p2))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-5
        )
