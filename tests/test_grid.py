"""Grid construction tests (vs. formulas and the dense numpy oracle)."""

import jax.numpy as jnp
import numpy as np

from heston_tpu.config import GridSpec
from heston_tpu.ops import grid as gridmod

from oracle_dense import build_grid_np


def test_grid_matches_reference_construction():
    spec = GridSpec(m1=50, m2=25)
    g = gridmod.make_grid(spec, 100.0, 100.0, 0.04)
    vs, vv, ds, dv = build_grid_np(50, 25, 100.0, 100.0, 0.04)
    np.testing.assert_allclose(np.array(g.vec_s), vs, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.array(g.vec_v), vv, rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.array(g.dels), ds, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.array(g.delv), dv, rtol=0, atol=1e-14)


def test_spot_and_v0_are_nodes():
    """S_0 / V_0 insertion places them exactly on the grid
    (ref: src/grid.cpp:34-37, 53-56)."""
    spec = GridSpec(m1=37, m2=19)
    g = gridmod.make_grid(spec, 103.7, 95.0, 0.0567)
    assert float(jnp.min(jnp.abs(g.vec_s - 103.7))) == 0.0
    assert float(jnp.min(jnp.abs(g.vec_v - 0.0567))) == 0.0
    # monotone ascending
    assert float(jnp.min(g.dels)) > 0
    assert float(jnp.min(g.delv)) > 0


def test_insertion_drops_largest_node():
    """push/sort/pop drops the nominal S_max = 8K (ref: src/grid.cpp:34-37)."""
    spec = GridSpec(m1=50, m2=25)
    g = gridmod.make_grid(spec, 100.0, 100.0, 0.04)
    assert float(g.vec_s[-1]) < 8 * 100.0
    assert abs(float(g.vec_s[0])) < 1e-12  # sinh grid starts at ~0
    assert float(g.vec_v[0]) == 0.0  # d*sinh(0) is exactly 0


def test_find_node_semantics():
    nodes = jnp.array([0.0, 1.0, 2.5, 4.0])
    assert int(gridmod.find_node(nodes, 2.5)) == 2
    # absent value falls back to index 0 (ref: src/grid_pod.hpp:75-87)
    assert int(gridmod.find_node(nodes, 3.3)) == 0


def test_interp_at_matches_node_value():
    spec = GridSpec(m1=20, m2=12)
    g = gridmod.make_grid(spec, 100.0, 100.0, 0.04)
    u = jnp.outer(g.vec_v, g.vec_s)          # bilinear surface
    # exact node
    iv = int(gridmod.find_node(g.vec_v, 0.04))
    is_ = int(gridmod.find_node(g.vec_s, 100.0))
    got = float(gridmod.interp_at(g, u, 100.0, 0.04))
    assert abs(got - float(u[iv, is_])) < 1e-9
    # off-node point reproduces the bilinear function exactly
    s_q = 0.5 * (float(g.vec_s[3]) + float(g.vec_s[4]))
    v_q = 0.25 * float(g.vec_v[2]) + 0.75 * float(g.vec_v[3])
    assert abs(float(gridmod.interp_at(g, u, s_q, v_q)) - s_q * v_q) < 1e-8


def test_validate_book_rejects_out_of_domain_spot():
    import pytest

    spec = GridSpec(m1=10, m2=6)
    gridmod.validate_book(spec, 100.0, [50.0, 100.0])   # fine
    with pytest.raises(ValueError, match="outside the S-grid"):
        gridmod.validate_book(spec, 100.0, [1.0, 100.0])  # 8*1 < 100


def test_rebuild_variance_matches_fresh_build():
    spec = GridSpec(m1=20, m2=15)
    g = gridmod.make_grid(spec, 100.0, 100.0, 0.04)
    g2 = gridmod.rebuild_variance(spec, g, 0.04 + 1e-6)
    g3 = gridmod.make_grid(spec, 100.0, 100.0, 0.04 + 1e-6)
    np.testing.assert_array_equal(np.array(g2.vec_v), np.array(g3.vec_v))
    assert float(jnp.min(jnp.abs(g2.vec_v - (0.04 + 1e-6)))) == 0.0


def test_uniform_grid_matches_reference_semantics():
    """make_uniform_grid replicates create_uniform_grid
    (ref: src/grid.cpp:112-164): uniform nodes, then S_0/V_0 push/sort/pop
    (dropping the largest node), then delta recomputation."""
    m1, m2 = 10, 6
    s0, v0 = 103.7, 0.037
    g = gridmod.make_uniform_grid(m1, m2, s0, v0, 0.0, 200.0, 0.0, 1.0)
    # reference semantics in plain numpy
    vs = np.linspace(0.0, 200.0, m1 + 1)
    vs = np.sort(np.append(vs, s0))[:-1]
    vv = np.linspace(0.0, 1.0, m2 + 1)
    vv = np.sort(np.append(vv, v0))[:-1]
    np.testing.assert_allclose(np.array(g.vec_s), vs, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.array(g.vec_v), vv, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.array(g.dels), np.diff(vs), atol=1e-12)
    np.testing.assert_allclose(np.array(g.delv), np.diff(vv), atol=1e-12)
    # spot/variance lie exactly on nodes
    assert float(jnp.min(jnp.abs(g.vec_s - s0))) == 0.0
    assert float(jnp.min(jnp.abs(g.vec_v - v0))) == 0.0
