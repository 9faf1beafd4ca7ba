"""Banded-solver tests vs. dense jnp.linalg.solve, both engines, batched."""

import jax.numpy as jnp
import numpy as np
import pytest

from heston_tpu.ops import banded


def _random_tridiag(rng, batch, n):
    md = 3.0 + rng.standard_normal((*batch, n))
    ml = 0.5 * rng.standard_normal((*batch, n))
    mu = 0.5 * rng.standard_normal((*batch, n))
    ml[..., 0] = 0.0
    mu[..., -1] = 0.0
    return ml, md, mu


def _dense_from_tridiag(ml, md, mu):
    n = md.shape[-1]
    a = np.zeros((n, n))
    np.fill_diagonal(a, md)
    for i in range(1, n):
        a[i, i - 1] = ml[i]
        a[i - 1, i] = mu[i - 1]
    return a


def _random_penta(rng, n):
    d = 4.0 + rng.standard_normal(n)
    l1 = 0.4 * rng.standard_normal(n)
    l2 = 0.2 * rng.standard_normal(n)
    u1 = 0.4 * rng.standard_normal(n)
    u2 = 0.2 * rng.standard_normal(n)
    l1[0] = 0.0
    l2[:2] = 0.0
    u1[-1] = 0.0
    u2[-2:] = 0.0
    return l2, l1, d, u1, u2


def _dense_from_penta(l2, l1, d, u1, u2):
    n = d.shape[-1]
    a = np.zeros((n, n))
    np.fill_diagonal(a, d)
    for i in range(n):
        if i >= 1:
            a[i, i - 1] = l1[i]
        if i >= 2:
            a[i, i - 2] = l2[i]
        if i + 1 < n:
            a[i, i + 1] = u1[i]
        if i + 2 < n:
            a[i, i + 2] = u2[i]
    return a


@pytest.mark.parametrize("engine", ["scan", "pcr"])
def test_tridiag_vs_dense(rng, engine):
    n = 17
    ml, md, mu = _random_tridiag(rng, (), n)
    rhs = rng.standard_normal(n)
    fac = banded.tridiag_factor(jnp.array(ml), jnp.array(md), jnp.array(mu))
    x = np.array(banded.tridiag_solve(fac, jnp.array(rhs), engine))
    want = np.linalg.solve(_dense_from_tridiag(ml, md, mu), rhs)
    np.testing.assert_allclose(x, want, rtol=0, atol=1e-10)


@pytest.mark.parametrize("engine", ["scan", "pcr"])
def test_tridiag_batched(rng, engine):
    batch, n = (3, 5), 11
    ml, md, mu = _random_tridiag(rng, batch, n)
    rhs = rng.standard_normal((*batch, n))
    fac = banded.tridiag_factor(jnp.array(ml), jnp.array(md), jnp.array(mu))
    x = np.array(banded.tridiag_solve(fac, jnp.array(rhs), engine))
    for i in range(batch[0]):
        for j in range(batch[1]):
            want = np.linalg.solve(
                _dense_from_tridiag(ml[i, j], md[i, j], mu[i, j]), rhs[i, j])
            np.testing.assert_allclose(x[i, j], want, rtol=0, atol=1e-10)


@pytest.mark.parametrize("engine", ["scan", "pcr"])
def test_penta_vs_dense(rng, engine):
    n, k = 13, 7
    l2, l1, d, u1, u2 = _random_penta(rng, n)
    rhs = rng.standard_normal((n, k))
    fac = banded.penta_factor(*[jnp.array(b) for b in (l2, l1, d, u1, u2)])
    x = np.array(banded.penta_solve(fac, jnp.array(rhs), engine))
    want = np.linalg.solve(_dense_from_penta(l2, l1, d, u1, u2), rhs)
    np.testing.assert_allclose(x, want, rtol=0, atol=1e-10)


@pytest.mark.parametrize("engine", ["scan", "pcr"])
def test_penta_reference_structure(rng, engine):
    """The A2 structure: u2 only on the first row (v=0 one-sided stencil
    fill-in) and trailing identity rows (ref: src/hes_A2_mat.hpp:222-281)."""
    n, k = 14, 5
    d = 3.0 + rng.standard_normal(n)
    l1 = 0.4 * rng.standard_normal(n)
    u1 = 0.4 * rng.standard_normal(n)
    l2 = np.zeros(n)
    u2 = np.zeros(n)
    u2[0] = 0.7          # gamma-stencil fill-in
    l1[0] = 0.0
    u1[-1] = 0.0
    # trailing identity rows (rows n-2, n-1)
    for r in (n - 2, n - 1):
        d[r] = 1.0
        l1[r] = 0.0
        u1[r] = 0.0 if r + 1 < n else u1[r]
    u1[n - 2] = 0.0
    rhs = rng.standard_normal((n, k))
    fac = banded.penta_factor(*[jnp.array(b) for b in (l2, l1, d, u1, u2)])
    x = np.array(banded.penta_solve(fac, jnp.array(rhs), engine))
    want = np.linalg.solve(_dense_from_penta(l2, l1, d, u1, u2), rhs)
    np.testing.assert_allclose(x, want, rtol=0, atol=1e-10)
    # identity rows pass rhs through
    np.testing.assert_allclose(x[-1], rhs[-1], atol=1e-12)


def test_engines_agree(rng):
    n, k = 21, 9
    l2, l1, d, u1, u2 = _random_penta(rng, n)
    rhs = rng.standard_normal((n, k))
    fac = banded.penta_factor(*[jnp.array(b) for b in (l2, l1, d, u1, u2)])
    x_scan = np.array(banded.penta_solve(fac, jnp.array(rhs), "scan"))
    x_pcr = np.array(banded.penta_solve(fac, jnp.array(rhs), "pcr"))
    np.testing.assert_allclose(x_scan, x_pcr, rtol=0, atol=1e-9)
