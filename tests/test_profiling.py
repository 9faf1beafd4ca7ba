"""Profiling utility tests."""

import jax.numpy as jnp

from heston_tpu.utils.profiling import PhaseTimer, scope


def test_phase_timer_accumulates():
    t = PhaseTimer()
    x = jnp.ones(8)
    for _ in range(3):
        with t.phase("mul", sync=None):
            x = x * 2.0
    with t.phase("sum", sync=x):
        y = x.sum()
    rep = t.report()
    assert "mul: n=3" in rep and "sum: n=1" in rep


def test_named_scope_traces():
    import jax

    @jax.jit
    def f(x):
        with scope("doubling"):
            return x * 2

    assert float(f(jnp.float32(2.0))) == 4.0
