"""Auxiliary subsystems: debug mode, profiling, distributed helpers."""

import numpy as np
import pytest


def test_debug_mode_catches_nan():
    import jax
    import jax.numpy as jnp

    from aggforce_tpu.utils.debug import debug_mode

    @jax.jit
    def bad(x):
        return jnp.log(x)  # log(-1) -> NaN

    x = jnp.asarray([-1.0])
    # without debug mode: silent NaN
    assert np.isnan(np.asarray(bad(x))).all()
    # the tripwire's de-optimized rerun dispatches per-primitive eager
    # executables; entries cached by EARLIER tests (compiled with the
    # tripwire off) short-circuit the check, making this order-dependent —
    # drop all caches so everything recompiles under the debug config
    jax.clear_caches()
    with debug_mode():
        with pytest.raises(FloatingPointError):
            np.asarray(bad(jnp.asarray([-2.0])))
    # config restored afterwards
    assert not jax.config.jax_debug_nans


def test_phase_timer_report():
    from aggforce_tpu.utils.prof import PhaseTimer

    t = PhaseTimer(sync=False)
    with t.phase("alpha"):
        pass
    with t.phase("alpha"):
        pass
    with t.phase("beta"):
        pass
    assert t.total("alpha") >= 0.0
    rep = t.report()
    assert "alpha" in rep and "(x2)" in rep


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from aggforce_tpu.utils.prof import trace

    with trace(str(tmp_path)) as target:
        _ = jnp.ones(8) * 2
    assert target == str(tmp_path)


def test_process_frame_slice_partitions():
    from aggforce_tpu.parallel.distributed import process_frame_slice

    # single-process environment: the slice must cover everything
    s = process_frame_slice(103)
    assert s == slice(0, 103)


def test_make_bond_constraint_matrix_structure():
    from aggforce_tpu.qp import make_bond_constraint_matrix

    mat = make_bond_constraint_matrix(5, {frozenset({1, 2})})
    assert mat.shape == (5, 4)
    # each row has exactly one 1; constrained sites share a column
    assert (mat.sum(axis=1) == 1).all()
    np.testing.assert_array_equal(mat[1], mat[2])
    assert not (mat[0] == mat[1]).all()
    # reduced vector expansion: [a, b, c, d] -> [a, b, b, c, d]
    np.testing.assert_array_equal(
        mat @ np.array([1.0, 2.0, 3.0, 4.0]), [1.0, 2.0, 2.0, 3.0, 4.0]
    )


def test_compile_time_logger():
    import jax
    import jax.numpy as jnp

    from aggforce_tpu.utils.prof import log_compile_time

    msgs = []
    fn = log_compile_time(jax.jit(lambda x: x * 2), sink=msgs.append)
    fn(jnp.ones(4))
    fn(jnp.ones(4))
    assert len(msgs) == 2
    assert "first call" in msgs[0]
    assert "first call" not in msgs[1]
