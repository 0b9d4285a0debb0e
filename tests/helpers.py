"""Shared test utilities.

On the 1-core CPU test runner, un-jitted flax applies dispatch op-by-op and
pay an XLA compile per unique (op, shape) — hundreds of tiny compiles turn a
2s test into minutes.  Always jit whole applies in tests.
"""

import jax


def jit_apply(model, **jit_kwargs):
    """jitted `model.apply` accepting the same call signature."""

    @jax.jit
    def fn(variables, *args):
        return model.apply(variables, *args)

    return fn


def jit_method(model, method, **jit_kwargs):
    @jax.jit
    def fn(variables, *args):
        return model.apply(variables, *args, method=method)

    return fn
