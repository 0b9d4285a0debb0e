"""Shared test utilities.

On the 1-core CPU test runner, un-jitted flax applies dispatch op-by-op and
pay an XLA compile per unique (op, shape) — hundreds of tiny compiles turn a
2s test into minutes.  Always jit whole applies in tests.
"""

import jax


def jit_apply(model):
    """jitted `model.apply` over positional arguments."""

    @jax.jit
    def fn(variables, *args):
        return model.apply(variables, *args)

    return fn


def jit_method(model, method):
    @jax.jit
    def fn(variables, *args):
        return model.apply(variables, *args, method=method)

    return fn
