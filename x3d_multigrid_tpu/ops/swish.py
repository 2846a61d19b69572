"""Swish activation with a memory-lean custom VJP.

The reference implements swish as a custom autograd Function whose backward
recomputes ``sigmoid(x)`` from the saved *input* instead of keeping the
composed autograd graph (reference: x3d.py:61-84).  On TPU the same trade is
expressed with :func:`jax.custom_vjp`: only ``x`` is saved as a residual and
the backward is a single fused VPU expression.
"""

import jax

# "cvjp" (default): the reference's memory trade via jax.custom_vjp.
# "xla": plain composition — autodiff through x*sigmoid(x); lets XLA fuse
# the backward into neighbors (custom_vjp is a fusion boundary), at the
# cost of whatever residuals its autodiff keeps.  Selectable to measure.
SWISH_IMPL = "cvjp"


def set_swish_impl(mode: str) -> None:
    global SWISH_IMPL
    SWISH_IMPL = mode


@jax.custom_vjp
def _swish_cvjp(x):
    return x * jax.nn.sigmoid(x)


def _swish_fwd(x):
    return x * jax.nn.sigmoid(x), (x,)


def _swish_bwd(res, g):
    (x,) = res
    s = jax.nn.sigmoid(x)
    return (g * (s * (1.0 + x * (1.0 - s))),)


_swish_cvjp.defvjp(_swish_fwd, _swish_bwd)


def swish(x):
    """``x * sigmoid(x)`` (a.k.a. SiLU)."""
    if SWISH_IMPL == "xla":
        return x * jax.nn.sigmoid(x)
    return _swish_cvjp(x)
