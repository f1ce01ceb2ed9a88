"""
Layout pin: an identity copy through a Pallas call.

XLA chooses one layout per value and propagates it through elementwise
chains. The sup transformer's conv downsample output keeps a
conv-flavoured layout that then taxes every one of the 18 encoder layers
(measured: conv+stack fused in one jit runs 196 ms vs 153 ms when the
conv output is re-materialised row-major first — scripts/prof_sup8.py).
A Pallas kernel's operands are layout-pinned, so an identity copy acts
as a layout barrier costing one HBM round-trip of the tensor (~2 ms for
the [128, 1024, 512] bf16 sup activation) and saving ~42 ms of stack
slowdown.

The copy has a custom VJP (the cotangent is copied too — the backward
stack benefits from the same pin), so it is safe on the training path.
"""

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def _copy(x, interpret=False):
    N = x.shape[0]
    rest = x.shape[1:]
    return pl.pallas_call(
        _copy_kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1,) + rest, lambda n: (n,) + (0,) * len(rest))],
        out_specs=pl.BlockSpec((1,) + rest, lambda n: (n,) + (0,) * len(rest)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


@jax.custom_vjp
def pin_layout(x):
    """Identity; materialises x row-major on TPU (no-op elsewhere)."""
    return _pin(x)


def _pin(x, interpret=False):
    if not interpret and (
            os.environ.get("BONITO_TPU_NO_PALLAS")
            or jax.default_backend() != "tpu"):
        return x
    return _copy(x, interpret=interpret)


def _pin_fwd(x):
    return _pin(x), None


def _pin_bwd(_, g):
    return (_pin(g),)


pin_layout.defvjp(_pin_fwd, _pin_bwd)
