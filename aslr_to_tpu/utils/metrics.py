"""Solution metrics (reference ``python/aslr_to/__init__.py:63-68``)."""
from __future__ import annotations

import jax.numpy as jnp


def u_squared(us):
    """Per-channel sum of squared controls over the horizon.

    Replaces ``aslr_to.u_squared(log)`` (reference
    ``python/aslr_to/__init__.py:63-68``) operating on the solver's control
    trajectory ``us [T, nu]`` instead of a callback log.
    """
    return jnp.sum(jnp.square(us), axis=0)
