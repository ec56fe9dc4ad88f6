"""Varying-manual-axes (VMA) hygiene for loop carries under shard_map.

Inside ``jax.shard_map`` every value is typed with the mesh axes it
*varies* over. Loop carries built from fresh constants (iteration
counters, ``False`` flags, zero accumulators) are unvarying, while the
body recomputes them from device-varying data — a type clash that scan/
while_loop reject. Rather than disabling the check (``check_vma=False``
hides real masking bugs), the solver casts each carry init up to the
varying axes of its data with :func:`pvary_like`. Outside shard_map the
cast is a no-op, so the single-program paths are untouched.
"""
from __future__ import annotations

import jax


def vma_of(x) -> frozenset:
    """The mesh axes ``x`` varies over (empty outside shard_map)."""
    return getattr(jax.typeof(x), "vma", frozenset())


def out_structs(structs, like):
    """Annotate ``pallas_call`` out_shape structs with ``like``'s varying
    axes — required when the call sits inside shard_map with the VMA check
    on (pallas outputs don't infer vma from their inputs)."""
    axes = vma_of(like)
    if not axes:
        return structs
    return [jax.ShapeDtypeStruct(s.shape, s.dtype, vma=axes) for s in structs]


def pvary_like(tree, ref):
    """Cast every leaf of ``tree`` to vary over (at least) the manual mesh
    axes that ``ref`` varies over. No-op outside shard_map."""
    axes = vma_of(ref)
    if not axes:
        return tree

    def cast(a):
        missing = tuple(ax for ax in axes if ax not in vma_of(a))
        return jax.lax.pcast(a, missing, to="varying") if missing else a

    return jax.tree.map(cast, tree)
