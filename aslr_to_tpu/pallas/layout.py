"""Sublane-packed lane layout shared by the Pallas kernels.

The kernels originally held per-scenario values as 1-D ``[128]`` arrays
(batch on the vector lanes). Mosaic lays a 1-D vector on ONE sublane of
the (8, 128) vector register, so every elementwise op in the kernels'
long serial dependency chains computed 128 useful values out of a
1024-wide unit — an 8x ceiling that matched the measured 5-14%% VPU
rooflines (docs/BENCH.md). ``scripts/probe_sublane.py`` measured that
ops on ``[8, 128]`` values (batch packed on sublanes AND lanes) run the
same chains ~1.5-1.9x faster for 8x the work per instruction.

This module centralizes the packed layout: a lane tensor ``[dims..., Bp]``
is reshaped (free, contiguous) to ``[dims..., Bp // NB, NB]`` and kernels
take blocks of ``(dims..., PACK, NB)`` — one full (8, 128) vreg of
scenarios per value. Mosaic requires sublane-axis block sizes divisible
by 8 (or equal to the whole axis), hence ``PACK = 8`` and the batch
padding rule in :func:`padded_batch`.
"""
from __future__ import annotations

import jax.numpy as jnp

NB = 128       # lane width (f32 vreg minor dim)
PACK = 8       # sublane pack factor (f32 vreg major dim)


def pack_for(ndx: int) -> int:
    """Sublane pack factor for a state tangent dimension: the full (8,
    128) vreg for the 2-DoF family (ndx=8 — the measured 4.96x round-3
    win), half-tiles for big states (one knot of ndx=28 derivative
    tensors at pack=8 would double-buffer ~16.6 MB, past the VMEM
    budget; at pack=4 the same blocks halve and still vectorize 512
    scenarios per op)."""
    return PACK if ndx <= 8 else 4


def padded_batch(B: int, nb: int = NB, pack: int = PACK) -> int:
    """Smallest valid padded batch: a multiple of ``nb`` whose row count
    ``Bp // nb`` is either < ``pack`` (single whole-axis block) or a
    multiple of ``pack`` (grid of (pack, nb) blocks). ``pack`` < 8 (in
    multiples Mosaic accepts: the whole axis, or 8 on f32) trades vreg
    fill for VMEM footprint — the big-state (ndx=28) kernels use pack=4
    because one knot's derivative tensors at (8, 128) would double-buffer
    past the ~16 MB VMEM budget."""
    rows = -(-B // nb)
    if rows > pack:
        rows = -(-rows // pack) * pack
    return rows * nb


def pack_dims(Bp: int, nb: int = NB, pack: int = PACK):
    """``(rows, pack, grid)`` for a padded batch ``Bp``: row count of the
    packed axis, sublane block size, and number of batch-tile grid steps."""
    assert Bp % nb == 0, f"Bp={Bp} not a multiple of nb={nb}"
    rows = Bp // nb
    if rows <= pack:
        return rows, rows, 1
    assert rows % pack == 0, f"rows={rows} not a multiple of pack={pack}"
    return rows, pack, rows // pack


def to_packed(x, nb: int = NB):
    """[dims..., Bp] -> [dims..., Bp//nb, nb] (free reshape)."""
    return x.reshape(x.shape[:-1] + (x.shape[-1] // nb, nb))


def from_packed(x):
    """[dims..., rows, nb] -> [dims..., rows*nb] (free reshape)."""
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


def eye_lanes(n: int, like):
    """Identity as [n, n, batch...] lane values (``like`` fixes the batch
    shape/dtype). Built by stacking — a ``jnp.eye(n).reshape(n, n, 1, 1)``
    is a shape cast out of the tiled dims that Mosaic cannot lower."""
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return jnp.stack([jnp.stack([one if i == j else zero for j in range(n)])
                      for i in range(n)])


def add_diag(A, d):
    """A + diag(d) per lane: A [n, n, batch...]; d [batch...] (same value
    on every diagonal entry) or [n, batch...] (per-entry). Avoids
    materializing an identity (see :func:`eye_lanes`)."""
    n = A.shape[0]
    per_entry = d.ndim == A.ndim - 1
    return jnp.stack([
        jnp.stack([A[i, j] + (d[i] if per_entry else d) if j == i else A[i, j]
                   for j in range(n)])
        for i in range(n)])


def pick_chunks(T: int, target: int):
    """``(Tc, NC, pad)``: chunk length, chunk count, and front/back padding
    knots so that ``NC * Tc == T + pad`` with Tc as close to ``target`` as
    divisibility allows (kernels mask the padded knots)."""
    if T <= target:
        return T, 1, 0
    for tc in range(target, max(target // 2, 1) - 1, -1):
        if T % tc == 0:
            return tc, T // tc, 0
    nc = -(-T // target)
    tc = -(-T // nc)
    return tc, nc, nc * tc - T
