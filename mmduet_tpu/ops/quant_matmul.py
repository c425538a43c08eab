"""Pallas int4 matmul: nibble decode fused into the contraction.

``y @ dequant(qw4, qs)`` for the group-wise int4 weights of
`models/quant.py` (``qw4`` nibble-packed int8 (G, g/2, O), ``qs`` bf16
(G, 1, O)). The XLA path for this contraction materializes the unpacked
int8 AND a bf16 copy of every layer's weights per step — measured
4.3 tok/s decode on a v5e (BENCH r5 run 2, `generation_tok_s_int4`)
against int8's 93.2, i.e. the unpack chain costs ~20x the bandwidth it
was supposed to save. This kernel keeps HBM traffic at the PACKED bytes:
each grid step DMAs a packed (Gt, g/2, Ot) block into VMEM, decodes the
nibbles and folds the per-group scale there (VPU byte ops), and feeds
the decoded tile straight to the MXU.

Grid: ``(n_o, n_g)`` with the reduction innermost; the output tile is
revisited across ``n_g`` and accumulated in place (grid-order
guarantee). ALL rows ride in one block so the nibble decode — a
multi-pass VPU sweep over every weight element — runs ONCE per weight
tile regardless of row count (a row-tiled variant re-paid the full
decode per row tile: measured 16.8 ms/frame block scoring vs int8's
5.4). The wrapper chunks row counts beyond ``_MAX_ROWS`` into
sequential calls (decode re-paid per ~1.5k-row chunk — noise per row),
and the (rows=1024, Ot=128) tiling holds y-block + decode temps + out
under the scoped-VMEM limit (measured 16-27 MB depending on the
enclosing program; both larger tilings OOM'd on chip).

Decode economics, measured: the VPU decode costs ~constant time per
weight element per sweep, so int4 WINS where many rows share one
sweep (score/prefill blocks) and LOSES single-stream decode (one row
per sweep — ~10 tok/s vs int8's 93). int4 is therefore the
footprint/capacity option; int8 stays the latency default
(docs/SERVING.md).

Reference for the math being replaced: `models/quant.py
quantized_matmul` (the grouped-einsum branch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# test hook: run the kernel through the pallas interpreter on CPU
_FORCE_INTERPRET = False

_MAX_ROWS = 2048  # rows per call; the wrapper chunks larger row counts
# two tilings, picked by row count (compiled per shape anyway): decode
# (few rows) takes big slabs + wide tiles for efficient weight DMA; the
# many-row score path takes slim slabs so the (rows, slab) y block plus
# decode temps stay under the ~16 MB scoped-VMEM limit
_DECODE_ROWS = 64
_SLAB_DECODE, _OT_DECODE = 2048, 256
_SLAB_SCORE, _OT_SCORE = 1024, 128


def _slab_groups(G: int, g: int, target: int) -> int:
    """Largest divisor of G whose slab (Gt*g rows) fits the target."""
    best = 1
    for d in range(1, G + 1):
        if G % d == 0 and d * g <= max(target, g):
            best = d
    return best


def int4_matmul_fits(y_shape, qw4_shape) -> bool:
    """Shapes the kernel handles; callers fall back to the XLA grouped
    einsum otherwise."""
    G, g2, O = qw4_shape
    H = y_shape[-1]
    return (
        g2 >= 1
        and 2 * g2 * G == H
        # lane-dim tiles: full O when small, else clean 128-multiples
        and (O <= 512 or O % _OT_SCORE == 0)
    )


def _kernel(y_ref, pk_ref, qs_ref, o_ref):
    gi = pl.program_id(1)
    pk = pk_ref[...].astype(jnp.int32)  # (Gt, g2, Ot)
    # sign-extended nibble decode, split-halves order (pack_int4): a
    # CONCAT restores the group axis — no stride-2 interleave shuffle
    lo = jnp.right_shift(jnp.left_shift(pk, 28), 28)
    hi = jnp.right_shift(pk, 4)
    w = jnp.concatenate([lo, hi], axis=1)  # (Gt, g, Ot)
    Gt, g, Ot = w.shape
    # fold the per-(group, out-channel) scale at decode time: the dot
    # then needs no grouped partials
    w = w.astype(jnp.float32) * qs_ref[...].astype(jnp.float32)
    w = w.reshape(Gt * g, Ot).astype(y_ref.dtype)
    part = jax.lax.dot_general(
        y_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(gi == 0)
    def _init():
        o_ref[...] = part

    @pl.when(gi > 0)
    def _accum():
        o_ref[...] += part


def int4_matmul(y: jax.Array, qw4: jax.Array, qs: jax.Array,
                *, interpret: bool = False) -> jax.Array:
    """(..., H) @ packed (G, g/2, O) -> (..., O) f32."""
    lead = y.shape[:-1]
    H = y.shape[-1]
    G, g2, O = qw4.shape
    g = 2 * g2
    assert G * g == H, (y.shape, qw4.shape)
    R = int(np.prod(lead)) if lead else 1
    yr = y.reshape(R, H)
    if R > _MAX_ROWS:
        # chunk rows: each chunk re-pays the weight sweep + decode, but
        # amortized over >=_MAX_ROWS rows that is noise per row
        outs = [
            int4_matmul(yr[i : i + _MAX_ROWS], qw4, qs, interpret=interpret)
            for i in range(0, R, _MAX_ROWS)
        ]
        return jnp.concatenate(outs, axis=0).reshape(*lead, O)
    Rp = -(-R // 8) * 8
    if Rp != R:
        yr = jnp.pad(yr, ((0, Rp - R), (0, 0)))

    slab, ot = (
        (_SLAB_DECODE, _OT_DECODE) if R <= _DECODE_ROWS
        else (_SLAB_SCORE, _OT_SCORE)
    )
    Gt = _slab_groups(G, g, slab)
    n_g = G // Gt
    Ot = ot if O % ot == 0 else O
    n_o = O // Ot

    out = pl.pallas_call(
        _kernel,
        grid=(n_o, n_g),
        in_specs=[
            pl.BlockSpec((Rp, Gt * g), lambda o, gi: (0, gi)),
            pl.BlockSpec((Gt, g2, Ot), lambda o, gi: (gi, 0, o)),
            pl.BlockSpec((Gt, 1, Ot), lambda o, gi: (gi, 0, o)),
        ],
        out_specs=pl.BlockSpec((Rp, Ot), lambda o, gi: (0, o)),
        out_shape=jax.ShapeDtypeStruct((Rp, O), jnp.float32),
        # off-TPU always interprets: dispatch gating may route here in
        # tests without the module flag set
        interpret=interpret or _FORCE_INTERPRET
        or jax.default_backend() != "tpu",
    )(yr, qw4, qs)
    return out[:R].reshape(*lead, O)
