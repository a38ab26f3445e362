"""Pallas TPU kernel for the quantized MSV filter.

The first gate of the cascade: every (profile, target) pair runs this,
so it dominates device time.  Reproduces HMMER's uint8 MSV semantics
(``p7_MSVFilter`` / ``mf_conversion``: 1/3-bit quantized costs, base 190,
saturating add/sub, E->J wing) in float32 arithmetic -- all quantities
are small integers, exactly representable even through single-pass-bf16
MXU matmuls (integers < 256 are exact in bf16).

Layout (same scheme as ``ops.fwd_pallas``):

* state ``mpv[Mp(sublanes), Bt(lanes)]`` resident in VMEM across the
  whole length scan -- no HBM carry round-trips
* specials (xJ, xB) are ``[1, Bt]`` lane vectors; the per-row E
  collection is a sublane max-reduction
* per-row emission costs gathered by a one-hot MXU matmul
* padding rows are nonresidue-coded (cost 255): they zero the DP state
  and cannot raise xJ, so no length masking is needed in the loop

Sequence tails must be filled with the alphabet's nonresidue code.
"""

from __future__ import annotations

import numpy as np
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEGMASS = -1e30
KP_PAD = 32   # Kp=29 padded to an MXU-friendly contraction size


def _msv_body(codes_ref, cost_ref, tjb_ref, scal_ref, out_ref, ovf_ref,
              mpv, xj):
    """grid (P, nBt): one profile x one lane-tile of sequences."""
    L, Bt = codes_ref.shape
    Mp = cost_ref.shape[1]
    p = pl.program_id(0)
    bias = scal_ref[p, 0]
    tec = scal_ref[p, 1]
    tbm = scal_ref[p, 2]
    base = jnp.float32(190.0)

    kcode = jax.lax.broadcasted_iota(jnp.int32, (KP_PAD, Bt), 0)
    # row 0 of the rolled carry is wrap garbage; first_row masks it to the
    # diagonal-entry value
    first_row = (jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0) == 0)

    mpv[...] = jnp.zeros((Mp, Bt), jnp.float32)
    xj[...] = jnp.zeros((1, Bt), jnp.float32)
    tjb = tjb_ref[0:1, :]                                    # [1, Bt]
    xb0 = jnp.maximum(base - tjb, 0.0)

    def row(i, xb):
        codes_row = codes_ref[pl.ds(i, 1), :]                # [1, Bt]
        onehot = (kcode == codes_row).astype(jnp.float32)    # [KP, Bt]
        cost = jax.lax.dot_general(
            cost_ref[0], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [Mp, Bt]
        xbv = jnp.maximum(xb - tbm, 0.0)                     # [1, Bt]
        rolled = pltpu.roll(mpv[...], 1, 0)
        sv = jnp.maximum(jnp.where(first_row, xbv, rolled), xbv)
        sv = jnp.minimum(sv + bias, 255.0)                   # saturating add
        sv = jnp.maximum(sv - cost, 0.0)                     # saturating sub
        xe = jnp.max(sv, axis=0, keepdims=True)              # [1, Bt]
        xj[...] = jnp.maximum(xj[...], xe - tec)
        mpv[...] = sv
        return jnp.maximum(base, xj[...]) - tjb

    jax.lax.fori_loop(0, L, row, xb0)
    out_ref[...] = (xj[...] - base)[None]
    ovf_ref[...] = (xj[...] >= 255.0 - bias - tec).astype(jnp.float32)[None]


@partial(jax.jit, static_argnames=())
def _msv_pallas(codes_t, cost, tjb, scal):
    """codes_t [L, B] int32 (nonresidue-padded); cost [P, Mp, KP_PAD] f32
    quantized biased costs (255 in padding); tjb [1, B] f32;
    scal [P, 4] f32 (bias, tec, tbm, -).
    Returns (xJ - base) [P, B] f32 and overflow flags [P, B] f32."""
    P, Mp, _ = cost.shape
    L, B = codes_t.shape
    Bt = min(B, 512)
    grid = (P, B // Bt)
    out, ovf = pl.pallas_call(
        _msv_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, KP_PAD), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal [P, 4], full
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Bt), lambda p, b: (p, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Bt), lambda p, b: (p, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((P, 1, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Mp, Bt), jnp.float32),
            pltpu.VMEM((1, Bt), jnp.float32),
        ],
    )(codes_t, cost, tjb, scal)
    return out[:, 0, :], ovf[:, 0, :]


def build_msv_tensors(pb) -> dict:
    """Per-profile-stack quantized cost tensors for the Pallas MSV kernel
    (cached on the ``ProfileBatch``)."""
    if "msvp" in pb._device_cache:
        return pb._device_cache["msvp"]
    P, Mp = pb.P, ((pb.Mp + 7) // 8) * 8
    cost = np.full((P, Mp, KP_PAD), 255.0, dtype=np.float32)
    cost[:, : pb.Mp, : pb.Kp] = np.transpose(pb.msv_cost, (0, 2, 1))
    scal = np.stack([pb.msv_bias, pb.msv_tec, pb.msv_tbm,
                     np.zeros(pb.P, np.float32)], axis=1).astype(np.float32)
    out = {"cost": jnp.asarray(cost), "scal": jnp.asarray(scal)}
    pb._device_cache["msvp"] = out
    return out


def msv_scores_pallas(pb, codes: np.ndarray, lengths: np.ndarray,
                      dev=None) -> np.ndarray:
    """Drop-in replacement for ``ops.batch.msv_scores`` running the
    Pallas kernel.  Returns usc[P, B] float64 nats (inf on overflow)."""
    from . import batch as _batch
    B, Lmax = codes.shape
    if dev is None:
        dev = _batch.SeqDevice(codes, lengths)
    t = build_msv_tensors(pb)
    dx, ovf = _msv_pallas(dev.codes_t, t["cost"], dev.tjb_row, t["scal"])
    usc = np.asarray(dx, np.float64)[:, :B] / pb.scale_b - 3.0
    usc[np.asarray(ovf)[:, :B] > 0] = np.inf
    return usc
