"""Pallas TPU kernel for the quantized MSV filter.

The XLA-scan version of the MSV DP (ops.batch._msv_kernel) is HBM-bound:
every scan step round-trips the [P, B, M] carry through HBM.  This kernel
keeps the whole DP state resident in VMEM for the full length scan and
streams only the sequence codes, putting the inner loop at VPU speed:

* grid = (P,): one program per profile (sequential on a TPU core)
* carry ``mpv[B, M]`` f32 in VMEM scratch; specials ``xJ/xB`` as [B, 1]
* emission costs gathered by a one-hot MXU matmul per row
* saturation semantics match ``ops.quantize`` / the uint8 reference:
  values clamp at 0; overflow (>= 255 - bias) is flagged and reported as
  +inf score (certain filter pass)

Padding contract: sequence tails must be filled with the alphabet's
nonresidue code (cost 255) -- dead rows then cannot change xJ, so no
explicit length masking is needed inside the DP.
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


def _msv_body(codes_ref, adj_ref, tjb_ref, scal_ref, out_ref, ovf_ref,
              mpv, xj, xb):
    """One profile vs a [B]-batch of sequences, scanning L rows."""
    L, B = codes_ref.shape
    M = adj_ref.shape[2]   # adj block is (1, KP_PAD, M)
    p = pl.program_id(0)
    bias = scal_ref[p, 0]
    tec = scal_ref[p, 1]
    tbm = scal_ref[p, 2]
    base = jnp.float32(190.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    first_lane = lane == 0
    kcode = jax.lax.broadcasted_iota(jnp.int32, (KP_PAD, B), 0)

    mpv[...] = jnp.zeros((B, M), jnp.float32)
    xj[...] = jnp.zeros((B, 1), jnp.float32)
    xb[...] = jnp.maximum(base - tjb_ref[...], 0.0)

    def row(i, _):
        codes_row = codes_ref[pl.ds(i, 1), :]                  # [1, B]
        onehot_t = (kcode == codes_row).astype(jnp.float32)    # [KP_PAD, B]
        adj_row = jax.lax.dot_general(
            onehot_t, adj_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [B, M]
        xbv = jnp.maximum(xb[...] - tbm, 0.0)                  # [B, 1]
        rolled = pltpu.roll(mpv[...], 1, 1)
        sv = jnp.where(first_lane, xbv, jnp.maximum(rolled, xbv))
        sv = jnp.maximum(sv + adj_row, 0.0)
        xe = jnp.max(sv, axis=1, keepdims=True)                # [B, 1]
        # overflow need not be tracked per row: xj is the running max of
        # (xe - tec), so the final xj certifies whether any row crossed
        # the uint8 ceiling
        xj[...] = jnp.maximum(xj[...], xe - tec)
        xb[...] = jnp.maximum(base, xj[...]) - tjb_ref[...]
        mpv[...] = sv
        return 0

    jax.lax.fori_loop(0, L, row, 0)
    out_ref[...] = (xj[...].T - base)[None]
    ovf_ref[...] = (xj[...] >= 255.0 - bias - tec).astype(
        jnp.float32).T[None]


@partial(jax.jit, static_argnames=())
def _msv_pallas(codes_t, adj, tjb, scal):
    """codes_t [L, B] int32 (nonresidue-padded), adj [P, KP_PAD, M] f32
    (= bias - cost), tjb [B, 1] f32, scal [P, 4] f32 (bias, tec, tbm, -).
    Returns (xJ - base) [P, B] f32 and overflow [P, B] f32."""
    P, _, M = adj.shape
    L, B = codes_t.shape
    grid = (P,)
    out, ovf = pl.pallas_call(
        _msv_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, B), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP_PAD, M), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal [P, 4], full
        ],
        out_specs=(
            pl.BlockSpec((1, 1, B), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((P, 1, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, M), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
    )(codes_t, adj, tjb, scal)
    return out[:, 0, :], ovf[:, 0, :]


def msv_scores_pallas(pb, codes: np.ndarray, lengths: np.ndarray,
                      dev=None) -> np.ndarray:
    """Drop-in replacement for ``ops.batch.msv_scores`` running the
    Pallas kernel.  Returns usc[P, B] float64 nats (inf on overflow).

    Requires B to be a multiple of 8 (the bucket packer guarantees it);
    ``dev`` is an ``ops.batch.SeqDevice`` holding device-resident codes.
    """
    from . import batch as _batch
    B, Lmax = codes.shape
    scale = pb.scale_b
    Mp = ((pb.Mp + 127) // 128) * 128
    P = pb.P
    if dev is None:
        dev = _batch.SeqDevice(codes, lengths)
    assert dev.B % 8 == 0, "bucket batch size must be 8-aligned"

    if "pallas_adj" not in pb._device_cache:
        adj = np.full((P, KP_PAD, Mp), -255.0, dtype=np.float32)
        adj[:, : pb.Kp, : pb.Mp] = (pb.msv_bias[:, None, None]
                                    - pb.msv_cost)
        scal = np.stack([pb.msv_bias, pb.msv_tec, pb.msv_tbm,
                         np.zeros(P, np.float32)], axis=1).astype(np.float32)
        pb._device_cache["pallas_adj"] = jnp.asarray(adj)
        pb._device_cache["pallas_scal"] = jnp.asarray(scal)
    dx, ovf = _msv_pallas(dev.codes_t, pb._device_cache["pallas_adj"],
                          dev.tjb_col, pb._device_cache["pallas_scal"])
    usc = np.asarray(dx, np.float64)[:, :B] / scale - 3.0
    usc[np.asarray(ovf)[:, :B] > 0] = np.inf
    return usc
