"""Pallas TPU kernel for the Viterbi filter (log-space max-plus).

Replaces the XLA-scan Viterbi (`ops.batch._viterbi_kernel`).  Same layout
scheme as ``ops.fwd_pallas`` ([M sublanes, B lanes], VMEM-resident carry,
[1, B] specials), but stays in log space -- max-plus cells need no
transcendentals and no rescaling.  The within-row DD chain is a max-plus
prefix scan over the sublane dimension, computed in log2(Mp) shifted-max
levels (a tropical matmul cannot ride the MXU).

Emission scores are gathered by a one-hot matmul at HIGHEST precision
(log values must not be truncated to bf16: the Viterbi F2 gate is strict).
Sequence tails must be nonresidue-coded (emission = NEGMASS kills the
state rows); per-sequence specials freeze via the length mask.

Reference semantics: float-exact ``p7_ViterbiFilter`` scores
(``ops.reference.viterbi_score``), multihit local config.
"""

from __future__ import annotations

import numpy as np
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
# CPU CI escape hatch: run the kernels through the Pallas
# interpreter (tests/test_pallas_kernels.py) so layout/DP
# regressions are caught without TPU hardware.
_INTERPRET = _os.environ.get("PYHMMER_TPU_PALLAS_INTERPRET", "0") == "1"

NEGMASS = -1e30
KP_PAD = 32


def _vit_body(lens_ref, codes_ref, msc_ref, isc_ref, tr_ref, lm_ref,
              bnd_ref, out_ref, mrow, irow, drow, spec):
    """grid (P, nBt): one profile x one lane-tile of sequences."""
    L, Bt = codes_ref.shape
    Mp = msc_ref.shape[1]

    kcode = jax.lax.broadcasted_iota(jnp.int32, (KP_PAD, Bt), 0)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)

    # [Mp, 1] transition columns (slot r = model state r+1; shifted rows
    # carry NEGMASS at r=0 to kill roll wrap)
    tMMs = tr_ref[0, :, 0:1]
    tIMs = tr_ref[0, :, 1:2]
    tDMs = tr_ref[0, :, 2:3]
    tBMs = tr_ref[0, :, 3:4]
    tMIa = tr_ref[0, :, 4:5]
    tIIa = tr_ref[0, :, 5:6]
    amd = tr_ref[0, :, 6:7]     # tMD[state r+1] - cdd[state r+2]
    cddv = tr_ref[0, :, 7:8]    # cdd[state r+1]

    loop = lm_ref[2:3, :]       # [1, Bt] log loop
    move = lm_ref[3:4, :]       # [1, Bt] log move
    xEjc = jnp.float32(np.log(0.5))

    neg = jnp.full((Mp, Bt), NEGMASS, jnp.float32)
    mrow[...] = neg
    irow[...] = neg
    drow[...] = neg
    # spec rows: 0=xN 1=xB 2=xJ 3=xC
    spec[...] = jnp.full((8, Bt), NEGMASS, jnp.float32)
    spec[0:1, :] = jnp.zeros((1, Bt), jnp.float32)
    spec[1:2, :] = move

    def row(i, _):
        codes_row = codes_ref[pl.ds(i, 1), :]
        onehot = (kcode == codes_row).astype(jnp.float32)
        ms = jax.lax.dot_general(
            msc_ref[0], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)               # [Mp, Bt]
        is_ = jax.lax.dot_general(
            isc_ref[0], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        xN = spec[0:1, :]
        xB = spec[1:2, :]
        xJ = spec[2:3, :]
        xC = spec[3:4, :]

        rm = pltpu.roll(mrow[...], 1, 0)
        ri = pltpu.roll(irow[...], 1, 0)
        rd = pltpu.roll(drow[...], 1, 0)
        nm = ms + jnp.maximum(
            jnp.maximum(rm + tMMs, ri + tIMs),
            jnp.maximum(rd + tDMs, xB + tBMs))
        ni = is_ + jnp.maximum(mrow[...] + tMIa, irow[...] + tIIa)

        # DD chain: max-plus prefix scan over sublanes
        a = nm + amd
        sh = 1
        while sh < Mp:
            rolled = pltpu.roll(a, sh, 0)
            a = jnp.maximum(a, jnp.where(row_id >= sh, rolled, NEGMASS))
            sh *= 2
        accs = pltpu.roll(a, 1, 0)
        nd = jnp.where(row_id == 0, NEGMASS, accs + cddv)

        xE = jnp.maximum(jnp.max(nm, axis=0, keepdims=True),
                         jnp.max(nd, axis=0, keepdims=True))
        nJ = jnp.maximum(xJ + loop, xE + xEjc)
        nC = jnp.maximum(xC + loop, xE + xEjc)
        nN = xN + loop
        nB = jnp.maximum(nN, nJ) + move

        valid = (lens_ref[0:1, :] > i)
        spec[0:1, :] = jnp.where(valid, nN, xN)
        spec[1:2, :] = jnp.where(valid, nB, xB)
        spec[2:3, :] = jnp.where(valid, nJ, xJ)
        spec[3:4, :] = jnp.where(valid, nC, xC)
        mrow[...] = nm
        irow[...] = ni
        drow[...] = nd
        return 0

    # dynamic per-tile bound: specials freeze via the length mask once
    # i >= len, so stopping after the tile's longest sequence is exact.
    # [P, nBt] bounds additionally skip (profile, tile) cells with no
    # survivors of that profile (bound 0; see fwd_pallas._fwd2_body)
    brow = pl.program_id(0) if bnd_ref.shape[0] > 1 else 0
    nL_b = jnp.minimum(bnd_ref[brow, pl.program_id(1)], L)
    jax.lax.fori_loop(0, nL_b, row, 0)
    out_ref[...] = (spec[3:4, :] + move)[None]


@partial(jax.jit, static_argnames=())
def _vit_pallas(lens, codes_t, msc, isc, tr, lm, bnd):
    """lens [1, B] i32; codes_t [L, B] i32; msc/isc [P, Mp, KP_PAD] f32
    log scores; tr [P, Mp, 8] f32; lm [4, B] f32; bnd [1, B/Bt] i32
    per-lane-tile row bounds.  Returns Viterbi scores [P, B] f32 (nats)."""
    P, Mp, _ = msc.shape
    L, B = codes_t.shape
    # the lane tile is fixed by the caller's per-tile bounds row: bnd has
    # one entry per tile, so Bt = B // nBt.  (Deriving it independently
    # here once dropped every lane past the first tile when B was not a
    # multiple of the guessed tile width.)
    nBt = bnd.shape[1]
    Bt = B // nBt
    assert Bt * nBt == B, (B, nBt)
    grid = (P, nBt)
    out = pl.pallas_call(
        _vit_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, KP_PAD), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, KP_PAD), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 8), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bnd [1, nBt], full
        ],
        out_specs=pl.BlockSpec((1, 1, Bt), lambda p, b: (p, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Mp, Bt), jnp.float32),
            pltpu.VMEM((Mp, Bt), jnp.float32),
            pltpu.VMEM((Mp, Bt), jnp.float32),
            pltpu.VMEM((8, Bt), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(lens, codes_t, msc, isc, tr, lm, bnd)
    return out[:, 0, :]


def build_vit_tensors(pb) -> dict:
    """Per-profile-stack log-score tensors for the Pallas Viterbi kernel
    (cached on the ``ProfileBatch``)."""
    if "vitp" in pb._device_cache:
        return pb._device_cache["vitp"]
    P, Mp = pb.P, ((pb.Mp + 7) // 8) * 8
    Kp = pb.Kp
    msc = np.full((P, Mp, KP_PAD), NEGMASS, np.float32)
    isc = np.full((P, Mp, KP_PAD), NEGMASS, np.float32)
    tr = np.full((P, Mp, 8), NEGMASS, np.float32)

    def cl(a):
        return np.where(np.isfinite(a), a, NEGMASS)

    for i, prof in enumerate(pb.profiles):
        M = prof.M
        msc[i, :M, :Kp] = cl(prof.msc[:, 1:]).T
        isc[i, :M, :Kp] = cl(prof.isc[:, 1:]).T
        tr[i, 1:M, 0] = cl(prof.tMM[1:M])
        tr[i, 1:M, 1] = cl(prof.tIM[1:M])
        tr[i, 1:M, 2] = cl(prof.tDM[1:M])
        tr[i, :M, 3] = cl(prof.tBM[:M])
        tr[i, : M - 1, 4] = cl(prof.tMI[1:M])
        tr[i, : M - 1, 5] = cl(prof.tII[1:M])
        # DD prefix-scan constants (cf. ops.reference._dd_chain_max):
        # c[k] = sum tDD[1..k-1]; a[j] = nm[j] + tMD[j] - c[j+1];
        # D[k] = cummax(a)[k-1] + c[k].  Slot r = state r+1.
        tMD = cl(prof.tMD)
        tDD = np.where(np.isfinite(prof.tDD), prof.tDD, NEGMASS)
        c = np.zeros(M + 1)
        if M >= 2:
            c[2:] = np.cumsum(tDD[1:M])
        # amd[r] = tMD[state r+1] - c[state r+2], valid for states 1..M-1
        states = np.arange(1, M)
        tr[i, : M - 1, 6] = (tMD[states] - c[states + 1]).astype(np.float32)
        # cddv[r] = c[state r+1], valid for states 2..M (slots 1..M-1)
        tr[i, 1:M, 7] = c[2: M + 1].astype(np.float32)
    out = {"msc": jnp.asarray(msc), "isc": jnp.asarray(isc),
           "tr": jnp.asarray(tr)}
    pb._device_cache["vitp"] = out
    return out
