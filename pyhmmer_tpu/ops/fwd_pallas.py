"""Pallas TPU kernel for the Forward filter (odds-space, parser score).

Replaces the XLA-scan Forward (`ops.batch._forward_kernel`), which
round-trips its ``[P, B, M]`` carry through HBM on every length step and
pays ~6 transcendentals per DP cell for log-space ``logaddexp``.  Design
(mirrors the native C++ host kernel in ``csrc/hmmdp.cpp``, which mirrors
HMMER's odds-space striped Forward ``impl_sse/fwdback.c``):

* **odds space**: probabilities relative to the background null; each DP
  cell is ~8 multiply-adds on the VPU, no transcendentals.  Per-row
  rescaling by the running row maximum keeps float32 in range; the scale
  is accumulated per sequence in log space.
* **DD chain as an MXU matmul**: the within-row delete chain
  ``nd[k] = sum_{j<k} nm[j]*tMD[j]*prod tDD`` is a *constant* linear map
  of the match row, precomputed per profile as ``T_dd[j, k] =
  exp(tMD[j] + sum_{m=j+1}^{k-1} tDD[m])`` -- one ``[Mp, Mp] x [Mp, B]``
  matmul per row instead of a sequential (or log-depth associative) scan
  over model positions.
* **layout [M(sublanes), B(lanes)]**: specials (E/N/J/C/B) are ``[1, B]``
  lane vectors; the E collection is a sublane reduction.
* emission odds are gathered with a one-hot MXU matmul per row.
* matmuls run at DEFAULT (single-pass bf16) precision: ~0.03 nat score
  wobble, far inside the engine's device-side gate margin; reported
  scores always come from the exact float64 native rescoring.

Padding contract: sequence tails are nonresidue-coded (emission odds 0),
so dead rows hold zero mass; per-sequence specials freeze via the
length-mask select on ``[1, B]`` vectors only.
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
TINY = 1e-30


def _fwd_body(lens_ref, codes_ref, ems_ref, eis_ref, etr_ref, tdd_ref,
              lm_ref, out_ref, mrow, irow, drow, spec):
    """grid (P, nBt): one profile x one lane-tile of sequences."""
    L, Bt = codes_ref.shape
    Mp = ems_ref.shape[1]

    kcode = jax.lax.broadcasted_iota(jnp.int32, (KP_PAD, Bt), 0)

    # shifted transitions as [Mp, 1] columns (slot r = model state r+1;
    # row 0 of the rolled arrays is wrap garbage, killed by eMMs[0]=0)
    eMMs = etr_ref[0, :, 0:1]
    eIMs = etr_ref[0, :, 1:2]
    eDMs = etr_ref[0, :, 2:3]
    eBMs = etr_ref[0, :, 3:4]
    eMIa = etr_ref[0, :, 4:5]
    eIIa = etr_ref[0, :, 5:6]

    loop_o = lm_ref[0:1, :]     # [1, Bt] N/J/C loop odds (L/(L+3))
    move_o = lm_ref[1:2, :]     # [1, Bt] move odds (3/(L+3))
    log_loop = lm_ref[2:3, :]
    log_move = lm_ref[3:4, :]
    eE0 = jnp.float32(0.5)      # E->J (multihit)
    eE1 = jnp.float32(0.5)      # E->C

    mrow[...] = jnp.zeros((Mp, Bt), jnp.float32)
    irow[...] = jnp.zeros((Mp, Bt), jnp.float32)
    drow[...] = jnp.zeros((Mp, Bt), jnp.float32)
    # spec rows: 0=j 1=c 2=b 3=logscale 4=logN
    spec[...] = jnp.zeros((8, Bt), jnp.float32)
    spec[2:3, :] = move_o       # b_ = N->B move at row 0

    def row(i, _):
        codes_row = codes_ref[pl.ds(i, 1), :]                   # [1, Bt]
        onehot = (kcode == codes_row).astype(jnp.float32)       # [KP, Bt]
        ms = jax.lax.dot_general(
            ems_ref[0], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)                 # [Mp, Bt]
        is_ = jax.lax.dot_general(
            eis_ref[0], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

        j_ = spec[0:1, :]
        c_ = spec[1:2, :]
        b_ = spec[2:3, :]
        logscale = spec[3:4, :]
        logN = spec[4:5, :]

        rm = pltpu.roll(mrow[...], 1, 0)
        ri = pltpu.roll(irow[...], 1, 0)
        rd = pltpu.roll(drow[...], 1, 0)
        nm = ms * (rm * eMMs + ri * eIMs + rd * eDMs + b_ * eBMs)
        ni = is_ * (mrow[...] * eMIa + irow[...] * eIIa)
        nd = jax.lax.dot_general(
            tdd_ref[0], nm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)                 # [Mp, Bt]
        e = (jnp.sum(nm, axis=0, keepdims=True)
             + jnp.sum(nd, axis=0, keepdims=True))              # [1, Bt]
        nj = j_ * loop_o + e * eE0
        nc = c_ * loop_o + e * eE1
        nlogN = logN + log_loop
        n_scaled = jnp.exp(nlogN - logscale)
        nb = n_scaled * move_o + nj * move_o

        # rescale so float32 stays in range: divide by the row max of all
        # live mass (match row + specials), accumulate in log space
        mx = jnp.maximum(jnp.max(nm, axis=0, keepdims=True),
                         jnp.maximum(nj, nc))
        mx = jnp.maximum(mx, TINY)
        valid = (lens_ref[0:1, :] > i)                          # [1, Bt]
        inv = jnp.where(valid, 1.0 / mx, 1.0)
        nscale = jnp.where(valid, logscale + jnp.log(mx), logscale)

        spec[0:1, :] = jnp.where(valid, nj * inv, j_)
        spec[1:2, :] = jnp.where(valid, nc * inv, c_)
        spec[2:3, :] = jnp.where(valid, nb * inv, b_)
        spec[3:4, :] = nscale
        spec[4:5, :] = jnp.where(valid, nlogN, logN)
        mrow[...] = nm * inv
        irow[...] = ni * inv
        drow[...] = nd * inv
        return 0

    jax.lax.fori_loop(0, L, row, 0)
    c_ = spec[1:2, :]
    score = jnp.where(c_ > 0.0,
                      jnp.log(jnp.maximum(c_, TINY)) + spec[3:4, :]
                      + log_move,
                      NEGMASS)
    out_ref[...] = score[None]


@partial(jax.jit, static_argnames=())
def _fwd_pallas(lens, codes_t, ems, eis, etr, tdd, lm):
    """lens [1, B] i32; codes_t [L, B] i32; ems/eis [P, Mp, KP_PAD] f32;
    etr [P, Mp, 8] f32; tdd [P, Mp, Mp] f32; lm [4, B] f32.
    Returns Forward scores [P, B] f32 (nats)."""
    P, Mp, _ = ems.shape
    L, B = codes_t.shape
    Bt = min(B, 256)
    nBt = B // Bt
    grid = (P, nBt)
    out = pl.pallas_call(
        _fwd_body,
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
            pl.BlockSpec((1, Mp, Mp), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
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
    )(lens, codes_t, ems, eis, etr, tdd, lm)
    return out[:, 0, :]


def build_fwd_tensors(pb) -> dict:
    """Precompute the per-profile-stack odds tensors for the Pallas
    Forward kernels (HOST numpy; cached on the ``ProfileBatch``).  The
    v2 builder uploads the subset it needs -- the [P, Mp, Mp] v1 DD
    matrix alone would be hundreds of MB of HBM for a big-M stack."""
    if "fwdp" in pb._device_cache:
        return pb._device_cache["fwdp"]
    P, Mp = pb.P, ((pb.Mp + 7) // 8) * 8
    Kp = pb.Kp
    ems = np.zeros((P, Mp, KP_PAD), np.float32)
    eis = np.zeros((P, Mp, KP_PAD), np.float32)
    etr = np.zeros((P, Mp, 8), np.float32)
    tdd = np.zeros((P, Mp, Mp), np.float32)

    def xexp(a):
        a = np.asarray(a, np.float64)
        return np.where(a > -600.0, np.exp(np.minimum(a, 600.0)), 0.0)

    for i, prof in enumerate(pb.profiles):
        M = prof.M
        ems[i, :M, :Kp] = xexp(prof.msc[:, 1:]).T
        eis[i, :M, :Kp] = xexp(prof.isc[:, 1:]).T
        # shifted transitions: slot r multiplies rolled state r (node r)
        etr[i, 1:M, 0] = xexp(prof.tMM[1:M])
        etr[i, 1:M, 1] = xexp(prof.tIM[1:M])
        etr[i, 1:M, 2] = xexp(prof.tDM[1:M])
        etr[i, :M, 3] = xexp(prof.tBM[:M])
        # aligned insert transitions: slot r = state r+1 -> tMI[r+1]
        etr[i, : M - 1, 4] = xexp(prof.tMI[1:M])
        etr[i, : M - 1, 5] = xexp(prof.tII[1:M])
        # DD-chain transfer matrix: slot a (state j=a+1) -> slot b
        # (state k=b+1), logT = tMD[j] + sum_{m=j+1}^{k-1} tDD[m]
        tMD = np.where(np.isfinite(prof.tMD), prof.tMD, -np.inf)
        tDD = np.where(np.isfinite(prof.tDD), prof.tDD, -np.inf)
        c = np.zeros(M + 1)
        if M >= 2:
            c[2:] = np.cumsum(tDD[1: M])
        j = np.arange(1, M)                      # states 1..M-1
        with np.errstate(invalid="ignore"):
            logT = (tMD[j][:, None] + c[None, 2: M + 1]
                    - c[j + 1][:, None])         # [M-1, M-1] (k = 2..M)
        mask = (j[:, None] < np.arange(2, M + 1)[None, :])
        block = np.where(mask, logT, -np.inf)
        tdd[i, : M - 1, 1: M] = xexp(block)

    out = {"ems": ems, "eis": eis, "etr": etr, "tdd": tdd, "Mp": Mp}
    pb._device_cache["fwdp"] = out
    return out


def lm_rows(lengths: np.ndarray) -> np.ndarray:
    """Length-model rows [4, B] (loop/move odds + their logs) for the
    multihit target-length model pmove = 3/(L+3)."""
    L = np.maximum(lengths.astype(np.float64), 1.0)
    pmove = 3.0 / (L + 3.0)
    return np.stack([
        (1.0 - pmove), pmove, np.log(1.0 - pmove), np.log(pmove),
    ]).astype(np.float32)


# ---------------------------------------------------------------------------
# v2 kernel: folded transition matmul + strip-hoisted emission gathers
# ---------------------------------------------------------------------------
#
# The v1 kernel pays three sequential MXU matmuls per sequence row (two
# one-hot emission gathers + the DD-chain transfer) plus several VPU
# reductions -- at ~0.6 us/row the scan is LATENCY-bound, not FLOP-bound.
# v2 restructures the recurrence so the per-row critical path is ONE
# matmul + elementwise work:
#
# * the match recurrence folds the M->M shift AND the full M->D..D->M
#   delete-chain path into a single per-profile transfer matrix
#     Amm[j, k] = [j == k-1] * eMM[k] + eDM[k] * Tdd[j, k-1]
#   so  nm = ms * (Amm^T @ prev_nm + roll(prev_ni)*eIM + b*eBM)
# * the E collection needs nd only through its sum, and
#   sum_k nd[k] = sum_j (sum_k Tdd[j,k]) nm[j], so E = w_e . nm with the
#   precomputed weight row w_e = 1 + Tdd.sum(axis=1)
# * emission odds for R consecutive rows are gathered in ONE pair of
#   matmuls from strip-packed codes [L/R, R*B] (same layout trick as the
#   MSV kernel), taking the gathers off the per-row critical path
#
# The folded matmul runs at 3-pass bf16 (Precision.HIGH): relative error
# ~1e-6 per step, orders of magnitude inside the engine's device-gate
# margin (the exact float64 rescore happens on the host regardless).

def _strip_r_fwd(Mp: int, B: int) -> int:
    r = 32
    while r > 1 and Mp * r * B * 4 * 2 > (4 << 20):
        r //= 2
    return r


def _fwd2_body(lens_ref, codes_ref, ems_ref, eis_ref, etr_ref, sdd_ref,
               lm_ref, bnd_ref, out_ref, mrow, irow, spec, emstrip,
               eistrip, *, R):
    """grid (P, nBt): one profile x one lane tile of the survivor batch.

    Per-row critical path: the DD-path matmul consumes the PREVIOUS row's
    match vector (ready at iteration start, so Mosaic can overlap it with
    the previous row's tail ops); the M->M/I->M/B->M paths stay exact
    f32 elementwise; E collection is one weighted reduction; the N chain
    runs in linear odds (no per-row exp)."""
    nS, RB = codes_ref.shape
    Bt = RB // R
    Mp = ems_ref.shape[1]

    kcode = jax.lax.broadcasted_iota(jnp.int32, (KP_PAD, RB), 0)

    eMMs = etr_ref[0, :, 0:1]
    eIMs = etr_ref[0, :, 1:2]
    eBMs = etr_ref[0, :, 3:4]
    eMIa = etr_ref[0, :, 4:5]
    eIIa = etr_ref[0, :, 5:6]
    w_e = etr_ref[0, :, 6:7]        # 1 + Tdd.sum(axis=1)

    loop_o = lm_ref[0:1, :]
    move_o = lm_ref[1:2, :]
    log_move = lm_ref[3:4, :]
    eE0 = jnp.float32(0.5)
    eE1 = jnp.float32(0.5)
    sdd = sdd_ref[0]

    mrow[...] = jnp.zeros((Mp, Bt), jnp.float32)
    irow[...] = jnp.zeros((Mp, Bt), jnp.float32)
    # spec rows: 0=j 1=c 2=b 3=logscale 4=n (linear, same rescale as j/c)
    spec[...] = jnp.zeros((8, Bt), jnp.float32)
    spec[2:3, :] = move_o
    spec[4:5, :] = jnp.ones((1, Bt), jnp.float32)

    def strip(s, _):
        codes_row = codes_ref[pl.ds(s, 1), :]                  # [1, R*Bt]
        onehot = (kcode == codes_row).astype(jnp.float32)      # [KP, R*Bt]
        emstrip[...] = jax.lax.dot_general(
            ems_ref[0], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)               # [Mp, R*Bt]
        eistrip[...] = jax.lax.dot_general(
            eis_ref[0], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        for r in range(R):
            ms = emstrip[:, r * Bt:(r + 1) * Bt]
            is_ = eistrip[:, r * Bt:(r + 1) * Bt]
            j_ = spec[0:1, :]
            c_ = spec[1:2, :]
            b_ = spec[2:3, :]
            logscale = spec[3:4, :]
            n_ = spec[4:5, :]

            prev_m = mrow[...]
            prev_i = irow[...]
            # bf16 x bf16 -> f32: identical numerics to the previous f32
            # DEFAULT-precision dot (which rounds operands to bf16)
            ddp = jax.lax.dot_general(
                sdd, prev_m.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [Mp, Bt]
            rm = pltpu.roll(prev_m, 1, 0)
            ri = pltpu.roll(prev_i, 1, 0)
            nm = ms * (rm * eMMs + ri * eIMs + ddp + b_ * eBMs)
            ni = is_ * (prev_m * eMIa + prev_i * eIIa)
            e = jnp.sum(nm * w_e, axis=0, keepdims=True)       # [1, Bt]
            nj = j_ * loop_o + e * eE0
            nc = c_ * loop_o + e * eE1
            nn = n_ * loop_o
            nb = (nn + nj) * move_o

            i = s * R + r
            valid = (lens_ref[0:1, :] > i)
            if r % 2 == 1 or r == R - 1:
                # rescale on every 2nd row: one row's growth is bounded
                # by ~4x the max emission odds, far inside f32 range, so
                # normalizing to the row max every other row keeps the
                # representation safe while saving the max-reduce, log,
                # and three [Mp, Bt] scale multiplies on the skipped
                # rows.  The log-space bookkeeping stays exact.
                mx = jnp.maximum(jnp.max(nm, axis=0, keepdims=True),
                                 jnp.maximum(nj, nc))
                mx = jnp.maximum(mx, TINY)
                inv = jnp.where(valid, 1.0 / mx, 1.0)
                nscale = jnp.where(valid, logscale + jnp.log(mx),
                                   logscale)
                spec[0:1, :] = jnp.where(valid, nj * inv, j_)
                spec[1:2, :] = jnp.where(valid, nc * inv, c_)
                spec[2:3, :] = jnp.where(valid, nb * inv, b_)
                spec[3:4, :] = nscale
                spec[4:5, :] = jnp.where(valid, nn * inv, n_)
                mrow[...] = nm * inv
                irow[...] = ni * inv
            else:
                spec[0:1, :] = jnp.where(valid, nj, j_)
                spec[1:2, :] = jnp.where(valid, nc, c_)
                spec[2:3, :] = jnp.where(valid, nb, b_)
                spec[4:5, :] = jnp.where(valid, nn, n_)
                # dead lanes have ms = 0 (nonresidue emission odds), so
                # nm/ni are already zero there -- no mask needed
                mrow[...] = nm
                irow[...] = ni
        return 0

    # dynamic per-tile bound: every special freezes via the length mask
    # once i >= len, so stopping after the tile's longest sequence is
    # exact (tails are nonresidue-coded and hold zero emission odds).
    # With a [P, nBt] bounds matrix the bound is additionally per
    # PROFILE: a tile holding no survivors of profile p gets bound 0 and
    # its whole grid step collapses to the (NEGMASS) epilogue -- the
    # engine packs survivor lanes so most (p, tile) cells are dead.
    brow = pl.program_id(0) if bnd_ref.shape[0] > 1 else 0
    nS_b = jnp.minimum(bnd_ref[brow, pl.program_id(1)], nS)
    jax.lax.fori_loop(0, nS_b, strip, 0)
    c_ = spec[1:2, :]
    score = jnp.where(c_ > 0.0,
                      jnp.log(jnp.maximum(c_, TINY)) + spec[3:4, :]
                      + log_move,
                      NEGMASS)
    out_ref[...] = score[None]


@partial(jax.jit, static_argnames=("R", "Bt"))
def _fwd_pallas2(lens, codes_strips, ems, eis, etr, sdd, lm, bnd, R, Bt=0):
    """lens [1, B] i32; codes_strips [L/R, R*B] i32 (tile-major when
    Bt < B, see ``SeqDevice.strips``); ems/eis [P, Mp, KP_PAD] f32; etr
    [P, Mp, 8] f32 (slot 6 = w_e); sdd [P, Mp, Mp] f32 (pre-shifted
    eDM-scaled DD transfer); lm [4, B] f32; Bt = lane-tile width
    (0 = whole B).  Returns scores [P, B] f32 nats."""
    P, Mp, _ = ems.shape
    nS, RB = codes_strips.shape
    B = RB // R
    if not Bt:
        Bt = B
    out = pl.pallas_call(
        partial(_fwd2_body, R=R),
        grid=(P, B // Bt),
        in_specs=[
            pl.BlockSpec((1, Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nS, R * Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, KP_PAD), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, KP_PAD), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 8), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Mp), lambda p, b: (p, 0, 0),
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
            pltpu.VMEM((8, Bt), jnp.float32),
            pltpu.VMEM((Mp, R * Bt), jnp.float32),
            pltpu.VMEM((Mp, R * Bt), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(lens, codes_strips, ems, eis, etr, sdd, lm, bnd)
    return out[:, 0, :]


def _fwd3_body(lens_ref, codes_ref, ems_ref, eis_ref, etr_ref, sdd_ref,
               lm_ref, bnd_ref, out_ref, mrow, irow, jrow, crow, brow,
               nrow, lrow, *, Mp, gi):
    """Profile-STACKED Forward: grid ``(nBt,)``, every profile of the
    group resident in one FLAT ``[Pg*Mp, Bt]`` odds state (the same
    schedule transformation as ``msv_pallas._msv_body2``: the
    per-profile scan is row-latency-bound, stacking makes each row-step
    carry Pg independent chains).  Differences from the MSV case:

    * the DD-path matmul stays per-profile -- one BATCHED
      ``[Pg, Mp, Mp] x [Pg, Mp, Bt]`` dot per row (the reshape to 3-D is
      a layout no-op because Mp is a multiple of 8);
    * specials (J/C/B/N/logscale) are ``[Pg, Bt]`` rows; E-collection is
      a segmented weighted SUM-reduce;
    * the cross-profile roll wrap is killed by the transition weights
      (flat row 0 of each profile block has eMM/eIM/sdd-col 0), not by
      padding-row zeroness.

    Per-row math is identical to ``_fwd2_body`` (odds space, rescale to
    the per-profile row max every 2nd row)."""
    L, Bt = codes_ref.shape
    rows, KP = ems_ref.shape
    Pg = rows // Mp

    kcode = jax.lax.broadcasted_iota(jnp.int32, (KP_PAD, Bt), 0)
    eMMs = etr_ref[:, 0:1]
    eIMs = etr_ref[:, 1:2]
    eBMs = etr_ref[:, 3:4]
    eMIa = etr_ref[:, 4:5]
    eIIa = etr_ref[:, 5:6]
    w_e = etr_ref[:, 6:7]           # 1 + Tdd.sum(axis=1), [rows, 1]
    ems = ems_ref[...]              # [rows, KP] bf16
    eis = eis_ref[...]
    sdd3 = sdd_ref[...]             # [Pg, Mp, Mp] bf16

    loop_o = lm_ref[0:1, :]
    move_o = lm_ref[1:2, :]
    log_move = lm_ref[3:4, :]
    lens = lens_ref[0:1, :]

    mrow[...] = jnp.zeros((rows, Bt), jnp.float32)
    irow[...] = jnp.zeros((rows, Bt), jnp.float32)
    jrow[...] = jnp.zeros((Pg, Bt), jnp.float32)
    crow[...] = jnp.zeros((Pg, Bt), jnp.float32)
    brow[...] = jnp.zeros((Pg, Bt), jnp.float32) + move_o
    nrow[...] = jnp.ones((Pg, Bt), jnp.float32)
    lrow[...] = jnp.zeros((Pg, Bt), jnp.float32)

    def block(s2, _):
        for jr in range(2):
            i = s2 * 2 + jr
            codes_row = codes_ref[pl.ds(i, 1), :]               # [1, Bt]
            onehot = (kcode == codes_row).astype(jnp.bfloat16)  # [KP, Bt]
            ms = jax.lax.dot_general(
                ems, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [rows,Bt]
            is_ = jax.lax.dot_general(
                eis, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            j_ = jrow[...]
            c_ = crow[...]
            b_ = brow[...]
            n_ = nrow[...]
            logscale = lrow[...]
            prev_m = mrow[...]
            prev_i = irow[...]
            ddp = jax.lax.dot_general(
                sdd3, prev_m.astype(jnp.bfloat16).reshape(Pg, Mp, Bt),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).reshape(rows, Bt)
            rm = pltpu.roll(prev_m, 1, 0)
            ri = pltpu.roll(prev_i, 1, 0)
            bb = jnp.broadcast_to(b_.reshape(Pg, 1, Bt),
                                  (Pg, Mp, Bt)).reshape(rows, Bt)
            nm = ms * (rm * eMMs + ri * eIMs + ddp + bb * eBMs)
            ni = is_ * (prev_m * eMIa + prev_i * eIIa)
            e = jnp.sum((nm * w_e).reshape(Pg, Mp, Bt), axis=1)  # [Pg,Bt]
            nj = j_ * loop_o + e * 0.5
            nc = c_ * loop_o + e * 0.5
            nn = n_ * loop_o
            nb = (nn + nj) * move_o
            valid = lens > i                                     # [1, Bt]
            if jr == 1:
                # rescale on every 2nd row (same cadence + semantics as
                # _fwd2_body: per-profile row max, exact log bookkeeping)
                mx = jnp.maximum(
                    jnp.max(nm.reshape(Pg, Mp, Bt), axis=1),
                    jnp.maximum(nj, nc))
                mx = jnp.maximum(mx, TINY)
                inv = jnp.where(valid, 1.0 / mx, 1.0)
                lrow[...] = jnp.where(valid, logscale + jnp.log(mx),
                                      logscale)
                jrow[...] = jnp.where(valid, nj * inv, j_)
                crow[...] = jnp.where(valid, nc * inv, c_)
                brow[...] = jnp.where(valid, nb * inv, b_)
                nrow[...] = jnp.where(valid, nn * inv, n_)
                invb = jnp.broadcast_to(inv.reshape(Pg, 1, Bt),
                                        (Pg, Mp, Bt)).reshape(rows, Bt)
                mrow[...] = nm * invb
                irow[...] = ni * invb
            else:
                jrow[...] = jnp.where(valid, nj, j_)
                crow[...] = jnp.where(valid, nc, c_)
                brow[...] = jnp.where(valid, nb, b_)
                nrow[...] = jnp.where(valid, nn, n_)
                # dead lanes have ms = 0 (nonresidue emission odds)
                mrow[...] = nm
                irow[...] = ni
        return 0

    nB_b = jnp.minimum(bnd_ref[gi, pl.program_id(0)], L // 2)
    jax.lax.fori_loop(0, nB_b, block, 0)
    c_ = crow[...]
    score = jnp.where(c_ > 0.0,
                      jnp.log(jnp.maximum(c_, TINY)) + lrow[...]
                      + log_move,
                      NEGMASS)
    out_ref[...] = score


@partial(jax.jit, static_argnames=("Mp", "Bt", "gi"))
def _fwd_pallas3(lens, codes_t, ems, eis, etr, sdd, lm, bnd, Mp, Bt=128,
                 gi=0):
    """Stacked-profile Forward launcher: lens [1, B] i32; codes_t [L, B]
    i32 (L a multiple of 2, nonresidue-padded); ems/eis [Pg*Mp, KP_PAD]
    bf16 flat odds; etr [Pg*Mp, 8] f32 flat transitions; sdd
    [Pg, Mp, Mp] bf16; lm [4, B] f32; bnd [1, B/Bt] i32 per-tile bounds
    in 2-row blocks.  Returns scores [Pg, B] f32 nats."""
    rows, KP = ems.shape
    Pg = rows // Mp
    L, B = codes_t.shape
    Bt = min(Bt, B)
    out = pl.pallas_call(
        partial(_fwd3_body, Mp=Mp, gi=gi),
        grid=(B // Bt,),
        in_specs=[
            pl.BlockSpec((1, Bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, KP), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, KP), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 8), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pg, Mp, Mp), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bnd [1, nBt], full
        ],
        out_specs=pl.BlockSpec((Pg, Bt), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pg, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, Bt), jnp.float32),
            pltpu.VMEM((rows, Bt), jnp.float32),
        ] + [pltpu.VMEM((rows // Mp, Bt), jnp.float32)] * 5,
        interpret=_INTERPRET,
    )(lens, codes_t, ems, eis, etr, sdd, lm, bnd)
    return out


def fwd_stack_rows(Lmax: int) -> int:
    """Stacked-row cap for the Forward kernel: ~10 live [rows, Bt] f32
    buffers per row step (two state planes + emission/DD/roll/broadcast
    temporaries) plus the double-buffered codes block."""
    if Lmax <= 512:
        return 1536
    if Lmax <= 2048:
        return 1152
    return 576


def build_fwd_tensors3(pb, cap: int) -> dict:
    """Per-group flat tensors for the STACKED Forward kernel, pre-split
    and uploaded once (same rationale as ``build_msv_tensors2``)."""
    key = ("fwdp3", cap)
    if key in pb._device_cache:
        return pb._device_cache[key]
    t1 = build_fwd_tensors(pb)
    t2 = build_fwd_tensors2(pb)
    P, Mp = pb.P, t1["Mp"]
    ems = np.asarray(t1["ems"])                     # [P, Mp, KP] f32
    eis = np.asarray(t1["eis"])
    etr2 = np.asarray(t2["etr2"])                   # [P, Mp, 8]
    sdd = np.asarray(t2["sdd"])                     # [P, Mp, Mp] bf16
    Pg = max(1, cap // Mp)
    groups = []
    for p0 in range(0, P, Pg):
        n = min(Pg, P - p0)
        groups.append((
            jnp.asarray(ems[p0:p0 + n].reshape(-1, KP_PAD), jnp.bfloat16),
            jnp.asarray(eis[p0:p0 + n].reshape(-1, KP_PAD), jnp.bfloat16),
            jnp.asarray(etr2[p0:p0 + n].reshape(-1, 8)),
            jnp.asarray(sdd[p0:p0 + n]),
        ))
    out = {"groups": groups, "Mp": Mp, "Pg": Pg}
    pb._device_cache[key] = out
    return out


def build_fwd_tensors2(pb) -> dict:
    """v2 tensors: v1 tensors + the pre-shifted eDM-scaled DD transfer
    matrix Sdd[j, k] = eDM[k] * Tdd[j, k-1] (so the per-row DD-path
    matmul consumes the PREVIOUS row's match vector) and the E-collection
    weight row w_e = 1 + Tdd.sum(axis=1) (etr slot 6)."""
    if "fwdp2" in pb._device_cache:
        return pb._device_cache["fwdp2"]
    t1 = build_fwd_tensors(pb)
    P, Mp = pb.P, t1["Mp"]
    etr = t1["etr"].copy()
    tdd = t1["tdd"]
    sdd = np.zeros((P, Mp, Mp), np.float32)
    for i in range(P):
        eDM = etr[i, :, 2]
        sdd[i, :, 1:] = eDM[None, 1:] * tdd[i, :, : Mp - 1]
        etr[i, :, 6] = 1.0 + tdd[i].sum(axis=1)
    # sdd rides the MXU at single-pass bf16 anyway (DEFAULT precision
    # rounds f32 operands to bf16), so storing it bf16 halves its HBM
    # footprint and -- critically -- its double-buffered VMEM block,
    # which at Mp~900 is what blows the 16 MB scoped-VMEM budget
    out = {"Mp": Mp,
           "ems": jnp.asarray(t1["ems"]), "eis": jnp.asarray(t1["eis"]),
           "etr2": jnp.asarray(etr),
           "sdd": jnp.asarray(sdd, jnp.bfloat16)}
    pb._device_cache["fwdp2"] = out
    return out
