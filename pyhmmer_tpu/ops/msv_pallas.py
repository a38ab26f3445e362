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

import os as _os
# CPU CI escape hatch: run the kernels through the Pallas
# interpreter (tests/test_pallas_kernels.py) so layout/DP
# regressions are caught without TPU hardware.
_INTERPRET = _os.environ.get("PYHMMER_TPU_PALLAS_INTERPRET", "0") == "1"

NEGMASS = -1e30
KP_PAD = 32   # Kp=29 padded to an MXU-friendly contraction size


def _strip_r(Mp: int, Bt: int) -> int:
    """Rows per matmul strip: as many as fit a ~4 MB VMEM strip buffer."""
    r = 8
    while r > 1 and Mp * r * Bt * 4 > (4 << 20):
        r //= 2
    return r


_TILE_BUDGET = int(_os.environ.get("PYHMMER_TPU_TILE_BUDGET",
                                   str(1 << 19)))


def _lane_tile(Lmax: int, Bpad: int, budget: int = 0) -> int:
    budget = budget or _TILE_BUDGET
    """Lane-tile width for the scan kernels: the widest power-of-two tile
    whose whole-length codes block stays within ``budget`` int32 elements
    (~2 MB VMEM at the default), dividing ``Bpad``, >= 128.  Wider tiles
    amortize the per-row scan latency over more lanes (lanes are nearly
    free; rows x grid steps are the cost), narrower tiles bound VMEM for
    long-sequence buckets."""
    bt = 128
    while (bt * 2 <= Bpad and Bpad % (bt * 2) == 0
           and Lmax * bt * 2 <= budget):
        bt *= 2
    return min(bt, Bpad) if Bpad >= 128 else Bpad


def _msv_body(codes_ref, cost_ref, tjb_ref, scal_ref, bnd_ref, odds_ref,
              p1_ref, out_ref, ovf_ref, bias_ref, mpv, xj, st, *, R):
    """grid (P, nBt): one profile x one lane tile of the bucket.

    ``codes_ref`` is strip-packed ``[L/R, R*Bt]`` (host layout: row s holds
    sequence rows s*R..s*R+R-1 concatenated along lanes), so the one-hot
    emission gather runs ONE ``[Mp,KP]x[KP,R*Bt]`` MXU matmul per R rows
    instead of a skinny latency-bound matmul per row.

    The 2-state composition bias filter rides along in the same scan
    (``st`` rows: 0=a0, 1=a1, 2=logsc, 3=started): its per-row update is
    [1, Bt] lane work next to the [Mp, Bt] MSV cells, so the whole bias
    stage costs ~1/Mp of the MSV pass instead of a separate host scan
    over every MSV survivor.  ``odds_ref[p, code]`` holds the smoothed
    compo emission odds with 0 at the nonresidue code as the padding
    freeze sentinel.  f32 scores; the caller re-checks gate-boundary
    lanes against the exact f64 host filter."""
    nS, RBt = codes_ref.shape
    Bt = RBt // R
    Mp = cost_ref.shape[1]
    p = pl.program_id(0)
    bias = scal_ref[p, 0]
    tec = scal_ref[p, 1]
    tbm = scal_ref[p, 2]
    base = jnp.float32(190.0)

    kcode = jax.lax.broadcasted_iota(jnp.int32, (KP_PAD, RBt), 0)
    costb_bf16 = cost_ref[0].astype(jnp.bfloat16)
    odds_row = odds_ref[0]                                   # [1, KP]

    mpv[...] = jnp.zeros((Mp, Bt), jnp.float32)
    xj[...] = jnp.zeros((1, Bt), jnp.float32)
    tjb = tjb_ref[0:1, :]                                    # [1, Bt]
    xb0 = jnp.maximum(base - tjb, 0.0)

    # bias-filter state + per-lane transitions (state-0 dwell p1,
    # state-1 mean dwell 50; entry pi=(0.999, 0.001) applied at the
    # first valid residue via the `started` row)
    t00 = p1_ref[0:1, :]                                     # [1, Bt]
    t01 = 1.0 - t00
    t11 = jnp.float32(50.0 / 51.0)
    t10 = jnp.float32(1.0 / 51.0)
    st[...] = jnp.zeros((8, Bt), jnp.float32)
    st[0:1, :] = jnp.ones((1, Bt), jnp.float32)

    # The uint8 saturations are elided from the row loop: costs come in
    # pre-biased (costb = cost - bias), and whenever the 255 clamp COULD
    # have mattered the final overflow flag (xJ >= 255 - bias - tec,
    # i.e. some row max reached 255 - bias) fires and the pair is
    # treated as certainly-passing, so clamped and unclamped DPs agree
    # on every non-flagged output.  Row 0's roll wrap reads a guaranteed
    # padding row (costb = 255 - bias keeps its state at 0), replacing
    # the first-row select.
    def strip(s, xb):
        codes_row = codes_ref[pl.ds(s, 1), :]                # [1, R*Bt]
        onehot = (kcode == codes_row).astype(jnp.bfloat16)   # [KP, R*Bt]
        # integer-valued bf16 inputs (|x|<256) keep f32 accumulation exact
        costb_all = jax.lax.dot_general(
            costb_bf16, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [Mp, R*Bt]
        ov_all = jax.lax.dot_general(
            odds_row, onehot.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [1, R*Bt]
        for r in range(R):
            costb = costb_all[:, r * Bt: (r + 1) * Bt]       # [Mp, Bt]
            xbv = jnp.maximum(xb - tbm, 0.0)                 # [1, Bt]
            rolled = pltpu.roll(mpv[...], 1, 0)
            sv = jnp.maximum(jnp.maximum(rolled, xbv) - costb, 0.0)
            xe = jnp.max(sv, axis=0, keepdims=True)          # [1, Bt]
            xj[...] = jnp.maximum(xj[...], xe - tec)
            mpv[...] = sv
            xb = jnp.maximum(base, xj[...]) - tjb
            # -- bias filter row update ([1, Bt] lane work) --
            # unnormalized odds accumulate across the strip; the total
            # mass per row grows by at most the max emission odds (~3),
            # so renormalizing once per strip (R <= 8 rows, factor
            # <= 3^8) keeps f32 safely in range while paying the
            # log/divide only once per strip instead of per row
            ov = ov_all[:, r * Bt: (r + 1) * Bt]
            a0, a1 = st[0:1, :], st[1:2, :]
            upd = ov > 0.0
            first = upd & (st[3:4, :] == 0.0)
            na0 = jnp.where(first, a0 * 0.999, a0 * t00 + a1 * t10)
            na1 = jnp.where(first, a0 * 0.001, a0 * t01 + a1 * t11) * ov
            st[0:1, :] = jnp.where(upd, na0, a0)
            st[1:2, :] = jnp.where(upd, na1, a1)
            st[3:4, :] = jnp.where(upd, 1.0, st[3:4, :])
        # per-strip renormalization (a0 is 1.0 on never-started lanes)
        a0, a1 = st[0:1, :], st[1:2, :]
        ssum = a0 + a1
        st[2:3, :] = st[2:3, :] + jnp.log(ssum)
        inv = 1.0 / ssum
        st[0:1, :] = a0 * inv
        st[1:2, :] = a1 * inv
        return xb

    # dynamic per-tile bound: rows past every lane's length are padding
    # (costb = 255 - bias zeroes the state and cannot raise xj; odds 0
    # freezes the bias state), so the scan stops after the tile's
    # longest sequence -- exact by the same argument that makes
    # full-length padding safe
    nS_b = jnp.minimum(bnd_ref[0, pl.program_id(1)], nS)
    jax.lax.fori_loop(0, nS_b, strip, xb0)
    out_ref[...] = (xj[...] - base)[None]
    ovf_ref[...] = (xj[...] >= 255.0 - bias - tec).astype(jnp.float32)[None]
    bias_ref[...] = st[2:3, :][None]   # log(a0+a1) = log(1) after rescale


@partial(jax.jit, static_argnames=("R", "Bt"))
def _msv_pallas(codes_strips, cost, tjb, scal, bnd, odds, p1, R, Bt=0):
    """codes_strips [L/R, R*B] int32 strip-packed tile-major
    (nonresidue-padded); cost [P, Mp, KP_PAD] f32 quantized biased costs
    (255 in padding); tjb [1, B] f32; scal [P, 4] f32 (bias, tec, tbm,
    -); bnd [1, B/Bt] i32 per-lane-tile strip bounds; odds [P, 1,
    KP_PAD] f32 bias-filter emission odds (0 at nonresidue); p1 [1, B]
    f32 per-lane state-0 dwell; Bt = lane-tile width (0 = whole B).
    Returns ((xJ - base), overflow flags, bias-filter log score), each
    [P, B] f32."""
    P, Mp, _ = cost.shape
    nS, RB = codes_strips.shape
    B = RB // R
    if not Bt:
        Bt = B
    grid = (P, B // Bt)
    out, ovf, biaslog = pl.pallas_call(
        partial(_msv_body, R=R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nS, R * Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, KP_PAD), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal [P, 4], full
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bnd [1, nBt], full
            pl.BlockSpec((1, 1, KP_PAD), lambda p, b: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda p, b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Bt), lambda p, b: (p, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Bt), lambda p, b: (p, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Bt), lambda p, b: (p, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((P, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((P, 1, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Mp, Bt), jnp.float32),
            pltpu.VMEM((1, Bt), jnp.float32),
            pltpu.VMEM((8, Bt), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(codes_strips, cost, tjb, scal, bnd, odds, p1)
    return out[:, 0, :], ovf[:, 0, :], biaslog[:, 0, :]


def build_msv_tensors(pb) -> dict:
    """Per-profile-stack quantized cost tensors for the Pallas MSV kernel
    (cached on the ``ProfileBatch``)."""
    if "msvp" in pb._device_cache:
        return pb._device_cache["msvp"]
    # always pad at least one row past the model so the roll wrap reads
    # a dead (costb = 255 - bias) row
    P, Mp = pb.P, ((pb.Mp + 8) // 8) * 8
    cost = np.full((P, Mp, KP_PAD), 255.0, dtype=np.float32)
    cost[:, : pb.Mp, : pb.Kp] = np.transpose(pb.msv_cost, (0, 2, 1))
    # pre-biased costs (see _msv_body): costb = cost - bias
    cost -= pb.msv_bias[:, None, None]
    scal = np.stack([pb.msv_bias, pb.msv_tec, pb.msv_tbm,
                     np.zeros(pb.P, np.float32)], axis=1).astype(np.float32)
    # bias-filter odds (same smoothed-compo table as the exact host
    # filter, Background.filter_odds_table); 0 at the nonresidue code is
    # the kernel's padding freeze sentinel
    odds = np.zeros((pb.P, 1, KP_PAD), dtype=np.float32)
    odds[:, 0, : pb.Kp] = pb.filter_odds
    nonres = pb.profiles[0].alphabet.nonresidue_code
    odds[:, 0, nonres] = 0.0
    out = {"cost": jnp.asarray(cost), "scal": jnp.asarray(scal),
           "odds": jnp.asarray(odds)}
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
    Bt = _lane_tile(dev.Lmax, dev.Bpad)
    R = _strip_r(t["cost"].shape[1], Bt)
    dx, ovf, _ = _msv_pallas(dev.strips(R, Bt), t["cost"], dev.tjb_row,
                             t["scal"], dev.tile_bounds(R, Bt),
                             t["odds"], dev.p1_row, R, Bt)
    from .quantize import tjb_units
    usc = ((np.asarray(dx, np.float64)[:, :B]
            - tjb_units(np.maximum(lengths, 1))[None, :])
           / pb.scale_b - 3.0)
    usc[np.asarray(ovf)[:, :B] > 0] = np.inf
    return usc
