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


def _msv_body2(codes_ref, cost_ref, tjb_ref, scal_ref, bnd_ref, odds_ref,
               p1_ref, out_ref, ovf_ref, bias_ref, mpv, xj, a0s, a1s,
               lscs, strts, *, BLK, Mpk):
    """Profile-STACKED variant of ``_msv_body``: grid ``(nBt,)`` only, with
    every profile of the stack resident in one FLAT ``[Pg*Mpk, Bt]`` DP
    state.

    Why: the per-profile kernel's row scan is dependency-latency-bound --
    each row's ~5 VPU ops on ``[Mp, Bt]`` sit on the serial ``mpv``/``xb``
    chain, so a (profile, tile) pair costs ``rows x ~0.3us`` regardless of
    lane count, and the whole stage costs ``P x rows`` row-steps (measured:
    a 33% element cut via narrower tiles changed nothing).  Stacking makes
    each row-step carry ``Pg`` independent chains (~40x more work per
    latency window): 0.72-1.0 s -> ~0.3 s on the bench stack.

    The layout is deliberately FLAT (2-D): the emission gather is then a
    single tall ``[Pg*Mpk, KP] x [KP, Bt]`` MXU matmul and the roll is one
    sublane shift (a 3-D ``[Pg, Mpk, Bt]`` state compiled to per-profile
    skinny matmuls and per-slice shifts -- measured 4x SLOWER than the
    flat form).  Per-profile E/J/B specials live in ``[Pg, Bt]`` rows;
    the only segmented ops are a reshape-reduce (``[Pg*Mpk, Bt] ->
    [Pg, Mpk, Bt]`` max over axis 1) and the entry broadcast back -- both
    layout no-ops because ``Mpk`` is a multiple of 8 (vreg-aligned).
    The roll's cross-profile wrap is safe for the same reason as the flat
    kernel's row-0 wrap: every profile block ends in >= 1 padding row
    whose ``costb = 255 - bias`` pins its state to 0.

    Per-row semantics are identical to ``_msv_body`` (HMMER uint8 MSV in
    f32 + fused 2-state bias filter); the bias renormalization happens
    once per ``BLK``-row block instead of per strip."""
    L, Bt = codes_ref.shape
    rows, KP = cost_ref.shape
    Pg = rows // Mpk
    base = jnp.float32(190.0)
    kcode = jax.lax.broadcasted_iota(jnp.int32, (KP_PAD, Bt), 0)
    costb = cost_ref[...]                        # [Pg*Mpk, KP] bf16
    odds = odds_ref[...]                         # [Pg, KP] f32
    biasv = scal_ref[:, 0:1]                     # [Pg, 1]
    tecv = scal_ref[:, 1:2]
    tbmv = scal_ref[:, 2:3]
    tjb = tjb_ref[0:1, :]                        # [1, Bt]
    mpv[...] = jnp.zeros((rows, Bt), jnp.float32)
    xj[...] = jnp.zeros((Pg, Bt), jnp.float32)
    # carry the small per-profile xb [Pg, Bt]; the [rows, Bt] entry
    # broadcast is a transient inside the row body (a persistent carry
    # of it blew the 16 MB scoped-VMEM budget)
    xb0 = jnp.maximum(base - tjb, 0.0) + jnp.zeros((Pg, Bt), jnp.float32)
    t00 = p1_ref[0:1, :]                         # [1, Bt]
    t01 = 1.0 - t00
    t11 = jnp.float32(50.0 / 51.0)
    t10 = jnp.float32(1.0 / 51.0)
    a0s[...] = jnp.ones((Pg, Bt), jnp.float32)
    a1s[...] = jnp.zeros((Pg, Bt), jnp.float32)
    lscs[...] = jnp.zeros((Pg, Bt), jnp.float32)
    strts[...] = jnp.zeros((Pg, Bt), jnp.float32)

    def block(s8, xb):
        for j in range(BLK):
            codes_row = codes_ref[pl.ds(s8 * BLK + j, 1), :]    # [1, Bt]
            onehot = (kcode == codes_row).astype(jnp.bfloat16)  # [KP, Bt]
            cb = jax.lax.dot_general(
                costb, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [rows,Bt]
            ov = jax.lax.dot_general(
                odds, onehot.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)            # [Pg, Bt]
            xbv = jnp.broadcast_to(
                jnp.maximum(xb - tbmv, 0.0).reshape(Pg, 1, Bt),
                (Pg, Mpk, Bt)).reshape(rows, Bt)
            rolled = pltpu.roll(mpv[...], 1, 0)
            sv = jnp.maximum(jnp.maximum(rolled, xbv) - cb, 0.0)
            xe = jnp.max(sv.reshape(Pg, Mpk, Bt), axis=1)       # [Pg, Bt]
            xj[...] = jnp.maximum(xj[...], xe - tecv)
            mpv[...] = sv
            xb = jnp.maximum(base, xj[...]) - tjb               # [Pg, Bt]
            a0, a1 = a0s[...], a1s[...]
            upd = ov > 0.0
            first = upd & (strts[...] == 0.0)
            na0 = jnp.where(first, a0 * 0.999, a0 * t00 + a1 * t10)
            na1 = jnp.where(first, a0 * 0.001, a0 * t01 + a1 * t11) * ov
            a0s[...] = jnp.where(upd, na0, a0)
            a1s[...] = jnp.where(upd, na1, a1)
            strts[...] = jnp.where(upd, 1.0, strts[...])
        # per-block renormalization (a0 is 1.0 on never-started lanes);
        # odds per row are within [~0.3, ~3], so BLK=8 rows grow the
        # unnormalized mass by at most ~3^8 -- safely inside f32
        a0, a1 = a0s[...], a1s[...]
        ssum = a0 + a1
        lscs[...] = lscs[...] + jnp.log(ssum)
        inv = 1.0 / ssum
        a0s[...] = a0 * inv
        a1s[...] = a1 * inv
        return xb

    nB_b = jnp.minimum(bnd_ref[0, pl.program_id(0)], L // BLK)
    jax.lax.fori_loop(0, nB_b, block, xb0)
    out_ref[...] = xj[...] - base
    ovf_ref[...] = (xj[...] >= 255.0 - biasv - tecv).astype(jnp.float32)
    bias_ref[...] = lscs[...]


@partial(jax.jit, static_argnames=("BLK", "Bt", "Mpk"))
def _msv_pallas2(codes, cost, tjb, scal, bnd, odds, p1, Mpk,
                 BLK=8, Bt=128):
    """Stacked-profile MSV launcher: codes [L, B] int32 (R=1 layout,
    nonresidue-padded, L a multiple of BLK); cost [Pg*Mpk, KP_PAD]
    bfloat16 pre-biased quantized costs (integer-valued, bf16-exact);
    tjb/p1 [1, B] f32 lane rows; scal [Pg, 8] f32 per-profile
    (bias, tec, tbm, -...); bnd [1, B/Bt] int32 per-tile bounds in
    BLK-row blocks; odds [Pg, KP_PAD] f32 bias-filter odds.
    Returns ((xJ - base), overflow flags, bias log score), each
    [Pg, B] f32."""
    rows, KP = cost.shape
    Pg = rows // Mpk
    L, B = codes.shape
    Bt = min(Bt, B)
    grid = (B // Bt,)
    out, ovf, biaslog = pl.pallas_call(
        partial(_msv_body2, BLK=BLK, Mpk=Mpk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, Bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, KP), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pg, 8), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bnd [1, nBt], full
            pl.BlockSpec((Pg, KP), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Pg, Bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pg, Bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pg, Bt), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Pg, B), jnp.float32),
            jax.ShapeDtypeStruct((Pg, B), jnp.float32),
            jax.ShapeDtypeStruct((Pg, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, Bt), jnp.float32),
            pltpu.VMEM((Pg, Bt), jnp.float32),
            pltpu.VMEM((Pg, Bt), jnp.float32),
            pltpu.VMEM((Pg, Bt), jnp.float32),
            pltpu.VMEM((Pg, Bt), jnp.float32),
            pltpu.VMEM((Pg, Bt), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(codes, cost, tjb, scal, bnd, odds, p1)
    return out, ovf, biaslog


#: stacked rows (Pg x Mpk) per kernel: 8192 x 128 lanes x f32 = 4 MB of
#: DP state -- the deepest stack that compiled AND measured fastest in
#: the rowcap sweep (4096: 0.45 s, 8192: 0.29 s, >8192: VMEM OOM)
STACK_ROWS = int(_os.environ.get("PYHMMER_TPU_MSV_ROWS", "8192"))


def stack_rows(Lmax: int) -> int:
    """Stacked-row cap for a bucket: the row body keeps ~5 live
    [rows, Bt] f32 buffers (state + cb + entry broadcast + roll + sv),
    ~2.5 KB/row at Bt=128, and long buckets additionally carry a
    double-buffered [Lmax, Bt] int32 codes block -- so the cap shrinks
    with Lmax to stay inside the 16 MB scoped-VMEM limit."""
    if Lmax <= 512:
        return min(STACK_ROWS, 4608)
    if Lmax <= 2048:
        return min(STACK_ROWS, 4096)
    return min(STACK_ROWS, 2048)


def build_msv_tensors2(pb, cap: int) -> dict:
    """Per-profile-stack tensors for the STACKED Pallas MSV kernel,
    pre-split into row-capped groups with the group tensors ALREADY on
    device: slicing/reshaping device arrays per launch costs a ~10 ms
    dispatch each on tunneled setups and dominated the stage when done
    inline (measured 2.5 s vs 0.66 s of actual kernel time)."""
    key = ("msvp2", cap)
    if key in pb._device_cache:
        return pb._device_cache[key]
    t = build_msv_tensors(pb)
    cost = np.asarray(t["cost"])                     # [P, Mpk, KP] f32
    scal = np.asarray(t["scal"])                     # [P, 4]
    odds = np.asarray(t["odds"])                     # [P, 1, KP]
    P, Mpk, KP = cost.shape
    scal2 = np.zeros((P, 8), dtype=np.float32)
    scal2[:, :4] = scal
    Pg = max(1, cap // Mpk)
    groups = []
    for p0 in range(0, P, Pg):
        sub = cost[p0: p0 + Pg]
        groups.append((
            jnp.asarray(sub.reshape(-1, KP).astype(np.float32),
                        jnp.bfloat16),
            jnp.asarray(scal2[p0: p0 + Pg]),
            jnp.asarray(odds[p0: p0 + Pg, 0, :]),
        ))
    out = {"groups": groups, "Mpk": Mpk}
    pb._device_cache[key] = out
    return out


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
