"""Batched JAX kernels: the TPU compute path of the filter cascade.

Design (see SURVEY.md §7): the reference's per-sequence SIMD loops
(``impl_sse/*``) become DP scans batched over ``[P, B]`` = (profiles x
target sequences) with the model dimension padded to lane tiles.  The
sequential dependency runs over target length L (a ``lax.scan``); all
per-row work is elementwise ``[P, B, M]`` VPU math plus one-hot MXU
matmuls for the emission-score gathers.  The DD prefix chain inside a row
uses an associative scan over the model dimension (log-space ``logaddexp``
for Forward, max-plus for Viterbi).

Conventions:
* sequences come packed as ``codes[B, Lmax]`` uint8 + ``lengths[B]``
  (padding = nonresidue code -> -inf match scores / max MSV cost)
* profile tensors are stacked ``[P, ...]`` and M-padded with ``NEGMASS``
* float32 on device; ``NEGMASS = -1e30`` is the -inf stand-in
"""

from __future__ import annotations

import numpy as np
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# persistent compilation cache: the scan kernels are slow to compile, and
# bench/test processes otherwise pay full recompiles every run
try:
    import os as _os
    _cache = _os.environ.get("PYHMMER_TPU_XLA_CACHE",
                             "/tmp/pyhmmer_tpu_xla")
    _os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is an optimization only
    pass

from .quantize import quantize_msv, MSVQuant

NEGMASS = -1e30


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# profile tensor packing
# ---------------------------------------------------------------------------

class ProfileBatch:
    """Device-ready tensors for a stack of configured profiles sharing one
    padded model length ``Mp``.  Length-dependent parts (length model,
    tjb) are supplied at call time."""

    def __init__(self, profiles: Sequence, Mp: Optional[int] = None,
                 pad_to: int = 64):
        self.profiles = list(profiles)
        P = len(self.profiles)
        Kp = self.profiles[0].alphabet.Kp
        M_max = max(p.M for p in self.profiles)
        self.Mp = Mp or round_up(M_max, pad_to)
        Mp_ = self.Mp
        self.P = P
        self.Kp = Kp
        self.M = np.array([p.M for p in self.profiles], dtype=np.int32)

        def padded(field, width, fill):
            out = np.full((P, width), fill, dtype=np.float32)
            for i, p in enumerate(self.profiles):
                v = np.maximum(getattr(p, field), NEGMASS)
                out[i, : len(v)] = v
            return out

        # transitions, source-node indexed 0..M-1, padded with NEGMASS
        self.tMM = padded("tMM", Mp_, NEGMASS)
        self.tIM = padded("tIM", Mp_, NEGMASS)
        self.tDM = padded("tDM", Mp_, NEGMASS)
        self.tMD = padded("tMD", Mp_, NEGMASS)
        # DD run costs padded with 0 so the prefix-scan cumsum stays finite
        # (padded D states are masked out of E via kmask instead)
        self.tDD = padded("tDD", Mp_, 0.0)
        for i, p in enumerate(self.profiles):
            self.tDD[i, p.M:] = 0.0
        self.tBM = padded("tBM", Mp_, NEGMASS)
        self.tMI = padded("tMI", Mp_ + 1, NEGMASS)
        self.tII = padded("tII", Mp_ + 1, NEGMASS)
        #: per-profile validity of model slots (slot s = state s+1)
        self.kmask = np.zeros((P, Mp_), dtype=bool)
        for i, p in enumerate(self.profiles):
            self.kmask[i, : p.M] = True

        # emissions [P, Kp, Mp] for k=1..Mp
        self.msc = np.full((P, Kp, Mp_), NEGMASS, dtype=np.float32)
        self.isc = np.full((P, Kp, Mp_), NEGMASS, dtype=np.float32)
        for i, p in enumerate(self.profiles):
            self.msc[i, :, : p.M] = np.maximum(p.msc[:, 1:], NEGMASS)
            self.isc[i, :, : p.M] = np.maximum(p.isc[:, 1:], NEGMASS)

        # E->J / E->C
        self.xE = np.stack([np.maximum(p.xE, NEGMASS)
                            for p in self.profiles]).astype(np.float32)

        # quantized MSV tensors
        quants = [quantize_msv(p) for p in self.profiles]
        self.msv_cost = np.full((P, Kp, Mp_), 255.0, dtype=np.float32)
        for i, q in enumerate(quants):
            self.msv_cost[i, :, : q.M] = q.cost
        self.msv_bias = np.array([q.bias_b for q in quants], dtype=np.float32)
        self.msv_tec = np.array([q.tec_b for q in quants], dtype=np.float32)
        self.msv_tbm = np.array([q.tbm_b for q in quants], dtype=np.float32)
        self.scale_b = quants[0].scale_b

        self._device_cache: dict = {}

        # bias-filter odds (state-1 emission odds per residue code)
        from ..plan7.background import Background
        self.filter_odds = np.ones((P, Kp), dtype=np.float32)
        for i, p in enumerate(self.profiles):
            if p.compo is None:
                continue
            alph = p.alphabet
            f = (Background(alph).residue_frequencies)
            K = alph.K
            compo = 0.5 * np.asarray(p.compo)[:K] + 0.5 * f
            odds = compo / f
            self.filter_odds[i, :K] = odds
            for code in range(K + 1, Kp - 2):
                mem = alph.degen[code]
                w = f[mem]
                self.filter_odds[i, code] = (odds[mem] * w).sum() / w.sum()


# (continued) ProfileBatch device-cache accessor
def _pb_device(self, *names):
    out = []
    for n in names:
        if n not in self._device_cache:
            self._device_cache[n] = jnp.asarray(getattr(self, n))
        out.append(self._device_cache[n])
    return tuple(out)


ProfileBatch.device = _pb_device


# ---------------------------------------------------------------------------
# batched quantized MSV
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("Kp",))
def _msv_kernel(codes, mask, cost, bias_b, tec_b, tbm_b, tjb_b, Kp):
    """codes [B, Lmax] int32, mask [B, Lmax] f32 (1=valid);
    cost [P, Kp, Mp]; bias/tec/tbm [P]; tjb [B].
    Returns (xJ - base) [P, B] f32 and overflow [P, B] bool."""
    P, _, Mp = cost.shape
    B, Lmax = codes.shape
    base = jnp.float32(190.0)
    bias = bias_b[:, None]            # [P, 1]
    tec = tec_b[:, None]
    tbm = tbm_b[:, None]
    tjb = tjb_b[None, :]              # [1, B]

    def step(carry, xs):
        mpv, xJ, xB, ovf = carry
        x, valid = xs                 # [B], [B]
        onehot = jax.nn.one_hot(x, Kp, dtype=jnp.float32)       # [B, Kp]
        c = jnp.einsum("bk,pkm->pbm", onehot, cost,
                       preferred_element_type=jnp.float32)      # [P,B,Mp]
        xBv = jnp.maximum(xB - tbm, 0.0)                        # [P,B]
        sv = jnp.concatenate(
            [xBv[:, :, None],
             jnp.maximum(mpv[:, :, :-1], xBv[:, :, None])], axis=2)
        sv = jnp.minimum(sv + bias[:, :, None], 255.0)
        sv = jnp.maximum(sv - c, 0.0)
        xE = sv.max(axis=2)                                     # [P,B]
        n_ovf = ovf | (valid[None, :] & (xE >= 255.0 - bias))
        n_xJ = jnp.maximum(xJ, xE - tec)
        n_xB = jnp.maximum(base, n_xJ) - tjb
        vm = valid[None, :]
        xJ = jnp.where(vm, n_xJ, xJ)
        xB = jnp.where(vm, n_xB, xB)
        mpv = jnp.where(vm[:, :, None], sv, mpv)
        return (mpv, xJ, xB, n_ovf), None

    mpv0 = jnp.zeros((P, B, Mp), jnp.float32)
    xJ0 = jnp.zeros((P, B), jnp.float32)
    xB0 = jnp.broadcast_to(jnp.maximum(base - tjb, 0.0), (P, B))
    ovf0 = jnp.zeros((P, B), bool)
    (mpv, xJ, xB, ovf), _ = jax.lax.scan(
        step, (mpv0, xJ0, xB0, ovf0),
        (codes.T, mask.T.astype(bool)))
    return xJ - base, ovf


class SeqDevice:
    """Device-resident packed sequences for one bucket.

    Uploading a bucket's codes once and reusing them across every profile
    chunk matters a lot on tunneled TPU setups where each host->device
    transfer costs tens of milliseconds."""

    def __init__(self, codes: np.ndarray, lengths: np.ndarray,
                 nonres_code: Optional[int] = None):
        self.B, self.Lmax = codes.shape
        self.lengths = lengths
        L = np.maximum(lengths.astype(np.float64), 1.0)
        mask = (np.arange(self.Lmax)[None, :] < lengths[:, None])
        self.codes = jnp.asarray(codes, jnp.int32)
        # lane-padded transposed codes for the Pallas kernels (lane dim =
        # sequences, padded to a 128 multiple; every kernel output is
        # sliced back to [:B], so the pad lanes' values are never read)
        self.Bpad = max(128, round_up(self.B, 128))
        codes_tp = np.zeros((self.Lmax, self.Bpad), dtype=np.int32)
        codes_tp[:, : self.B] = codes.T
        self.codes_t = jnp.asarray(codes_tp, jnp.int32)
        self._codes_tp_host = codes_tp
        self._strips: dict = {}
        self.lens_d = jnp.asarray(lengths.astype(np.int32))
        self.mask_f = jnp.asarray(mask, jnp.float32)
        self.mask_b = jnp.asarray(mask, bool)
        pmove = 3.0 / (L + 3.0)
        self.loop = jnp.asarray(np.log(1.0 - pmove), jnp.float32)
        self.move = jnp.asarray(np.log(pmove), jnp.float32)
        self.p1 = jnp.asarray(L / (L + 1.0), jnp.float32)
        p1_pad = np.ones(self.Bpad, dtype=np.float32)
        p1_pad[: self.B] = (L / (L + 1.0)).astype(np.float32)
        self.p1_row = jnp.asarray(p1_pad.reshape(1, -1))
        #: lanes with a nonresidue code inside the real sequence (the
        #: fused device bias filter freezes on nonresidue, the exact host
        #: filter does not -- such lanes always take the host bias path)
        if nonres_code is None:
            self.has_nonres = np.zeros(self.B, dtype=bool)
        else:
            hit = (codes == nonres_code) & mask
            self.has_nonres = hit.any(axis=1)
        # host-side per-lane constants shared by every profile chunk
        # that gates against this bucket (recomputing the logs per
        # chunk x bucket pair was measurable on wide query stacks)
        self.nullsc_host = (L * np.log(L / (L + 1.0))
                            + np.log(1.0 / (L + 1.0)))
        from .quantize import tjb_units
        self.tjbu_host = tjb_units(np.maximum(lengths, 1))
        scale = 3.0 / np.log(2.0)
        tjb = np.minimum(255, np.rint(-scale * np.log(3.0 / (L + 3.0))))
        self.tjb = jnp.asarray(tjb, jnp.float32)
        tjb_pad = np.zeros(self.Bpad, dtype=np.float32)
        tjb_pad[: self.B] = tjb
        self.tjb_row = jnp.asarray(tjb_pad.reshape(1, -1), jnp.float32)
        self.tjb_col = jnp.asarray(
            np.concatenate([tjb, np.zeros(_pad8(self.B) - self.B)]
                           ).reshape(-1, 1), jnp.float32)


def _pad8(n):
    return ((n + 7) // 8) * 8


def _seqdev_strips(self, R: int, Bt: int = 0):
    """Strip-packed codes for the Pallas MSV kernel: ``[L/R, R*Bpad]``
    where row s holds sequence rows ``s*R .. s*R+R-1``.  With a lane
    tile ``Bt`` the packing is tile-major -- column ``b*(R*Bt) + r*Bt +
    j`` holds row ``s*R+r`` of lane ``b*Bt+j`` -- so a kernel whose grid
    tiles lanes sees a contiguous per-tile strip block.  Cached per
    (R, Bt) (both depend on the profile stack's Mp via VMEM budgets)."""
    L, Bp = self._codes_tp_host.shape
    if not Bt:
        Bt = Bp
    d = self._strips.get((R, Bt))
    if d is None:
        assert L % R == 0 and Bp % Bt == 0, (L, R, Bp, Bt)
        d = jnp.asarray(
            self._codes_tp_host.reshape(L // R, R, Bp // Bt, Bt)
            .transpose(0, 2, 1, 3).reshape(L // R, R * Bp), jnp.int32)
        self._strips[(R, Bt)] = d
    return d


def _seqdev_tile_bounds(self, R: int, Bt: int):
    """Per-lane-tile row bounds ``[1, nBt] int32`` for the scan kernels:
    tile ``b`` only needs ``ceil(max(len)/R)`` grid-loop steps, because
    rows past every lane's length are nonresidue padding that cannot
    change any output.  With lanes sorted by length (``_Buckets``), short
    tiles stop early and the scan cost tracks the *actual* residue count
    instead of the bucket's Lmax."""
    key = ("bounds", R, Bt)
    d = self._strips.get(key)
    if d is None:
        lens = np.zeros(self.Bpad, dtype=np.int64)
        lens[: self.B] = self.lengths
        tmax = lens.reshape(self.Bpad // Bt, Bt).max(axis=1)
        d = jnp.asarray(np.maximum((tmax + R - 1) // R, 1)
                        .astype(np.int32).reshape(1, -1))
        self._strips[key] = d
    return d


SeqDevice.strips = _seqdev_strips
SeqDevice.tile_bounds = _seqdev_tile_bounds


def msv_scores(pb: ProfileBatch, codes: np.ndarray, lengths: np.ndarray,
               dev: "SeqDevice" = None):
    """Quantized MSV scores in nats for every (profile, sequence) pair.

    Returns ``usc[P, B]`` float64 (inf where the uint8 DP overflowed,
    i.e. certainly passing)."""
    B, Lmax = codes.shape
    scale = pb.scale_b
    dev = dev or SeqDevice(codes, lengths)
    dx, ovf = _msv_kernel(
        dev.codes, dev.mask_f,
        *pb.device("msv_cost", "msv_bias", "msv_tec", "msv_tbm"),
        dev.tjb, pb.Kp)
    from .quantize import tjb_units
    usc = ((np.asarray(dx, np.float64)
            - tjb_units(np.maximum(lengths, 1))[None, :]) / scale - 3.0)
    usc[np.asarray(ovf)] = np.inf
    return usc


# ---------------------------------------------------------------------------
# batched bias filter
# ---------------------------------------------------------------------------

def bias_filter_scores(pb: ProfileBatch, codes: np.ndarray,
                       lengths: np.ndarray,
                       dev: "SeqDevice" = None) -> np.ndarray:
    """Composition bias filter scores in nats, [P, B].

    Matches ``Background.filter_score`` (state-0 loop = p1, state-1 mean
    dwell 50, entry pi=(0.999, 0.001), 50/50-smoothed compo odds)."""
    mean1 = 50.0
    t11 = np.float32(mean1 / (mean1 + 1.0))
    dev = dev or SeqDevice(codes, lengths)
    out = _bias_scan(dev.codes, dev.mask_b,
                     *pb.device("filter_odds"), dev.p1, t11, pb.Kp)
    logsc = np.asarray(out, np.float64)
    L = np.maximum(lengths.astype(np.float64), 1.0)
    return logsc + L * np.log(L / (L + 1.0)) + np.log(1.0 / (L + 1.0))


@partial(jax.jit, static_argnames=("Kp",))
def _bias_scan(codes, mask, odds, p1, t11, Kp):
    P = odds.shape[0]
    B, Lmax = codes.shape
    t00 = p1[None, :]                     # [1,B]
    t01 = 1.0 - t00
    t10 = 1.0 - t11

    def step(carry, xs):
        a0, a1, logsc, started = carry
        x, valid = xs
        onehot = jax.nn.one_hot(x, Kp, dtype=jnp.float32)
        ov = jnp.einsum("bk,pk->pb", onehot, odds,
                        preferred_element_type=jnp.float32)
        # first valid residue: initialize pi=(0.999, 0.001) with emission
        na0_f = jnp.full_like(a0, 0.999)
        na1_f = 0.001 * ov
        na0_c = a0 * t00 + a1 * t10
        na1_c = (a0 * t01 + a1 * t11) * ov
        first = ~started[None, :] if started.ndim == 1 else ~started
        firstm = jnp.broadcast_to(~started, a0.shape)
        na0 = jnp.where(firstm, na0_f, na0_c)
        na1 = jnp.where(firstm, na1_f, na1_c)
        s = na0 + na1
        rescale = s > 1e18
        norm = jnp.where(rescale, s, 1.0)
        nlog = logsc + jnp.where(rescale, jnp.log(norm), 0.0)
        vm = valid[None, :]
        a0 = jnp.where(vm, na0 / norm, a0)
        a1 = jnp.where(vm, na1 / norm, a1)
        logsc = jnp.where(vm, nlog, logsc)
        started = started | valid[None, :]
        return (a0, a1, logsc, started), None

    a0 = jnp.ones((P, B), jnp.float32)
    a1 = jnp.zeros((P, B), jnp.float32)
    logsc = jnp.zeros((P, B), jnp.float32)
    started = jnp.zeros((P, B), bool)
    (a0, a1, logsc, _), _ = jax.lax.scan(
        step, (a0, a1, logsc, started), (codes.T, mask.T))
    return logsc + jnp.log(a0 + a1)


# ---------------------------------------------------------------------------
# batched Viterbi (float semantics)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("Kp",))
def _viterbi_kernel(codes, mask, msc, isc, tMM, tIM, tDM, tMD, tDD, tBM,
                    tMI, tII, kmask, xEj, xEc, loop, move, Kp):
    """Batched multihit local Viterbi.  Returns score [P, B] in nats.
    Slot convention: slot s <-> model state k = s+1; transition arrays are
    source-node indexed (t[j] = node j -> state j+1)."""
    P, _, Mp = msc.shape
    B, Lmax = codes.shape
    negcol = jnp.full((P, B, 1), NEGMASS, jnp.float32)
    # cdd[s] = sum tDD[1..s] = DD-run cost reaching state s+1 from state 1
    cdd = jnp.concatenate(
        [jnp.zeros((P, 1), jnp.float32),
         jnp.cumsum(tDD[:, 1:], axis=1)], axis=1)        # [P, Mp]
    # a-term transition: tMD[t+1] (node t+1 -> D_{t+2})
    tMD_sh = jnp.concatenate(
        [tMD[:, 1:], jnp.full((P, 1), NEGMASS, jnp.float32)], axis=1)
    kmaskf = jnp.where(kmask, 0.0, NEGMASS)[:, None, :]  # [P,1,Mp]

    def shift(row):
        return jnp.concatenate([negcol, row[:, :, :-1]], axis=2)

    def step(carry, xs):
        mrow, irow, drow, xN, xB, xJ, xC = carry
        x, valid = xs
        onehot = jax.nn.one_hot(x, Kp, dtype=jnp.float32)
        ms = jnp.einsum("bk,pkm->pbm", onehot, msc,
                        preferred_element_type=jnp.float32)
        iscr = jnp.einsum("bk,pkm->pbm", onehot, isc,
                          preferred_element_type=jnp.float32)
        new_m = ms + jnp.maximum(
            jnp.maximum(shift(mrow) + tMM[:, None, :],
                        shift(irow) + tIM[:, None, :]),
            jnp.maximum(shift(drow) + tDM[:, None, :],
                        xB[:, :, None] + tBM[:, None, :]))
        new_i = iscr + jnp.maximum(mrow + tMI[:, None, 1: Mp + 1],
                                   irow + tII[:, None, 1: Mp + 1])
        # a[t] = m(state t+1) + tMD[t+1] - cdd_state[t+2]
        a = new_m + tMD_sh[:, None, :] - jnp.concatenate(
            [cdd[:, 1:], cdd[:, -1:]], axis=1)[:, None, :]
        acc = jax.lax.cummax(a, axis=2)
        new_d = jnp.concatenate(
            [negcol, acc[:, :, :-1] + cdd[:, None, 1:]], axis=2)
        new_d = jnp.maximum(new_d + kmaskf, NEGMASS)
        xE = jnp.maximum(new_m.max(axis=2), new_d.max(axis=2))
        n_xJ = jnp.maximum(xJ + loop[None, :], xE + xEj)
        n_xC = jnp.maximum(xC + loop[None, :], xE + xEc)
        n_xN = xN + loop[None, :]
        n_xB = jnp.maximum(n_xN + move[None, :], n_xJ + move[None, :])
        vm = valid[None, :]
        vm3 = vm[:, :, None]
        return (jnp.where(vm3, new_m, mrow), jnp.where(vm3, new_i, irow),
                jnp.where(vm3, new_d, drow), jnp.where(vm, n_xN, xN),
                jnp.where(vm, n_xB, xB), jnp.where(vm, n_xJ, xJ),
                jnp.where(vm, n_xC, xC)), None

    neg = jnp.full((P, B, Mp), NEGMASS, jnp.float32)
    xN0 = jnp.zeros((P, B), jnp.float32)
    xB0 = jnp.broadcast_to(move[None, :], (P, B))
    negs = jnp.full((P, B), NEGMASS, jnp.float32)
    (m, i_, d, xN, xB, xJ, xC), _ = jax.lax.scan(
        step, (neg, neg, neg, xN0, xB0, negs, negs),
        (codes.T, mask.T))
    return xC + move[None, :]


def viterbi_scores(pb: ProfileBatch, codes: np.ndarray,
                   lengths: np.ndarray,
                   dev: "SeqDevice" = None) -> np.ndarray:
    """Viterbi scores in nats for all (profile, sequence) pairs [P, B]."""
    dev = dev or SeqDevice(codes, lengths)
    xEj = np.float32(np.log(0.5))
    out = _viterbi_kernel(
        dev.codes, dev.mask_b,
        *pb.device("msc", "isc", "tMM", "tIM", "tDM", "tMD", "tDD", "tBM",
                   "tMI", "tII", "kmask"),
        xEj, xEj, dev.loop, dev.move, pb.Kp)
    return np.asarray(out, np.float64)


# ---------------------------------------------------------------------------
# batched Forward (score only)
# ---------------------------------------------------------------------------

def _lse(a, b):
    return jnp.logaddexp(a, b)


@partial(jax.jit, static_argnames=("Kp",))
def _forward_kernel(codes, mask, msc, isc, tMM, tIM, tDM, tMD, tDD, tBM,
                    tMI, tII, kmask, xEj, xEc, loop, move, Kp):
    """Batched multihit local Forward; returns score [P, B] nats."""
    P, _, Mp = msc.shape
    B, Lmax = codes.shape
    negcol = jnp.full((P, B, 1), NEGMASS, jnp.float32)
    cdd = jnp.concatenate(
        [jnp.zeros((P, 1), jnp.float32),
         jnp.cumsum(tDD[:, 1:], axis=1)], axis=1)
    tMD_sh = jnp.concatenate(
        [tMD[:, 1:], jnp.full((P, 1), NEGMASS, jnp.float32)], axis=1)
    cdd_sh = jnp.concatenate([cdd[:, 1:], cdd[:, -1:]], axis=1)
    kmaskf = jnp.where(kmask, 0.0, NEGMASS)[:, None, :]

    def shift(row):
        return jnp.concatenate([negcol, row[:, :, :-1]], axis=2)

    def step(carry, xs):
        mrow, irow, drow, xN, xB, xJ, xC = carry
        x, valid = xs
        onehot = jax.nn.one_hot(x, Kp, dtype=jnp.float32)
        ms = jnp.einsum("bk,pkm->pbm", onehot, msc,
                        preferred_element_type=jnp.float32)
        iscr = jnp.einsum("bk,pkm->pbm", onehot, isc,
                          preferred_element_type=jnp.float32)
        new_m = ms + _lse(
            _lse(shift(mrow) + tMM[:, None, :],
                 shift(irow) + tIM[:, None, :]),
            _lse(shift(drow) + tDM[:, None, :],
                 xB[:, :, None] + tBM[:, None, :]))
        new_i = iscr + _lse(mrow + tMI[:, None, 1: Mp + 1],
                            irow + tII[:, None, 1: Mp + 1])
        a = new_m + tMD_sh[:, None, :] - cdd_sh[:, None, :]
        acc = jax.lax.associative_scan(jnp.logaddexp, a, axis=2)
        new_d = jnp.concatenate(
            [negcol, acc[:, :, :-1] + cdd[:, None, 1:]], axis=2)
        new_d = jnp.maximum(new_d + kmaskf, NEGMASS)
        xE = _lse(jax.nn.logsumexp(new_m, axis=2),
                  jax.nn.logsumexp(new_d, axis=2))
        n_xJ = _lse(xJ + loop[None, :], xE + xEj)
        n_xC = _lse(xC + loop[None, :], xE + xEc)
        n_xN = xN + loop[None, :]
        n_xB = _lse(n_xN + move[None, :], n_xJ + move[None, :])
        vm = valid[None, :]
        vm3 = vm[:, :, None]
        return (jnp.where(vm3, new_m, mrow), jnp.where(vm3, new_i, irow),
                jnp.where(vm3, new_d, drow), jnp.where(vm, n_xN, xN),
                jnp.where(vm, n_xB, xB), jnp.where(vm, n_xJ, xJ),
                jnp.where(vm, n_xC, xC)), None

    neg = jnp.full((P, B, Mp), NEGMASS, jnp.float32)
    xN0 = jnp.zeros((P, B), jnp.float32)
    xB0 = jnp.broadcast_to(move[None, :], (P, B))
    negs = jnp.full((P, B), NEGMASS, jnp.float32)
    (m, i_, d, xN, xB, xJ, xC), _ = jax.lax.scan(
        step, (neg, neg, neg, xN0, xB0, negs, negs),
        (codes.T, mask.T))
    return xC + move[None, :]


def forward_scores(pb: ProfileBatch, codes: np.ndarray,
                   lengths: np.ndarray,
                   dev: "SeqDevice" = None) -> np.ndarray:
    """Forward scores in nats for all (profile, sequence) pairs [P, B]."""
    dev = dev or SeqDevice(codes, lengths)
    xEj = np.float32(np.log(0.5))
    out = _forward_kernel(
        dev.codes, dev.mask_b,
        *pb.device("msc", "isc", "tMM", "tIM", "tDM", "tMD", "tDD", "tBM",
                   "tMI", "tII", "kmask"),
        xEj, xEj, dev.loop, dev.move, pb.Kp)
    return np.asarray(out, np.float64)
