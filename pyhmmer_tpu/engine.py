"""The batched search engine: TPU filter cascade + host domain machinery.

This is the TPU-native replacement for the reference's thread-parallel
search loops (``hmmer/_base.py`` dispatchers + per-target ``p7_Pipeline``
calls): instead of one comparison at a time per CPU thread, the engine
runs the filter cascade for *stacks of profiles x buckets of sequences* in
single device kernels (`pyhmmer_tpu.ops.batch`), compacts survivors on the
host, and hands the rare Forward survivors to the exact float64 domain
postprocessing (`plan7.domaindef`) so the reported numbers are identical
to the sequential oracle pipeline.

Dispatch economics (measured on a tunneled single-chip TPU): individual
device->host fetches cost whole round trips while enqueues are async and
nearly free, so the cascade is organized into *stages*: every (profile
chunk x sequence bucket) kernel for a stage is enqueued back-to-back, the
stage's outputs are concatenated on device, and ONE fetch brings the whole
stage back.  Survivor gathers between stages happen on device (indexed by
a small uploaded row vector), never by re-uploading sequence data.
"""

from __future__ import annotations

import math
import os
import numpy as np
from typing import Iterable, List, Optional, Sequence

import jax.numpy as jnp

from .easel.alphabet import Alphabet
from .easel.sequence import DigitalSequence, DigitalSequenceBlock
from .plan7.hmm import HMM
from .plan7.background import Background
from .plan7.profile import Profile
from .plan7.pipeline import (Pipeline, F2_SKIP_SLACK, F3_SLACK, LOG2,
                             MAX_TARGET_LENGTH)
from .plan7.evalues import gumbel_surv, exp_surv
from .plan7.results import TopHits
from .ops import reference as refops
from .ops import batch as B

__all__ = ["SearchEngine"]

#: max profiles stacked per kernel call
# Profiles per chunk: each (chunk, bucket) pair is ONE kernel execution
# whose grid carries the P dimension, so stacking more profiles per chunk
# divides the per-execution fixed cost (~10 ms on tunneled chips, measured)
# without touching per-grid-step VMEM.  64 keeps compile shapes bounded
# (P is padded to a multiple of 8) while making launch overhead negligible
# for realistic query stacks.
DEFAULT_P_MAX = int(os.environ.get("PYHMMER_TPU_P_MAX", "64"))
#: target area (B * Lmax) per sequence bucket
DEFAULT_BUCKET_AREA = 1 << 18

#: speculative host-routing threshold: bias survivors with quantized-MSV
#: P-value at or below this skip the device Forward prefilter and go
#: straight to the host domaindef pool (see the routing loop)
SPECULATE_P1B = float(os.environ.get("PYHMMER_TPU_SPEC_P1B", "1e-6"))


class _Buckets:
    """Length-bucketed packing of a target block.

    One bucket per ladder level (Lmax = 512 * 4^k): the Pallas scan
    kernels are latency-bound per sequence row, so the widest possible
    lane dimension per level minimizes total row-steps AND collapses the
    per-(chunk, bucket) stage kernels into one per (chunk, level) --
    stage-2 survivors of a whole level share one Forward call instead of
    one per area-capped sub-bucket.  Lane counts are padded up a
    power-of-two ladder so kernel shapes (and thus XLA compilations) are
    bounded across databases; the per-level lane cap bounds device codes
    memory for very long levels.
    """

    def __init__(self, block: DigitalSequenceBlock, area: int = DEFAULT_BUCKET_AREA):
        lengths = np.array([len(s) for s in block], dtype=np.int64)
        fill = block.alphabet.nonresidue_code
        self.buckets = []   # (indices[B], codes[B, Lmax], lengths[B], dev)
        # measured (tunneled v5e, Pfam-shaped stack): the 512-rooted 4x
        # ladder beat every coarser variant tried (single 4096 bucket,
        # 1024/4096 hybrid) -- wide lane tiles on the short levels
        # matter more than launch count; launch count is instead
        # reduced by coalescing small Mp groups (PARITY_NOTES round 4).
        # Levels above 8192 run the XLA fallback kernels (their
        # whole-length VMEM codes block would not fit the Pallas
        # budget).
        L0 = int(os.environ.get("PYHMMER_TPU_L0", "512"))
        if L0 == 512:
            ladder = [512, 2048, 8192, 131072]
        else:
            ladder = sorted({L0, 4096, 16384, 131072})
        for li, Lmax in enumerate(ladder):
            lo = 0 if li == 0 else ladder[li - 1]
            sel = np.where((lengths > lo if li else lengths >= 1)
                           & (lengths <= Lmax))[0]
            if len(sel) == 0:
                continue
            # length-sorted lanes: the kernels stop each 128/256-lane
            # tile after its longest sequence (per-tile bounds), so
            # grading lanes by length turns the bucket's Lmax padding
            # into near-actual row counts
            sel = sel[np.argsort(lengths[sel], kind="stable")]
            # lane cap bounds the bucket's HBM codes footprint; one
            # launch per chunk matters more than per-bucket area, so
            # the cap is generous (a 4096-wide x 4096-long bucket is
            # ~67 MB of int32 codes)
            Bcap = max(64, (1 << 24) // Lmax)
            for s0 in range(0, len(sel), Bcap):
                idx = sel[s0: s0 + Bcap]
                Bp = _pad_b(len(idx))
                codes = np.full((Bp, Lmax), fill, dtype=np.uint8)
                blens = np.zeros(Bp, dtype=np.int64)
                for r, s in enumerate(idx):
                    seq = block[int(s)].sequence
                    codes[r, : len(seq)] = seq
                    blens[r] = len(seq)
                self.buckets.append(
                    [idx.astype(np.int64), codes, blens, None])


def _pad_b(n: int) -> int:
    """Pad a batch size up a small ladder to bound compilation count."""
    for b in (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096):
        if n <= b:
            return b
    return B.round_up(n, 4096)


def _fetch_all(parts: List) -> List[np.ndarray]:
    """Fetch many device arrays in a single device->host transfer.

    Per-array fetches pay a full round trip each on tunneled TPU setups;
    one concatenated transfer costs the same as the largest single one."""
    if not parts:
        return []
    if len(parts) == 1:
        return [np.asarray(parts[0])]
    flats = [p.ravel() for p in parts]
    buf = np.asarray(jnp.concatenate(flats))
    out, off = [], 0
    for p in parts:
        n = int(np.prod(p.shape))
        out.append(buf[off: off + n].reshape(p.shape))
        off += n
    return out


import jax as _jax


from functools import partial as _partial


@_partial(_jax.jit, static_argnames=("R", "Bt"))
def _gather_survivors_strips(codes_t, lens_d, ridx, R, Bt):
    """Like :func:`_gather_survivors` but returns strip-packed codes
    ``[L/R, R*Bp]`` (tile-major over lane tiles of width ``Bt``, see
    ``SeqDevice.strips``) plus per-lane-tile strip bounds for the v2
    Forward kernel."""
    valid = ridx >= 0
    r = jnp.maximum(ridx, 0)
    ct = jnp.take(codes_t, r, axis=1)
    L, Bp = ct.shape
    strips = (ct.reshape(L // R, R, Bp // Bt, Bt)
              .transpose(0, 2, 1, 3).reshape(L // R, R * Bp))
    lens = jnp.where(valid, jnp.take(lens_d, r), 0).astype(jnp.int32)
    Lf = jnp.maximum(lens.astype(jnp.float32), 1.0)
    pmove = 3.0 / (Lf + 3.0)
    lm = jnp.stack([1.0 - pmove, pmove,
                    jnp.log1p(-pmove), jnp.log(pmove)])
    tmax = lens.reshape(Bp // Bt, Bt).max(axis=1)
    bnd = jnp.maximum((tmax + R - 1) // R, 1).astype(jnp.int32)
    return strips, lens.reshape(1, -1), lm, bnd.reshape(1, -1)


@_partial(_jax.jit, static_argnames=("Bt",))
def _gather_survivors(codes_t, lens_d, ridx, Bt):
    """Device-side survivor gather for the Pallas kernels: one uploaded
    index row (-1 marks padding) -> transposed codes [L, Bp], length row
    [1, Bp] (0 on padding), the 4-row length-model table, and per-tile
    row bounds for lane tiles of width ``Bt``."""
    valid = ridx >= 0
    r = jnp.maximum(ridx, 0)
    ct = jnp.take(codes_t, r, axis=1)
    Bp = ct.shape[1]
    lens = jnp.where(valid, jnp.take(lens_d, r), 0).astype(jnp.int32)
    Lf = jnp.maximum(lens.astype(jnp.float32), 1.0)
    pmove = 3.0 / (Lf + 3.0)
    lm = jnp.stack([1.0 - pmove, pmove,
                    jnp.log1p(-pmove), jnp.log(pmove)])
    bnd = jnp.maximum(lens.reshape(Bp // Bt, Bt).max(axis=1),
                      1).astype(jnp.int32)
    return ct, lens.reshape(1, -1), lm, bnd.reshape(1, -1)


@_jax.jit
def _gather_rows_dev_impl(dev_codes, dev_mask, dev_loop, dev_move, ridx):
    """Device-side gather of survivor rows from a bucket (-1 = padding).
    Returns (codes, mask, loop, move) device arrays."""
    valid = ridx >= 0
    r = jnp.maximum(ridx, 0)
    codes = jnp.take(dev_codes, r, axis=0)
    mask = jnp.take(dev_mask, r, axis=0) & valid[:, None]
    loop = jnp.take(dev_loop, r)
    move = jnp.take(dev_move, r)
    return codes, mask, loop, move


def _gather_rows_dev(dev: "B.SeqDevice", ridx_dev):
    return _gather_rows_dev_impl(dev.codes, dev.mask_b, dev.loop,
                                 dev.move, ridx_dev)


def _pt_bounds(need: np.ndarray, lens_sel: np.ndarray, P: int, Bp: int,
               Bt: int, R: int) -> np.ndarray:
    """Per-(profile, lane-tile) scan bounds [P, Bp/Bt] int32 for the
    survivor kernels: tile t of profile p runs ``ceil(max needed len /
    R)`` grid rows, 0 (skipped) when p needs no lane of t."""
    Preal, n = need.shape
    lp = np.zeros((P, Bp), dtype=np.int64)
    lp[:Preal, :n] = np.where(need, lens_sel[None, :], 0)
    tmax = lp.reshape(P, Bp // Bt, Bt).max(axis=2)
    return ((tmax + R - 1) // R).astype(np.int32)


class _ChunkState:
    """Per-chunk (stack of <= p_max same-Mp profiles) search state.

    The expensive model-side artifacts (configured profiles, the
    device-resident ``ProfileBatch`` with its quantized/odds tensors,
    native C-ABI tensor caches) are memoized on the engine keyed by the
    query HMM identities, so repeated searches over the same queries --
    the serving pattern -- pay only for pipelines and TopHits."""

    def __init__(self, engine: "SearchEngine", queries, chunk, Mp):
        bg = engine.background
        self.chunk = chunk

        # keyed by object identity; the cached value holds references to
        # the exact HMM objects, so a key can never alias a freed id --
        # the identity check below turns any violation into a rebuild
        # instead of a stale-tensor search
        key = (tuple(id(queries[qi]) for qi in chunk), Mp)
        cached = engine._model_cache.get(key)
        if cached is not None and any(
                h is not queries[qi] for h, qi in zip(cached[0], chunk)):
            cached = None
        if cached is None:
            profs, profs_uni = [], []
            for qi in chunk:
                hmm = queries[qi]
                profs.append(Profile(hmm.M, hmm.alphabet).configure(
                    hmm, bg, 400, multihit=True))
                profs_uni.append(Profile(hmm.M, hmm.alphabet).configure(
                    hmm, bg, 400, multihit=False))
            # pad the profile stack to a multiple of 8 so kernel P-shapes
            # are shared across chunks without pow2 blowup (the padded
            # grid steps are wasted work: scan kernels are latency-bound
            # per row, so wide-but-few stacks beat many narrow ones).
            # Tiny groups (long-tail Pfam models) pad to 4 instead: at 3
            # real profiles the jump to 8 wastes more device time than
            # the extra compile shape costs
            n_ch = len(chunk)
            Ppad = 4 if n_ch <= 4 else ((n_ch + 7) // 8) * 8
            profs_padded = profs + [profs[0]] * (Ppad - len(chunk))
            pb = B.ProfileBatch(profs_padded, Mp=Mp)
            ev = np.stack([p.evparam.astype(np.float64) for p in profs])
            from .ops import native as _native
            for p in profs:
                _native.prewarm(p)
            cached = (list(queries[qi] for qi in chunk),  # keep refs alive
                      profs, profs_uni, pb, ev)
            engine._model_cache[key] = cached
        _, self.profs, self.profs_uni, self.pb, self.ev = cached

        self.pipelines = []
        for pi, qi in enumerate(chunk):
            hmm = queries[qi]
            pli = Pipeline(engine.alphabet, bg.copy(), **engine.options)
            pli.nmodels = 1
            pli.nnodes = hmm.M
            pli.background.set_filter(hmm.M, self.profs[pi].compo)
            if pli.bit_cutoffs_mode is not None:
                idx = {"gathering": 0, "trusted": 2,
                       "noise": 4}[pli.bit_cutoffs_mode]
                c = hmm.cutoffs
                if c[idx] <= -99998.0:
                    raise ValueError(
                        f"model {hmm.name!r} has no "
                        f"{pli.bit_cutoffs_mode} cutoffs")
                pli.bit_cutoffs = (float(c[idx]), float(c[idx + 1]))
            self.pipelines.append(pli)

        self.Preal = len(chunk)
        self.F1 = np.array([pli.F1 for pli in self.pipelines])[:, None]
        self.F2 = np.array([pli.F2 for pli in self.pipelines])[:, None]
        self.F3 = np.array([pli.F3 for pli in self.pipelines])[:, None]
        # threshold form of the dense gates: P(delta/LOG2) <= F
        # <=> delta >= LOG2 * invsurv(F) -- a compare instead of a
        # dense double-transcendental gumbel_surv per (pair).  Monotone-
        # exact up to float rounding at the (measure-zero) boundary.
        from .plan7.evalues import gumbel_invsurv
        ev = self.ev
        self.thr1 = (LOG2 * gumbel_invsurv(
            self.F1[:, 0], ev[:, 0], ev[:, 1]))[:, None]

        self.tophits = []
        for pi, qi in enumerate(chunk):
            th = TopHits()
            th.query_name = self.profs[pi].name
            th.query_accession = self.profs[pi].accession
            th.query_length = self.profs[pi].M
            self.tophits.append(th)


class SearchEngine:
    """Batched hmmsearch over many queries and one target block."""

    def __init__(self, alphabet: Alphabet, background: Optional[Background] = None,
                 p_max: int = DEFAULT_P_MAX, use_pallas: Optional[bool] = None,
                 device=None, shared_executor=None, **pipeline_options):
        self.alphabet = alphabet
        self.background = background or Background(alphabet)
        self.p_max = p_max
        if use_pallas is None:
            import jax
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        #: optional jax.Device this engine's buffers/kernels are pinned
        #: to -- the data-parallel shard placement used by
        #: ``parallel.mesh.sharded_search`` (one engine per device; the
        #: async dispatch overlaps execution across chips)
        self.device = device
        #: optional caller-owned ThreadPoolExecutor for the native
        #: postprocessing jobs.  When several engines run concurrently on
        #: one host (``parallel.mesh.sharded_search``) they must share
        #: one core-count pool -- per-engine pools would oversubscribe
        #: the host and measurably inflate every native phase.
        self.shared_executor = shared_executor
        self.options = pipeline_options
        # persistent across searches: configured-model artifacts keyed by
        # query identity, packed target buckets keyed by block identity
        self._model_cache: dict = {}
        self._buckets_cache: Optional[tuple] = None

    # -- device-side stage kernels (return device arrays, no fetch) --------

    def _msv_dev(self, pb, dev):
        """Returns (dx, ovf, biaslog) device arrays [P, B] f32
        (pre-scale).  ``biaslog`` is the fused f32 bias-filter log score
        (None on the XLA fallback path, where the host filter runs
        instead): the 2-state scan rides inside the MSV kernel at ~1/Mp
        of its cost, so the bias stage needs no separate device pass and
        the exact f64 host filter only re-checks gate-boundary pairs."""
        from .ops.msv_pallas import stack_rows as _stack_rows
        if (self.use_pallas and dev.Lmax <= 8192
                and pb.Mp <= _stack_rows(dev.Lmax)
                and os.environ.get("PYHMMER_TPU_MSV_STACKED", "1") == "1"):
            # profile-stacked kernel: every row-step carries the whole
            # chunk's independent DP chains, converting the row-latency-
            # bound scan into a throughput-bound one (~2.5x measured on
            # the bench stack; see ops/msv_pallas._msv_body2)
            from .ops.msv_pallas import (_msv_pallas2, build_msv_tensors2,
                                         stack_rows)
            t = build_msv_tensors2(pb, stack_rows(dev.Lmax))
            Mpk = t["Mpk"]
            codes = dev.strips(1, min(128, dev.Bpad))
            bnd = dev.tile_bounds(8, min(128, dev.Bpad))
            parts = []
            for (cost_flat, scal2, odds2) in t["groups"]:
                parts.append(_msv_pallas2(
                    codes, cost_flat, dev.tjb_row, scal2, bnd,
                    odds2, dev.p1_row, Mpk))
            if len(parts) == 1:
                dx, ovf, biaslog = parts[0]
            else:
                dx = jnp.concatenate([p[0] for p in parts], axis=0)
                ovf = jnp.concatenate([p[1] for p in parts], axis=0)
                biaslog = jnp.concatenate([p[2] for p in parts], axis=0)
            if os.environ.get("PYHMMER_TPU_FUSED_BIAS", "1") == "0":
                return dx[:, : dev.B], ovf[:, : dev.B], None  # A/B knob
            return dx[:, : dev.B], ovf[:, : dev.B], biaslog[:, : dev.B]
        elif self.use_pallas and dev.Lmax <= 8192:
            from .ops.msv_pallas import (_msv_pallas, _strip_r,
                                         _lane_tile, build_msv_tensors)
            t = build_msv_tensors(pb)
            Bt = _lane_tile(dev.Lmax, dev.Bpad)
            R = _strip_r(t["cost"].shape[1], Bt)
            dx, ovf, biaslog = _msv_pallas(dev.strips(R, Bt), t["cost"],
                                           dev.tjb_row, t["scal"],
                                           dev.tile_bounds(R, Bt),
                                           t["odds"], dev.p1_row, R, Bt)
            if os.environ.get("PYHMMER_TPU_FUSED_BIAS", "1") == "0":
                return dx[:, : dev.B], ovf[:, : dev.B], None  # A/B knob
            return dx[:, : dev.B], ovf[:, : dev.B], biaslog[:, : dev.B]
        from .ops.batch import _msv_kernel
        dx, ovf = _msv_kernel(
            dev.codes, dev.mask_f,
            *pb.device("msv_cost", "msv_bias", "msv_tec", "msv_tbm"),
            dev.tjb, pb.Kp)
        return dx, ovf.astype(jnp.float32), None

    def _bias_host(self, st, pi, codes, lengths, cols):
        """Bias-filter log scores (no null term) for one profile over the
        selected survivor rows of a bucket -- exact f64 on the host (the
        reference runs the bias filter only on MSV survivors, ~2% of
        targets, so this is off the device critical path entirely)."""
        from .ops import native as _native
        e1 = st.pipelines[pi].background.filter_odds_table()
        out = _native.bias_filter_rows(e1, codes, lengths, cols)
        if out is None:                      # no native library: per-seq
            bgf = st.pipelines[pi].background
            out = np.empty(len(cols))
            for j, b in enumerate(cols):
                Lb = int(lengths[b])
                dsq = codes[b, :Lb]
                p1 = Lb / (Lb + 1.0)
                out[j] = (bgf.filter_score(dsq)
                          - Lb * np.log(p1) - np.log(1.0 - p1))
        return out

    def _forward_dev(self, pb, dev, ridx_dev, n, need=None, lens_sel=None):
        """Forward scores for gathered survivor lanes.  ``ridx_dev`` is a
        device int32 row (-1 padded) -- uploaded in ONE batch for the whole
        stage by the caller: per-job uploads each cost a full round trip
        on tunneled TPU setups and dominated stage time.

        ``need``/``lens_sel`` (host arrays [Preal, n] / [n]) tighten the
        scan bounds per (profile, lane-tile): survivor columns are packed
        across profiles, so a given profile typically needs only a
        fraction of them -- (p, tile) cells holding none of p's
        survivors are skipped entirely and the rest stop at p's longest
        needed lane instead of the tile's."""
        # very large models blow the 16 MB scoped-VMEM budget in the v2
        # kernel (the [Mp, Mp] DD-transfer block + double buffering);
        # such chunks are rare and small, so they take the XLA scan
        # kernel instead of shrinking everyone else's tiles
        if (self.use_pallas and pb.Mp <= 384 and dev.Lmax <= 8192
                and os.environ.get("PYHMMER_TPU_FWD_STACKED", "1") == "1"):
            # profile stacking pays where chunks are wide (many small-M
            # profiles); at Mp > 384 the batched [Pg, Mp, Mp] DD matmul
            # blows the scoped-VMEM budget and chunks are narrow anyway,
            # so those keep the per-profile v2 kernel below
            # profile-stacked Forward (same schedule transformation as
            # the stacked MSV kernel, see ops/fwd_pallas._fwd3_body)
            from .ops import fwd_pallas as FP
            cap = FP.fwd_stack_rows(dev.Lmax)
            t = FP.build_fwd_tensors3(pb, cap)
            Mp = t["Mp"]
            Bp = int(ridx_dev.shape[0])
            Bt = min(128, Bp)
            codes_t, lens, lm, bnd1 = _gather_survivors_strips(
                dev.codes_t, dev.lens_d, ridx_dev, 1, Bt)
            # ONE host->device upload of the per-(group, tile) bounds
            # for the whole job (per-group uploads each cost a ~10 ms
            # dispatch on the tunnel and erased the kernel win)
            Pg = t["Pg"]
            if need is not None:
                bndP = _pt_bounds(need, lens_sel, pb.P, Bp, Bt, 2)
                G = len(t["groups"])
                gb = np.zeros((G, bndP.shape[1]), dtype=np.int32)
                for gi in range(G):
                    gb[gi] = bndP[gi * Pg: gi * Pg + Pg].max(axis=0)
                gbnd = jnp.asarray(gb)
            else:
                gbnd = jnp.broadcast_to((bnd1 + 1) // 2,
                                        (len(t["groups"]),
                                         bnd1.shape[1]))
            parts = []
            for gi, (ems, eis, etr, sdd) in enumerate(t["groups"]):
                parts.append(FP._fwd_pallas3(lens, codes_t, ems, eis,
                                             etr, sdd, lm, gbnd, Mp,
                                             Bt, gi))
            out = (parts[0] if len(parts) == 1
                   else jnp.concatenate(parts, axis=0))
            return out, n
        if self.use_pallas and pb.Mp <= 768 and dev.Lmax <= 8192:
            from .ops import fwd_pallas as FP
            from .ops.msv_pallas import _lane_tile
            t = FP.build_fwd_tensors2(pb)
            Bp = int(ridx_dev.shape[0])
            Bt = min(128, _lane_tile(dev.Lmax, Bp))
            R = FP._strip_r_fwd(t["Mp"], Bt)
            strips, lens, lm, bnd = _gather_survivors_strips(
                dev.codes_t, dev.lens_d, ridx_dev, R, Bt)
            if need is not None:
                bnd = jnp.asarray(_pt_bounds(need, lens_sel, pb.P, Bp,
                                             Bt, R))
            out = FP._fwd_pallas2(lens, strips, t["ems"], t["eis"],
                                  t["etr2"], t["sdd"], lm, bnd, R, Bt)
            return out, n
        from .ops.batch import _forward_kernel
        codes, mask, loop, move = _gather_rows_dev(dev, ridx_dev)
        xEj = np.float32(np.log(0.5))
        out = _forward_kernel(
            codes, mask,
            *pb.device("msc", "isc", "tMM", "tIM", "tDM", "tMD", "tDD",
                       "tBM", "tMI", "tII", "kmask"),
            xEj, xEj, loop, move, pb.Kp)
        return out, n

    def _viterbi_dev(self, pb, dev, ridx_dev, n, need=None, lens_sel=None):
        if self.use_pallas and dev.Lmax <= 8192:
            from .ops import vit_pallas as VP
            Bt = min(int(ridx_dev.shape[0]), 128)
            codes_t, lens, lm, bnd = _gather_survivors(
                dev.codes_t, dev.lens_d, ridx_dev, Bt)
            if need is not None:
                Bp = int(ridx_dev.shape[0])
                bnd = jnp.asarray(_pt_bounds(need, lens_sel, pb.P, Bp,
                                             Bt, 1))
            t = VP.build_vit_tensors(pb)
            out = VP._vit_pallas(lens, codes_t, t["msc"], t["isc"],
                                 t["tr"], lm, bnd)
            return out, n
        from .ops.batch import _viterbi_kernel
        codes, mask, loop, move = _gather_rows_dev(dev, ridx_dev)
        xEj = np.float32(np.log(0.5))
        out = _viterbi_kernel(
            codes, mask,
            *pb.device("msc", "isc", "tMM", "tIM", "tDM", "tMD", "tDD",
                       "tBM", "tMI", "tII", "kmask"),
            xEj, xEj, loop, move, pb.Kp)
        return out, n

    # -- driver -------------------------------------------------------------

    def search(self, queries: Sequence[HMM], targets: DigitalSequenceBlock,
               callback=None) -> List[TopHits]:
        """Run hmmsearch for every query HMM; returns one TopHits each,
        in input order, identical to the sequential pipeline's output."""
        if self.device is not None:
            with _jax.default_device(self.device):
                return self._search_impl(queries, targets, callback)
        return self._search_impl(queries, targets, callback)

    def _search_impl(self, queries: Sequence[HMM],
                     targets: DigitalSequenceBlock,
                     callback=None) -> List[TopHits]:
        queries = list(queries)
        bkey = (id(targets), len(targets))
        if self._buckets_cache is not None and self._buckets_cache[0] == bkey:
            buckets = self._buckets_cache[2]
        else:
            buckets = _Buckets(targets)
            # hold a reference to the block so id() stays unique
            self._buckets_cache = (bkey, targets, buckets)
        results: List[Optional[TopHits]] = [None] * len(queries)

        # group queries by padded model length so they share kernel shapes.
        # 32-granular padding: the scan kernels are VPU-throughput-bound in
        # Mp x lanes elements, so dead sublane rows are paid work -- finer
        # groups trade a few extra kernel shapes for ~25% fewer elements on
        # typical Pfam length mixes (sublane tiles are 8, so any multiple
        # of 8 is layout-clean)
        groups: dict = {}
        for qi, hmm in enumerate(queries):
            if hmm.alphabet != self.alphabet:
                raise ValueError("alphabet mismatch between query and engine")
            Mp = B.round_up(hmm.M, 32)
            groups.setdefault(Mp, []).append(qi)
        # coalesce small groups at 128 granularity: a 3-profile group
        # pays the same fixed kernel-launch cost as a 64-profile one,
        # so long-tail model lengths merge upward (extra Mp padding)
        # until the launch cost stops dominating
        gran = int(os.environ.get("PYHMMER_TPU_COALESCE", "128"))
        coalesced: dict = {}
        for Mp, qidx in groups.items():
            key = Mp if len(qidx) >= 32 or gran <= 32 else \
                B.round_up(Mp, gran)
            coalesced.setdefault(key, []).extend(qidx)

        states: List[_ChunkState] = []
        for Mp, qidx in sorted(coalesced.items()):
            for c0 in range(0, len(qidx), self.p_max):
                states.append(_ChunkState(self, queries,
                                          qidx[c0: c0 + self.p_max], Mp))

        for bucket in buckets.buckets:
            idx, codes, lengths, dev = bucket
            if dev is None:
                bucket[3] = B.SeqDevice(
                    codes, lengths,
                    nonres_code=self.alphabet.nonresidue_code)

        # ---- globally staged execution ----
        # Every (profile chunk x sequence bucket) kernel for a stage is
        # enqueued before ANY result is fetched, so the whole workload
        # pays exactly three blocking device->host syncs (~30 ms each on
        # a tunneled chip) instead of three per chunk.  Forward survivors
        # that skip the Viterbi gate are submitted to the GIL-releasing
        # native domain-definition pool as soon as the Forward stage
        # lands, overlapping host postprocessing with the remaining
        # device work (the batched analog of the reference's worker
        # threads, hmmer/_base.py).  Exact-score gate re-checks and Hit
        # construction happen serially at the end.
        from .ops import native as _native
        import concurrent.futures as _cf
        import time as _time
        _timing = os.environ.get("PYHMMER_TPU_TIMING")
        _t0 = _time.time()
        _tmark = {}

        def _mark(name):
            _tmark[name] = _time.time() - _t0
        native_ok = _native.available()
        _marg0 = _native.marginal_count()
        # routing knobs re-read per search so tests can force every pair
        # through the full device cascade (spec <= -1 disables
        # speculation entirely; host-budget scale 0 disables the sparse
        # host path)
        _spec_p1b = float(os.environ.get("PYHMMER_TPU_SPEC_P1B",
                                         str(SPECULATE_P1B)))
        _hb_scale = float(os.environ.get("PYHMMER_TPU_HOST_BUDGET", "1"))
        # worker count == core count: the native calls release the GIL
        # and keep the cores saturated; oversubscribing measurably slows
        # the postprocessing phases (context switching on 2-core hosts)
        nthreads = int(os.environ.get("PYHMMER_TPU_THREADS", "0")) or \
            max(2, os.cpu_count() or 2)
        own_executor = False
        if not native_ok:
            executor = None
        elif self.shared_executor is not None:
            executor = self.shared_executor
        else:
            executor = _cf.ThreadPoolExecutor(nthreads)
            own_executor = True
        pending = []   # (job tuple, future | None)

        def _run_domaindef(job, ext=None):
            """Worker-thread body: optional native Viterbi F2 gate (for
            host-routed sparse pairs that skipped the device Viterbi),
            then native domaindef (GIL released during the C calls) +
            exact-score F3 gate + Hit construction.  The returned Hit is
            appended serially by the collect loop.

            ``ext`` = (rows [3, L+1] f64, fwdsc) from the device rows
            stage: the native call then skips its own full-L parsers
            (they ran on the TPU) and transparently falls back to the
            exact host path on threshold-marginal targets."""
            (ci, bi, pi, tgt, b, seed, fwd_min, filtersc_b, nullsc_b,
             vit_min) = job
            st = states[ci]
            pli = st.pipelines[pi]
            sq = targets[tgt]
            if vit_min is not None and np.isfinite(vit_min):
                v = _native.viterbi_score(st.profs[pi], sq.sequence)
                if v is None:
                    return None                  # caller falls back
                if v < vit_min:
                    return ("gated_vit",)
            if ext is not None:
                out = _native.domaindef(st.profs[pi], sq.sequence,
                                        pli.null2, seed, fwd_min=fwd_min,
                                        ext_rows=ext[0], ext_fwdsc=ext[1])
            else:
                out = _native.domaindef(st.profs[pi], sq.sequence,
                                        pli.null2, seed, fwd_min=fwd_min)
            if out is None:
                return None                      # caller falls back
            fwdsc, res = out
            if fwdsc < fwd_min:
                return ("gated", fwdsc)
            hit = pli._build_hit(st.profs[pi], sq, st.tophits[pi],
                                 fwdsc, nullsc_b, res)
            return ("hit", hit)

        # ---- device rows stage (stage 2b) ----
        # Final survivors that would previously each pay a full native
        # job (full-L fwd + bck parsers + decode ~40% of the native
        # time) are instead batched through the per-pair Pallas rows
        # kernels (ops.rows_pallas); their jobs reach the pool with the
        # region rows attached and the native side starts directly at
        # region finding.  Ineligible pairs (very long buckets, very
        # large models, nonresidue lanes, no Pallas) keep the classic
        # path.
        # MEASURED (round 5, tunneled v5e + 2-core host, 3-run A/Bs):
        # with the rows stage ON the bench reads 3.15 s vs 1.91 s OFF --
        # the per-pair kernels cost ~1.3 ms of serial device time while
        # the host parsers they replace cost ~0.17 ms of pool time, and
        # the [G, L, 4] f64 conversions tax the 2-core host further.  On
        # this hardware the chip, not the host, is the scarce resource,
        # so the stage defaults OFF; it stays CI-covered (forced in
        # tests/test_engine_pallas.py) for hosts where the balance flips
        # (many cores per chip, or future lower-overhead kernels).
        rows_enabled = (self.use_pallas and native_ok and os.environ.get(
            "PYHMMER_TPU_DEVICE_ROWS", "0") == "1")
        rows_pending: dict = {}       # (ci, bi) -> [job, ...]
        rows_launched: list = []
        _rows_ok_cache: dict = {}

        def _rows_ok(ci, bi):
            ok = _rows_ok_cache.get((ci, bi))
            if ok is None:
                dev = buckets.buckets[bi][3]
                Mp_r = max(128, B.round_up(states[ci].pb.Mp, 128))
                ok = rows_enabled and dev.Lmax <= 2048 and Mp_r <= 768
                _rows_ok_cache[(ci, bi)] = ok
            return ok

        def _launch_rows():
            """Enqueue the rows kernels for every deferred pair group
            (device work only; results come back in _collect_rows)."""
            from .ops import rows_pallas as RP
            for key in list(rows_pending):
                jobs = rows_pending.pop(key)
                if not jobs:
                    continue
                ci, bi = key
                st = states[ci]
                dev = buckets.buckets[bi][3]
                pair_p = np.array([j[2] for j in jobs], np.int32)
                pair_b = np.array([j[4] for j in jobs], np.int32)
                terms_d, fsc_d, bsc_d, order = RP.survivor_rows(
                    st.pb, dev, pair_p, pair_b)
                rows_launched.append((ci, bi, [jobs[k] for k in order],
                                      terms_d, fsc_d, bsc_d))

        def _collect_rows():
            """One concatenated fetch of every rows launch, then submit
            the jobs with their device rows attached.  The f32 forward
            score is cross-checked against the backward score (they are
            equal in exact arithmetic): disagreement means the device
            numerics can't be trusted for this pair and it runs the
            classic path instead."""
            if not rows_launched:
                return
            parts = []
            for (_, _, _, t, f, bsc) in rows_launched:
                parts += [t, f, bsc]
            arrs = _fetch_all(parts)
            k = 0
            for (ci, bi, jobs, *_) in rows_launched:
                terms, fsc, bsc = arrs[k], arrs[k + 1], arrs[k + 2]
                k += 3
                lens_b = buckets.buckets[bi][2]
                for g, job in enumerate(jobs):
                    Lb = int(lens_b[job[4]])
                    f32 = float(fsc[g])
                    b32 = float(bsc[g])
                    ext = None
                    if (np.isfinite(f32) and np.isfinite(b32)
                            and abs(f32 - b32) < 2e-2 + 1e-4 * abs(f32)):
                        t = terms[g].astype(np.float64)
                        btot = np.concatenate(
                            [[0.0], np.cumsum(t[:Lb, 0])])
                        etot = np.concatenate(
                            [[0.0], np.cumsum(t[1: Lb + 1, 1])])
                        mocc = 1.0 - t[: Lb + 1, 2]
                        mocc[0] = 0.0
                        ext = (np.ascontiguousarray(
                            np.stack([btot, etot, mocc])), f32)
                        _tmark["n_rows_ext"] = _tmark.get(
                            "n_rows_ext", 0) + 1
                    fut = (executor.submit(_run_domaindef, job, ext)
                           if executor is not None else None)
                    pending.append((job, fut, False))
            rows_launched.clear()

        def _submit(ci, bi, pi, pass_row, fcols, idx, vit_min_row=None,
                    spec=False, defer=False):
            st = states[ci]
            pli = st.pipelines[pi]
            c = ctx[(ci, bi)]
            ev = st.ev[pi]
            F3s = pli.F3 * F3_SLACK
            # exp_surv((fwdsc - filtersc)/LOG2) <= F3s  <=>  fwdsc >= min
            gate_off = (LOG2 * (ev[4] - math.log(F3s) / ev[5])
                        if F3s < 1.0 else -np.inf)
            use_defer = defer and _rows_ok(ci, bi)
            for col in np.where(pass_row)[0]:
                b = int(fcols[col])
                seed = (pli.seed if pli.do_reseeding
                        else int(pli._rng.integers(0, 2**62)))
                filtersc_b = float(c["filtersc"][pi, b])
                nullsc_b = float(c["nullsc"][b])
                vit_min = (None if vit_min_row is None
                           else float(vit_min_row[col]))
                job = (ci, bi, pi, int(idx[b]), b, seed,
                       filtersc_b + gate_off, filtersc_b, nullsc_b,
                       vit_min)
                # nonresidue codes inside the sequence are fine here:
                # the rows kernels zero their emissions exactly like the
                # native parsers (explicit length masks, no padding
                # sentinel), unlike the MSV/bias kernels
                if use_defer:
                    rows_pending.setdefault((ci, bi), []).append(job)
                    continue
                fut = (executor.submit(_run_domaindef, job)
                       if executor is not None else None)
                pending.append((job, fut, spec))

        ctx: dict = {}

        # -- stage 1 (device): MSV (+ fused bias filter) for every
        # chunk x bucket --
        s1_parts = []
        s1_pairs = []   # (ci, bi, part_offset, nparts)
        for ci, st in enumerate(states):
            for bi, bucket in enumerate(buckets.buckets):
                dev = bucket[3]
                dx, ovf, biaslog = self._msv_dev(st.pb, dev)
                parts = [dx, ovf] if biaslog is None else [dx, ovf,
                                                           biaslog]
                s1_pairs.append((ci, bi, len(s1_parts), len(parts)))
                s1_parts.extend(parts)
        _mark("s1_enqueued")

        # -- stage 1 (host): MSV gate, then the exact bias filter on the
        # survivors only (reference cascade order, p7_pipeline.c).  The
        # per-profile bias batches run on the worker pool (the native
        # batch call releases the GIL), overlapping the numpy gating of
        # the remaining (chunk, bucket) pairs. --
        s2_jobs = []
        s1_host_jobs = []   # (npairs1, ci, bi, args, fut)

        def _bias_stage(st, codes, lengths, pass1, nullsc, usc):
            """Worker body: exact bias filter for every profile's MSV
            survivors in one (chunk, bucket)."""
            filtersc = np.full_like(usc, np.nan)
            P1b = np.full_like(usc, np.inf)
            pass2 = np.zeros_like(pass1)
            for pi, pli in enumerate(st.pipelines):
                cols = np.where(pass1[pi])[0]
                if len(cols) == 0:
                    continue
                if pli.bias_filter:
                    logsc = self._bias_host(st, pi, codes, lengths, cols)
                    filtersc[pi, cols] = logsc + nullsc[cols]
                else:
                    filtersc[pi, cols] = nullsc[cols]
                P1b[pi, cols] = gumbel_surv(
                    (usc[pi, cols] - filtersc[pi, cols]) / LOG2,
                    st.ev[pi, 0], st.ev[pi, 1])
                pass2[pi, cols] = P1b[pi, cols] <= pli.F1
            return filtersc, P1b, pass2

        for st in states:
            # prewarm the per-pipeline odds tables serially (idempotent
            # cached property; avoids racy first-builds on the pool)
            for pli in st.pipelines:
                if pli.bias_filter:
                    pli.background.filter_odds_table()

        def _gate_pair(ci, bi, dx_raw, ovf_raw, biaslog_raw=None):
            st = states[ci]
            idx, codes, lengths, dev = buckets.buckets[bi]
            Preal = st.Preal
            dx = dx_raw[:Preal].astype(np.float64)
            ovf = ovf_raw[:Preal]

            nres = int(lengths.sum())
            nseq_real = int((lengths > 0).sum())
            for pli in st.pipelines:
                pli.nseqs += nseq_real
                pli.nres += nres

            valid_b = lengths > 0
            L = np.maximum(lengths.astype(np.float64), 1.0)
            nullsc = dev.nullsc_host                      # [B]
            usc = (dx - dev.tjbu_host[None, :]) / st.pb.scale_b - 3.0
            usc[ovf > 0] = np.inf

            # MSV gate in threshold form (delta >= thr <=> P1 <= F1)
            pass1 = (usc - nullsc[None, :] >= st.thr1) & valid_b[None, :]
            for pi, pli in enumerate(st.pipelines):
                pli.n_past_msv += int(pass1[pi].sum())
            if not pass1.any():
                return
            # device-fused bias prefilter: drop pairs whose f32 device
            # bias score puts them past the F1 gate even with a
            # length-scaled error margin in their favor; only the
            # remaining candidates (true passers + boundary cases) pay
            # the exact f64 host filter that all downstream thresholds
            # are computed from.  Lanes containing nonresidue codes take
            # the host path unconditionally (the device scan freezes on
            # them).
            cand = pass1
            if biaslog_raw is not None:
                fsc32 = biaslog_raw[:Preal].astype(np.float64) + nullsc
                delta = 2e-3 + 1e-6 * L                  # [B] nats
                keep = ((usc - fsc32 + delta >= st.thr1)
                        | dev.has_nonres[None, :])
                for pi, pli in enumerate(st.pipelines):
                    if not pli.bias_filter:
                        keep[pi] = True    # no bias scan needed anyway
                cand = pass1 & keep
                if not cand.any():
                    return
            args = (st, codes, lengths, cand, nullsc, usc)
            fut = (executor.submit(_bias_stage, *args)
                   if executor is not None else None)
            s1_host_jobs.append((int(cand.sum()), ci, bi, args, fut))

        # fetch the MSV stage in two halves so the first half's host
        # gating (and its bias batches on the pool) overlaps the second
        # half's device kernels
        nh = (len(s1_pairs) + 1) // 2
        for lo, hi in ((0, nh), (nh, len(s1_pairs))):
            if lo >= hi:
                continue
            p_lo = s1_pairs[lo][2]
            p_hi = (s1_pairs[hi][2] if hi < len(s1_pairs)
                    else len(s1_parts))
            arrs = _fetch_all(s1_parts[p_lo: p_hi])
            if lo == 0:
                _mark("s1_fetched")
            for (ci, bi, off, nparts) in s1_pairs[lo:hi]:
                a = arrs[off - p_lo: off - p_lo + nparts]
                _gate_pair(ci, bi, a[0], a[1],
                           a[2] if nparts == 3 else None)

        # gate + route in descending survivor count so the densest
        # Forward kernels are enqueued (and later fetched) first -- their
        # domaindef jobs reach the host pool earliest
        s1_host_jobs.sort(key=lambda j: -j[0])
        s2_parts = []
        for npairs1, ci, bi, args, fut in s1_host_jobs:
            st = states[ci]
            idx, codes, lengths, dev = buckets.buckets[bi]
            filtersc, P1b, pass2 = (fut.result() if fut is not None
                                    else _bias_stage(*args))
            nullsc = args[4]
            for pi, pli in enumerate(st.pipelines):
                pli.n_past_bias += int(pass2[pi].sum())
            if not pass2.any():
                continue
            bsel = np.where(pass2.any(axis=0))[0]
            ctx[(ci, bi)] = dict(filtersc=filtersc, nullsc=nullsc,
                                 pass2=pass2, P1b=P1b, bsel=bsel)
            # sparse jobs skip the device cascade entirely: the scan
            # kernels are latency-bound per row (cost ~ Lmax x P
            # grid steps regardless of lane count), so when only a
            # handful of (profile, target) pairs survive, the native
            # host path (Viterbi gate + domaindef with its exact
            # fwd_min bail) is cheaper AND overlaps the device work
            # of the dense buckets
            npairs = int(pass2.sum())
            Lmax_b = codes.shape[1]
            host_budget = native_ok and npairs <= _hb_scale * max(
                4, int(6e-4 * Lmax_b * st.pb.P))
            if host_budget:
                for pi, pli in enumerate(st.pipelines):
                    cols = np.where(pass2[pi])[0]
                    if len(cols) == 0:
                        continue
                    ev = st.ev[pi]
                    skip = P1b[pi, cols] <= pli.F2 * F2_SKIP_SLACK
                    pli.n_past_vit += int(skip.sum())
                    vmin = (filtersc[pi, cols]
                            + LOG2 * (ev[2]
                                      - np.log(pli.F2) / ev[3]))
                    vit_min_row = np.where(skip, -np.inf, vmin)
                    _submit(ci, bi, pi,
                            np.ones(len(cols), dtype=bool),
                            cols, idx, vit_min_row)
                continue
            # speculative host routing of near-certain hits: a pair whose
            # quantized-MSV P-value is far below the skip-Viterbi gate
            # will almost surely reach domaindef, so its job starts on
            # the host pool NOW instead of waiting for the device Forward
            # fetch.  Outcome-identical to the device path: the pair
            # skips Viterbi legitimately (P1b <= F2 * F2_SKIP_SLACK) and
            # the device Forward is only a prefilter -- the exact-f64
            # Forward inside the job applies the reference F3 gate either
            # way.  Mis-speculations cost one fwd_min-bailed parser pass.
            if native_ok:
                spec = pass2 & (P1b <= np.minimum(
                    st.F2 * F2_SKIP_SLACK, _spec_p1b))
                if spec.any():
                    c = ctx[(ci, bi)]
                    _tmark["nspec"] = _tmark.get("nspec", 0) + int(
                        spec.sum())
                    for pi, pli in enumerate(st.pipelines):
                        cols = np.where(spec[pi])[0]
                        if len(cols) == 0:
                            continue
                        pli.n_past_vit += len(cols)
                        _submit(ci, bi, pi,
                                np.ones(len(cols), dtype=bool), cols, idx,
                                spec=True)
                    pass2 = pass2 & ~spec
                    c["pass2"] = pass2
                    if not pass2.any():
                        continue
                    c["bsel"] = np.where(pass2.any(axis=0))[0]
            # enqueue this job's Forward kernel immediately: device work
            # starts while later bias batches are still being gated
            c = ctx[(ci, bi)]
            n = len(c["bsel"])
            Bp = max(128, _pad_b(n))
            ridx = np.full(Bp, -1, dtype=np.int32)
            ridx[:n] = c["bsel"]
            fsc_dev, nsel = self._forward_dev(
                st.pb, buckets.buckets[bi][3], jnp.asarray(ridx), n,
                need=c["pass2"][:, c["bsel"]],
                lens_sel=lengths[c["bsel"]])
            c["nsel"] = nsel
            s2_parts.append(fsc_dev)
            s2_jobs.append((ci, bi))

        # -- stage 2 (device): Forward over bias survivors --
        # Fetch economics (measured): one device->host fetch on the
        # tunneled TPU costs ~26 ms of round-trip latency REGARDLESS of
        # size, while the enqueued kernels themselves run in ~0.05-2 ms.
        # So all Forward kernels are enqueued back to back and the whole
        # stage comes back in ONE concatenated fetch.  (Cascade order
        # note: the odds-space Pallas Forward is cheaper per column than
        # the max-plus Viterbi with its DD prefix scan, so Forward runs
        # on the bias survivors and the strict-F2 Viterbi gate is
        # applied afterwards only where P1b did not already skip it --
        # the gate predicates are independent, so the surviving set is
        # identical to the reference order.)
        s3_jobs = []
        s3_parts = []

        def _stage2_host(j, fsc_raw):
            cj, bi = s2_jobs[j]
            st = states[cj]
            c = ctx[(cj, bi)]
            Preal = st.Preal
            bsel, nsel = c["bsel"], c["nsel"]
            c["fcols"] = bsel
            fsc = fsc_raw[:Preal, :nsel].astype(np.float64)
            P3 = exp_surv((fsc - c["filtersc"][:, bsel]) / LOG2,
                          st.ev[:, 4:5], st.ev[:, 5:6])
            # extra 1.5x device-side margin: the f32 device Forward
            # wobbles a few millibits, so borderline targets must still
            # reach the exact float64 re-check (which applies the real
            # F3 * F3_SLACK gate)
            pass_fwd = c["pass2"][:, bsel] & (P3 <= st.F3
                                              * F3_SLACK * 1.5)
            skip_vit = c["P1b"][:, bsel] <= st.F2 * F2_SKIP_SLACK
            need_vit = pass_fwd & ~skip_vit
            c["pass_fwd"] = pass_fwd
            c["need_vit"] = need_vit
            for pi, pli in enumerate(st.pipelines):
                pli.n_past_vit += int((c["pass2"][pi, bsel]
                                       & skip_vit[pi]).sum())
            if need_vit.any():
                # enqueue the Viterbi kernel for this job immediately
                vcols = np.where(need_vit.any(axis=0))[0]
                c["vcols"] = vcols
                rows = bsel[vcols]
                n = len(rows)
                Bp = max(128, _pad_b(n))
                ridx = np.full(Bp, -1, dtype=np.int32)
                ridx[:n] = rows
                vsc_dev, nv = self._viterbi_dev(
                    st.pb, buckets.buckets[bi][3], jnp.asarray(ridx), n,
                    need=need_vit[:, vcols],
                    lens_sel=buckets.buckets[bi][2][rows])
                c["nv"] = nv
                s3_jobs.append((cj, bi))
                s3_parts.append(vsc_dev)
            idx = buckets.buckets[bi][0]
            for pi in range(Preal):
                _submit(cj, bi, pi, pass_fwd[pi] & ~need_vit[pi],
                        bsel, idx, defer=True)

        # fetch in a few groups: each group's survivors reach the host
        # worker pool while the remaining Forward kernels are still
        # computing on device (a fetch costs ~26 ms; 4 groups trade
        # ~0.1 s of extra round trips for ~0.3 s earlier postprocessing)
        ngroup = max(1, (len(s2_parts) + 3) // 4)
        _mark("s1_host_done")
        _tmark["n_s2_jobs"] = len(s2_jobs)
        _tmark["s2_lanes"] = sum(len(ctx[j]["bsel"]) for j in s2_jobs)
        for g0 in range(0, len(s2_parts), ngroup):
            group_np = _fetch_all(s2_parts[g0: g0 + ngroup])
            for dj, fsc_raw in enumerate(group_np):
                _stage2_host(g0 + dj, fsc_raw)
            # wave-1 rows launches: skip-Viterbi survivors of this fetch
            # group go to the device parsers while later Forward groups
            # are still computing
            _launch_rows()
        _mark("s2_done")
        _tmark["n_s3_jobs"] = len(s3_jobs)
        s3_np = _fetch_all(s3_parts)
        _mark("s3_fetched")

        # -- stage 3 (host): Viterbi gate on the leftover columns --
        for j, (cj, bi) in enumerate(s3_jobs):
            st = states[cj]
            c = ctx[(cj, bi)]
            Preal = st.Preal
            bsel, vcols = c["bsel"], c["vcols"]
            vsc = s3_np[j][:Preal, : c["nv"]].astype(np.float64)
            P2 = gumbel_surv(
                (vsc - c["filtersc"][:, bsel][:, vcols]) / LOG2,
                st.ev[:, 2:3], st.ev[:, 3:4])
            keep = P2 <= st.F2
            c["pass_fwd"][:, vcols] &= (~c["need_vit"][:, vcols]) | keep
            for pi, pli in enumerate(st.pipelines):
                pli.n_past_vit += int((c["need_vit"][pi, vcols]
                                       & keep[pi]).sum())
            idx = buckets.buckets[bi][0]
            survived = c["pass_fwd"][:, vcols] & c["need_vit"][:, vcols]
            for pi in range(Preal):
                _submit(cj, bi, pi, survived[pi], bsel[vcols], idx,
                        defer=True)

        # wave-2 rows launches (Viterbi-gate survivors), then the single
        # rows fetch; jobs with device rows reach the pool here
        _launch_rows()
        _mark("s3_host_done")
        _collect_rows()
        _mark("rows_done")

        # ---- collect: serial append of worker-built hits (deterministic
        # insertion order = deterministic tie-breaking in sort) ----
        for job, fut, spec_job in pending:
            (ci, bi, pi, tgt, b, seed, fwd_min, filtersc_b, nullsc_b,
             vit_min) = job
            st = states[ci]
            pli = st.pipelines[pi]
            vit_gated_here = vit_min is not None and np.isfinite(vit_min)
            out = fut.result() if fut is not None else None
            if spec_job and out is not None:
                key = "nspec_hit" if out[0] == "hit" else "nspec_gated"
                _tmark[key] = _tmark.get(key, 0) + 1
            if out is None:
                # pure-Python fallback (no native library)
                sq = targets[tgt]
                Lb = int(buckets.buckets[bi][2][b])
                pli.background.set_length(Lb)
                st.profs[pi].reconfig_length(Lb)
                st.profs_uni[pi].reconfig_length(Lb)
                if vit_gated_here:
                    v = refops.viterbi_score(st.profs[pi], sq.sequence)
                    if v < vit_min:
                        continue
                    pli.n_past_vit += 1
                fwd = refops.forward(st.profs[pi], sq.sequence)
                Px = float(exp_surv((fwd.score - filtersc_b) / LOG2,
                                    st.ev[pi, 4], st.ev[pi, 5]))
                if Px > pli.F3 * F3_SLACK:
                    continue
                pli.n_past_fwd += 1
                pli._finish_target(st.profs[pi], st.profs_uni[pi], sq,
                                   st.tophits[pi], fwd, nullsc_b)
                continue
            if out[0] == "gated_vit":
                continue
            if vit_gated_here:
                pli.n_past_vit += 1
            if out[0] == "gated":
                continue
            pli.n_past_fwd += 1
            hit = out[1]
            if hit is not None:
                st.tophits[pi].hits.append(hit)
        if executor is not None and own_executor:
            executor.shutdown()
        _mark("collect_done")
        _tmark["npending"] = len(pending)
        _tmark["n_marginal"] = _native.marginal_count() - _marg0
        #: per-search stage timing (seconds since search start), kept for
        #: diagnostics / the bench stage breakdown
        self.last_timing = dict(_tmark)
        if _timing:
            import sys as _sys
            print("# engine timing: " + " ".join(
                f"{k}={v:.3f}" for k, v in _tmark.items())
                + f" npending={len(pending)}", file=_sys.stderr)

        # ---- finalize ----
        for st in states:
            for pi, qi in enumerate(st.chunk):
                pli = st.pipelines[pi]
                if pli.Z_setby == "ntargets":
                    pli.Z = float(pli.nseqs)
                th = st.tophits[pi]
                th._take_accounting(pli)
                th.bit_cutoffs = pli.bit_cutoffs
                th.sort_by_key()
                th.threshold()
                results[qi] = th
                if callback is not None:
                    callback(queries[qi], len(queries))
        return results  # type: ignore[return-value]
