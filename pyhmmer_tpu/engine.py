"""The batched search engine: TPU filter cascade + host domain machinery.

This is the TPU-native replacement for the reference's thread-parallel
search loops (``hmmer/_base.py`` dispatchers + per-target ``p7_Pipeline``
calls): instead of one comparison at a time per CPU thread, the engine
runs the filter cascade for *stacks of profiles x buckets of sequences* in
single device kernels (`pyhmmer_tpu.ops.batch`), compacts survivors on the
host, and hands the rare Forward survivors to the exact float64 domain
postprocessing (`plan7.domaindef`) so the reported numbers are identical
to the sequential oracle pipeline.
"""

from __future__ import annotations

import math
import numpy as np
from typing import Iterable, List, Optional, Sequence

from .easel.alphabet import Alphabet
from .easel.sequence import DigitalSequence, DigitalSequenceBlock
from .plan7.hmm import HMM
from .plan7.background import Background
from .plan7.profile import Profile
from .plan7.pipeline import Pipeline, F3_SLACK, LOG2, MAX_TARGET_LENGTH
from .plan7.evalues import gumbel_surv, exp_surv
from .plan7.results import TopHits
from .ops import reference as refops
from .ops import batch as B

__all__ = ["SearchEngine"]

#: max profiles stacked per kernel call
DEFAULT_P_MAX = 16
#: target area (B * Lmax) per sequence bucket
DEFAULT_BUCKET_AREA = 1 << 18


class _Buckets:
    """Length-bucketed packing of a target block.

    Bucket shapes come from a fixed ladder (Lmax = 128 * 2^k, B chosen so
    B * Lmax ~ area, padded with empty rows) so kernel shapes -- and thus
    XLA compilations -- are shared across queries and databases.
    """

    def __init__(self, block: DigitalSequenceBlock, area: int = DEFAULT_BUCKET_AREA):
        lengths = np.array([len(s) for s in block], dtype=np.int64)
        fill = block.alphabet.nonresidue_code
        self.buckets = []   # (indices[B], codes[B, Lmax], lengths[B])
        ladder = [512 << (2 * k) for k in range(5)]   # 512 .. 131072
        for li, Lmax in enumerate(ladder):
            lo = 0 if li == 0 else ladder[li - 1]
            sel = np.where((lengths > lo if li else lengths >= 1)
                           & (lengths <= Lmax))[0]
            if li == 0:
                sel = np.where((lengths >= 1) & (lengths <= Lmax))[0]
            if len(sel) == 0:
                continue
            Bfull = max(8, area // Lmax)
            for s0 in range(0, len(sel), Bfull):
                idx = sel[s0: s0 + Bfull]
                Bp = Bfull if len(sel) > Bfull else _pad_b(len(idx))
                codes = np.full((Bp, Lmax), fill, dtype=np.uint8)
                blens = np.zeros(Bp, dtype=np.int64)
                for r, s in enumerate(idx):
                    seq = block[int(s)].sequence
                    codes[r, : len(seq)] = seq
                    blens[r] = len(seq)
                self.buckets.append(
                    [idx.astype(np.int64), codes, blens, None])


def _pad_select(codes, lengths, bsel):
    """Gather survivor rows padded up a small batch-size ladder so the
    Viterbi/Forward stages reuse a bounded set of kernel shapes."""
    n = len(bsel)
    Bp = _pad_b(n)
    csel = np.zeros((Bp, codes.shape[1]), dtype=codes.dtype)
    lsel = np.zeros(Bp, dtype=lengths.dtype)
    csel[:n] = codes[bsel]
    lsel[:n] = lengths[bsel]
    return csel, lsel, n


def _pad_b(n: int) -> int:
    """Pad a batch size up a small ladder to bound compilation count."""
    for b in (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096):
        if n <= b:
            return b
    return B.round_up(n, 4096)


class SearchEngine:
    """Batched hmmsearch over many queries and one target block."""

    def __init__(self, alphabet: Alphabet, background: Optional[Background] = None,
                 p_max: int = DEFAULT_P_MAX, use_pallas: Optional[bool] = None,
                 **pipeline_options):
        self.alphabet = alphabet
        self.background = background or Background(alphabet)
        self.p_max = p_max
        if use_pallas is None:
            import jax
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        self.options = pipeline_options

    def _msv(self, pb, codes, lengths, dev):
        if self.use_pallas:
            from .ops.msv_pallas import msv_scores_pallas
            return msv_scores_pallas(pb, codes, lengths, dev=dev)
        return B.msv_scores(pb, codes, lengths, dev=dev)

    def search(self, queries: Sequence[HMM], targets: DigitalSequenceBlock,
               callback=None) -> List[TopHits]:
        """Run hmmsearch for every query HMM; returns one TopHits each,
        in input order, identical to the sequential pipeline's output."""
        queries = list(queries)
        ntargets = len(targets)
        buckets = _Buckets(targets)
        results: List[Optional[TopHits]] = [None] * len(queries)

        # group queries by padded model length so they share kernel shapes
        # (coarse 256-steps: compute is cheap next to compile/dispatch)
        groups: dict = {}
        for qi, hmm in enumerate(queries):
            if hmm.alphabet != self.alphabet:
                raise ValueError("alphabet mismatch between query and engine")
            Mp = B.round_up(hmm.M, 256)
            groups.setdefault(Mp, []).append(qi)

        for Mp, qidx in sorted(groups.items()):
            for c0 in range(0, len(qidx), self.p_max):
                chunk = qidx[c0: c0 + self.p_max]
                self._search_chunk(queries, chunk, targets, buckets,
                                   ntargets, results, callback, Mp)
        return results  # type: ignore[return-value]

    # -- internals ----------------------------------------------------------

    def _search_chunk(self, queries, chunk, targets, buckets, ntargets,
                      results, callback, Mp):
        bg = self.background
        pipelines = []
        profs, profs_uni = [], []
        for qi in chunk:
            hmm = queries[qi]
            pli = Pipeline(self.alphabet, bg.copy(), **self.options)
            pli.nmodels = 1
            pli.nnodes = hmm.M
            prof = Profile(hmm.M, hmm.alphabet).configure(hmm, pli.background,
                                                          400, multihit=True)
            prof_uni = Profile(hmm.M, hmm.alphabet).configure(
                hmm, pli.background, 400, multihit=False)
            pli.background.set_filter(hmm.M, prof.compo)
            if pli.bit_cutoffs_mode is not None:
                idx = {"gathering": 0, "trusted": 2,
                       "noise": 4}[pli.bit_cutoffs_mode]
                c = hmm.cutoffs
                if c[idx] <= -99998.0:
                    raise ValueError(
                        f"model {hmm.name!r} has no "
                        f"{pli.bit_cutoffs_mode} cutoffs")
                pli.bit_cutoffs = (float(c[idx]), float(c[idx + 1]))
            pipelines.append(pli)
            profs.append(prof)
            profs_uni.append(prof_uni)

        # pad the profile stack up a small ladder so kernel P-shapes are
        # shared across chunks (bounds XLA compilation count)
        Preal = len(chunk)
        Ppad = 1
        while Ppad < Preal:
            Ppad *= 2
        profs_padded = profs + [profs[0]] * (Ppad - Preal)
        pb = B.ProfileBatch(profs_padded, Mp=Mp)
        ev = np.stack([p.evparam.astype(np.float64) for p in profs])  # [Preal,6]

        tophits = []
        for pi, qi in enumerate(chunk):
            th = TopHits()
            th.query_name = profs[pi].name
            th.query_accession = profs[pi].accession
            th.query_length = profs[pi].M
            tophits.append(th)

        for bucket in buckets.buckets:
            idx, codes, lengths, dev = bucket
            if dev is None:
                dev = B.SeqDevice(codes, lengths)
                bucket[3] = dev
            nres = int(lengths.sum())
            nseq_real = int((lengths > 0).sum())
            for pli in pipelines:
                pli.nseqs += nseq_real
                pli.nres += nres

            valid_b = lengths > 0
            L = np.maximum(lengths.astype(np.float64), 1.0)
            nullsc = L * np.log(L / (L + 1.0)) + np.log(1.0 / (L + 1.0))  # [B]

            # stage 1: quantized MSV, all pairs (Pallas kernel on TPU)
            usc = self._msv(pb, codes, lengths, dev)[:Preal]        # [P, B]
            P1 = gumbel_surv((usc - nullsc[None, :]) / LOG2,
                             ev[:, 0:1], ev[:, 1:2])
            pass1 = ((P1 <= np.array([pli.F1 for pli in pipelines])[:, None])
                     & valid_b[None, :])
            if not pass1.any():
                continue

            # stage 2: bias filter for sequences that passed MSV anywhere
            filtersc = B.bias_filter_scores(pb, codes, lengths,
                                            dev)[:Preal]
            P1b = gumbel_surv((usc - filtersc) / LOG2,
                              ev[:, 0:1], ev[:, 1:2])
            pass2 = pass1 & (P1b <= np.array(
                [pli.F1 for pli in pipelines])[:, None])
            for pi, pli in enumerate(pipelines):
                pli.n_past_msv += int(pass1[pi].sum())
                pli.n_past_bias += int(pass2[pi].sum())
            if not pass2.any():
                continue

            # stage 3+4 reordered for dispatch economy: Forward runs on the
            # bias survivors, and the (strict-F2) Viterbi gate is evaluated
            # afterwards only for the rare Forward survivors that did not
            # skip Viterbi -- the gate predicates are independent, so the
            # surviving set is identical to the reference's
            # MSV->bias->Viterbi->Forward order.
            F2 = np.array([pli.F2 for pli in pipelines])[:, None]
            F3 = np.array([pli.F3 for pli in pipelines])[:, None]
            skip_vit = P1b <= F2
            bsel = np.where(pass2.any(axis=0))[0]
            csel, lsel, nsel = _pad_select(codes, lengths, bsel)
            fsc = B.forward_scores(pb, csel, lsel)[:Preal, :nsel]
            P3 = exp_surv((fsc - filtersc[:, bsel]) / LOG2,
                          ev[:, 4:5], ev[:, 5:6])
            pass_fwd = pass2[:, bsel] & (P3 <= F3 * F3_SLACK)
            need_vit = pass_fwd & ~skip_vit[:, bsel]
            if need_vit.any():
                vcols = np.where(need_vit.any(axis=0))[0]
                cv, lv, nv = _pad_select(csel, lsel, vcols)
                vsc = B.viterbi_scores(pb, cv, lv)[:Preal, :nv]
                P2 = gumbel_surv((vsc - filtersc[:, bsel][:, vcols]) / LOG2,
                                 ev[:, 2:3], ev[:, 3:4])
                keep = P2 <= F2
                pass_fwd[:, vcols] &= (~need_vit[:, vcols]) | keep
            pass4 = pass_fwd
            for pi, pli in enumerate(pipelines):
                pli.n_past_vit += int((pass2[pi] & (skip_vit[pi] |
                                                    np.isin(np.arange(len(skip_vit[pi])), bsel))).sum())

            # stage 5: exact float64 postprocessing per survivor
            for pi, pli in enumerate(pipelines):
                for col in np.where(pass4[pi])[0]:
                    b = int(bsel[col])
                    sq = targets[int(idx[b])]
                    Lb = int(lengths[b])
                    pli.background.set_length(Lb)
                    profs[pi].reconfig_length(Lb)
                    profs_uni[pi].reconfig_length(Lb)
                    fwd = refops.forward(profs[pi], sq.sequence)
                    # re-check the gate with the exact forward score so the
                    # batched path agrees with the sequential oracle
                    Px = float(exp_surv((fwd.score - filtersc[pi, b]) / LOG2,
                                        ev[pi, 4], ev[pi, 5]))
                    if Px > pli.F3 * F3_SLACK:
                        continue
                    pli.n_past_fwd += 1
                    pli._finish_target(profs[pi], profs_uni[pi], sq,
                                       tophits[pi], fwd, float(nullsc[b]))

        out = []
        for pi, qi in enumerate(chunk):
            pli = pipelines[pi]
            if pli.Z_setby == "ntargets":
                pli.Z = float(pli.nseqs)
            th = tophits[pi]
            th._take_accounting(pli)
            th.bit_cutoffs = pli.bit_cutoffs
            th.sort_by_key()
            th.threshold()
            results[qi] = th
            if callback is not None:
                callback(queries[qi], len(chunk))
        return results
