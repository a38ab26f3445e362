"""Model construction: the hmmbuild/phmmer engine.

Mirrors ``pyhmmer.plan7.Builder`` (reference ``src/pyhmmer/plan7.pyx:
605-1150``; C semantics of ``p7_builder.c``/``seqmodel.c``/``eweight.c``):

* ``build(seq, bg)``      -- single-sequence query models (phmmer):
  substitution-matrix conditional probabilities + popen/pextend gap costs
  (``p7_SingleBuilder``/``p7_Seqmodel``)
* ``build_msa(msa, bg)``  -- MSA models (hmmbuild): fast/hand
  architecture, PB sequence weighting, entropy-weighted effective
  sequence number, Dirichlet-prior parameter estimation (``p7_Builder``)
* E-value calibration by simulation (``p7_Lambda``/``p7_MSVMu``/
  ``p7_ViterbiMu``/``p7_Tau``): random background sequences are scored
  with the batched kernels and Gumbel/exponential-tail parameters fitted
  on host -- embarrassingly parallel on TPU.
"""

from __future__ import annotations

import math
import numpy as np
from typing import Optional, Tuple

from ..easel.alphabet import Alphabet
from ..easel.sequence import DigitalSequence
from .hmm import HMM, HMMFlags, Transitions as T
from .background import Background
from .profile import Profile

__all__ = ["Builder"]

# BLOSUM62 in half-bit units, row/col order ACDEFGHIKLMNPQRSTVWY
_BLOSUM62 = """
 4  0 -2 -1 -2  0 -2 -1 -1 -1 -1 -2 -1 -1 -1  1  0  0 -3 -2
 0  9 -3 -4 -2 -3 -3 -1 -3 -1 -1 -3 -3 -3 -3 -1 -1 -1 -2 -2
-2 -3  6  2 -3 -1 -1 -3 -1 -4 -3  1 -1  0 -2  0 -1 -3 -4 -3
-1 -4  2  5 -3 -2  0 -3  1 -3 -2  0 -1  2  0  0 -1 -2 -3 -2
-2 -2 -3 -3  6 -3 -1  0 -3  0  0 -3 -4 -3 -3 -2 -2 -1  1  3
 0 -3 -1 -2 -3  6 -2 -4 -2 -4 -3  0 -2 -2 -2  0 -2 -3 -2 -3
-2 -3 -1  0 -1 -2  8 -3 -1 -3 -2  1 -2  0  0 -1 -2 -3 -2  2
-1 -1 -3 -3  0 -4 -3  4 -3  2  1 -3 -3 -3 -3 -2 -1  3 -3 -1
-1 -3 -1  1 -3 -2 -1 -3  5 -2 -1  0 -1  1  2  0 -1 -2 -3 -2
-1 -1 -4 -3  0 -4 -3  2 -2  4  2 -3 -3 -2 -2 -2 -1  1 -2 -1
-1 -1 -3 -2  0 -3 -2  1 -1  2  5 -2 -2  0 -1 -1 -1  1 -1 -1
-2 -3  1  0 -3  0  1 -3  0 -3 -2  6 -2  0  0  1  0 -3 -4 -2
-1 -3 -1 -1 -4 -2 -2 -3 -1 -3 -2 -2  7 -1 -2 -1 -1 -2 -4 -3
-1 -3  0  2 -3 -2  0 -3  1 -2  0  0 -1  5  1  0 -1 -2 -2 -1
-1 -3 -2  0 -3 -2  0 -3  2 -2 -1  0 -2  1  5 -1 -1 -3 -3 -2
 1 -1  0  0 -2  0 -1 -2  0 -2 -1  1 -1  0 -1  4  1 -2 -3 -2
 0 -1 -1 -1 -2 -2 -2 -1 -1 -1 -1  0 -1 -1 -1  1  5  0 -2 -2
 0 -1 -3 -2 -1 -3 -3  3 -2  1  1 -3 -2 -2 -3 -2  0  4 -3 -1
-3 -2 -4 -3  1 -2 -2 -3 -3 -2 -1 -4 -4 -2 -3 -3 -2 -3 11  2
-2 -2 -3 -2  3 -3  2 -1 -2 -1 -1 -2 -3 -1 -2 -2 -2 -1  2  7
"""


def _parse_matrix(text: str) -> np.ndarray:
    rows = [[float(x) for x in line.split()]
            for line in text.strip().splitlines()]
    return np.array(rows)


_MATRICES = {"BLOSUM62": _parse_matrix(_BLOSUM62)}


def probify_matrix(S: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Solve the implicit probabilistic basis of a score matrix
    (``esl_scorematrix_ProbifyGivenBG``): find lambda with
    ``sum_ab f_a f_b exp(lambda s_ab) = 1``, return conditional
    probabilities ``p(b|a) = f_b exp(lambda s_ab)``."""
    def Z(lam):
        return float((f[:, None] * f[None, :] * np.exp(lam * S)).sum())
    lo, hi = 1e-6, 10.0
    while Z(hi) < 1.0:
        hi *= 2
    for _ in range(100):
        mid = 0.5 * (lo + hi)
        if Z(mid) < 1.0:
            lo = mid
        else:
            hi = mid
    lam = 0.5 * (lo + hi)
    cond = f[None, :] * np.exp(lam * S)
    cond /= cond.sum(axis=1, keepdims=True)
    return cond


class Builder:
    """Profile HMM construction engine."""

    def __init__(
        self,
        alphabet: Alphabet,
        *,
        architecture: str = "fast",
        weighting: str = "pb",
        effective_number="entropy",
        prior_scheme: str = "alphabet",
        symfrac: float = 0.5,
        fragthresh: float = 0.5,
        wid: float = 0.62,
        esigma: float = 45.0,
        eid: float = 0.62,
        ere: Optional[float] = None,
        popen: Optional[float] = None,
        pextend: Optional[float] = None,
        score_matrix: Optional[str] = None,
        window_length: Optional[int] = None,
        window_beta: Optional[float] = None,
        seed: int = 42,
        EmL: int = 200, EmN: int = 200,
        EvL: int = 200, EvN: int = 200,
        EfL: int = 100, EfN: int = 200, Eft: float = 0.04,
    ):
        if architecture not in ("fast", "hand"):
            raise ValueError(f"invalid architecture: {architecture!r}")
        if weighting not in ("pb", "gsc", "blosum", "none", "given"):
            raise ValueError(f"invalid weighting: {weighting!r}")
        self.alphabet = alphabet
        self.architecture = architecture
        self.weighting = weighting
        self.effective_number = effective_number
        self.prior_scheme = prior_scheme
        self.symfrac = symfrac
        self.fragthresh = fragthresh
        self.wid = wid
        self.esigma = esigma
        self.eid = eid
        # entropy targets (p7_ETARGET_*)
        if ere is not None:
            self.ere = ere
        elif alphabet.is_nucleic():
            self.ere = 0.62   # p7_ETARGET_DNA
        else:
            self.ere = 0.59   # p7_ETARGET_AMINO
        self.popen = popen if popen is not None else (
            0.03125 if alphabet.is_nucleic() else 0.02)
        self.pextend = pextend if pextend is not None else (
            0.75 if alphabet.is_nucleic() else 0.4)
        self.score_matrix = score_matrix or (
            "DNA1" if alphabet.is_nucleic() else "BLOSUM62")
        self.window_length = window_length
        self.window_beta = window_beta if window_beta is not None else 1e-7
        self.seed = seed
        self.EmL, self.EmN = EmL, EmN
        self.EvL, self.EvN = EvL, EvN
        self.EfL, self.EfN, self.Eft = EfL, EfN, Eft
        self.randomness = np.random.default_rng(seed)

    def copy(self) -> "Builder":
        """A fresh Builder carrying every configuration option (the app
        layer calls this once per query; dropping options here silently
        discards user settings -- reference ``Builder.copy``,
        plan7.pyx:1093-1118)."""
        return Builder(
            self.alphabet, architecture=self.architecture,
            weighting=self.weighting,
            effective_number=self.effective_number,
            prior_scheme=self.prior_scheme,
            symfrac=self.symfrac, fragthresh=self.fragthresh,
            wid=self.wid, esigma=self.esigma, eid=self.eid,
            ere=self.ere, popen=self.popen, pextend=self.pextend,
            score_matrix=self.score_matrix,
            window_length=self.window_length,
            window_beta=self.window_beta, seed=self.seed,
            EmL=self.EmL, EmN=self.EmN, EvL=self.EvL, EvN=self.EvN,
            EfL=self.EfL, EfN=self.EfN, Eft=self.Eft)

    # --- single sequence (phmmer) ------------------------------------------

    def build(self, sequence: DigitalSequence, background: Background
              ) -> Tuple[HMM, "Profile", "Profile"]:
        """Build a query model from one sequence (``p7_SingleBuilder``)."""
        if sequence.alphabet != self.alphabet:
            raise ValueError("alphabet mismatch")
        dsq = sequence.sequence
        K = self.alphabet.K
        keep = dsq < K                    # canonical residues only
        core = dsq[keep]
        M = len(core)
        if M == 0:
            raise ValueError("cannot build a model from an empty sequence")
        if self.alphabet.is_amino():
            S = _MATRICES[self.score_matrix.upper()]
        else:
            # simple DNA identity-ish matrix
            S = np.full((K, K), -3.0)
            np.fill_diagonal(S, 1.0)
        cond = probify_matrix(S, background.residue_frequencies)

        hmm = HMM(self.alphabet, M, name=sequence.name)
        hmm.accession = sequence.accession or None
        hmm.description = sequence.description or None
        hmm.mat[1:] = cond[core]
        hmm.ins[:] = background.residue_frequencies
        # transitions from popen/pextend (p7_Seqmodel)
        hmm.t[:, T.MM] = 1.0 - 2.0 * self.popen
        hmm.t[:, T.MI] = self.popen
        hmm.t[:, T.MD] = self.popen
        hmm.t[:, T.IM] = 1.0 - self.pextend
        hmm.t[:, T.II] = self.pextend
        hmm.t[:, T.DM] = 1.0 - self.pextend
        hmm.t[:, T.DD] = self.pextend
        hmm.t[M, T.MM] = 1.0 - self.popen   # last node: no D_{M+1}
        hmm.t[M, T.MD] = 0.0
        hmm.t[M, T.DM] = 1.0
        hmm.t[M, T.DD] = 0.0
        hmm.mat[0] = 0.0
        hmm.mat[0, 0] = 1.0
        hmm.nseq = 1
        hmm.eff_nseq = 1.0
        hmm.checksum = None
        hmm.set_consensus()
        hmm.set_composition()
        self.calibrate(hmm, background)
        prof = Profile(M, self.alphabet).configure(hmm, background, 400)
        return hmm, prof, prof

    # --- MSA (hmmbuild) -----------------------------------------------------

    def build_msa(self, msa, background: Background
                  ) -> Tuple[HMM, "Profile", "Profile"]:
        """Build a model from a multiple alignment (``p7_Builder``)."""
        K = self.alphabet.K
        gap = self.alphabet.gap_code
        ali = msa.codes                      # [nseq, alen] uint8
        nseq, alen = ali.shape

        weights = msa.weights if (self.weighting == "given"
                                  and msa.weights is not None) else None
        if weights is None:
            if self.weighting == "pb":
                weights = _pb_weights(ali, K, gap)
            elif self.weighting == "none":
                weights = np.ones(nseq)
            else:
                weights = _pb_weights(ali, K, gap)

        # architecture: consensus columns
        is_res = (ali < K)
        if self.architecture == "hand":
            if msa.reference is None:
                raise ValueError("hand architecture requires an RF line")
            rf = np.frombuffer(msa.reference, dtype="S1")
            cons_cols = np.array([c not in (b".", b"-", b"~", b" ")
                                  for c in rf])
        else:
            occ = (weights[:, None] * is_res).sum(axis=0) / weights.sum()
            cons_cols = occ >= self.symfrac
        M = int(cons_cols.sum())
        if M == 0:
            raise ValueError("no consensus columns in alignment")

        # weighted observed counts
        mat = np.zeros((M + 1, K))
        ins = np.zeros((M + 1, K))
        t = np.zeros((M + 1, 7))
        cons_idx = np.where(cons_cols)[0]
        col_of = np.full(alen, -1)
        col_of[cons_idx] = np.arange(1, M + 1)

        for s in range(nseq):
            w = weights[s]
            row = ali[s]
            # emissions
            for a in range(alen):
                c = row[a]
                if c >= K:
                    continue
                kk = col_of[a]
                if kk > 0:
                    mat[kk, c] += w
                else:
                    # insert column: assign to previous consensus col
                    prev = col_of[:a]
                    kprev = prev[prev > 0]
                    ins[kprev[-1] if len(kprev) else 0, c] += w
            # transitions along the path
            state, node = "M", 0   # start at node 0 (B)
            for a in range(alen):
                c = row[a]
                kk = col_of[a]
                if kk > 0:
                    new_state = "M" if c < K else "D"
                    t[node, {"M": {"M": T.MM, "D": T.MD},
                             "I": {"M": T.IM, "D": T.MD},
                             "D": {"M": T.DM, "D": T.DD}}[state][new_state]
                      if state != "I" or new_state != "D" else T.MD] += w
                    state, node = new_state, kk
                elif c < K:   # insert residue
                    t[node, T.MI if state == "M" else
                      (T.II if state == "I" else T.MI)] += w
                    state = "I"
            t[node, T.MM if state != "D" else T.DM] += w   # exit to E

        # effective sequence number by entropy weighting
        eff = float(nseq)
        if self.effective_number == "entropy":
            eff = _entropy_weight(mat[1:], weights.sum(), background,
                                  self.ere, self.esigma, M)
        elif isinstance(self.effective_number, (int, float)):
            eff = float(self.effective_number)
        scale = eff / weights.sum()
        mat *= scale
        ins *= scale
        t *= scale

        # add priors (simplified Dirichlet: Laplace +1-ish scaled)
        hmm = HMM(self.alphabet, M, name=msa.name or b"aligned-model")
        bgf = background.residue_frequencies
        hmm.mat[1:] = mat[1:] + bgf * 1.0
        hmm.ins[:] = ins + bgf * 1.0
        hmm.t[:, 0:3] = t[:, 0:3] + np.array([0.7, 0.1, 0.1])
        hmm.t[:, 3:5] = t[:, 3:5] + np.array([0.6, 0.4])
        hmm.t[:, 5:7] = t[:, 5:7] + np.array([0.6, 0.4])
        hmm.renormalize()
        hmm.t[0, T.DM] = 1.0
        hmm.t[0, T.DD] = 0.0
        hmm.t[M, T.MD] = 0.0
        hmm.t[M, 0:3] /= hmm.t[M, 0:3].sum()
        hmm.t[M, T.DM] = 1.0
        hmm.t[M, T.DD] = 0.0
        hmm.mat[0] = 0.0
        hmm.mat[0, 0] = 1.0
        hmm.nseq = nseq
        hmm.eff_nseq = eff
        hmm.set_consensus()
        hmm.set_composition()
        self.calibrate(hmm, background)
        prof = Profile(M, self.alphabet).configure(hmm, background, 400)
        return hmm, prof, prof

    # --- calibration ---------------------------------------------------------

    def calibrate(self, hmm: HMM, background: Background) -> None:
        """Determine E-value parameters by simulation
        (``p7_Calibrate``: lambda from relative entropy; MSV/Viterbi
        Gumbel mu and Forward exponential tau from random-sequence
        score distributions)."""
        from ..ops import reference as refops
        lam = math.log(2.0) + 1.44 / (hmm.M * max(
            hmm.mean_match_relative_entropy(), 0.1))
        rng = np.random.default_rng(self.seed)
        f = background.residue_frequencies
        prof = Profile(hmm.M, hmm.alphabet).configure(hmm, background,
                                                      self.EmL)

        fprob = np.asarray(f, dtype=np.float64)
        fprob = fprob / fprob.sum()

        def sample_scores(L, N, fn):
            out = np.empty(N)
            prof.reconfig_length(L)
            nullsc = background.null_one(L)
            for n in range(N):
                dsq = rng.choice(len(fprob), size=L, p=fprob).astype(np.uint8)
                out[n] = (fn(prof, dsq) - nullsc) / math.log(2.0)
            return out

        # MSV mu: Gumbel location MLE with fixed lambda
        msv = sample_scores(self.EmL, self.EmN,
                            lambda p, d: refops.msv_score(p, d))
        mmu = -math.log(np.exp(-lam * msv).mean()) / lam
        vit = sample_scores(self.EvL, self.EvN, refops.viterbi_score)
        vmu = -math.log(np.exp(-lam * vit).mean()) / lam
        fwd = sample_scores(self.EfL, self.EfN,
                            lambda p, d: refops.forward(p, d).score)
        # exponential tail fit on the top Eft mass
        srt = np.sort(fwd)[::-1]
        ntail = max(2, int(round(self.Eft * len(srt))))
        tail = srt[:ntail]
        mu_fit = tail.min()
        # ML exponential rate on the tail is replaced by the calibrated
        # lambda (HMMER convention); tau shifts so the tail mass is Eft
        tau = mu_fit + math.log(self.Eft) / lam
        hmm.evparam[:] = [mmu, lam, vmu, lam, tau, lam]
        hmm.flags |= HMMFlags.STATS

    # properties matching the reference API
    @property
    def seed_value(self):
        return self.seed


def _pb_weights(ali: np.ndarray, K: int, gap: int) -> np.ndarray:
    """Position-based (Henikoff) sequence weights (``esl_msaweight_PB``)."""
    nseq, alen = ali.shape
    w = np.zeros(nseq)
    for a in range(alen):
        col = ali[:, a]
        res = col < K
        if not res.any():
            continue
        vals, counts = np.unique(col[res], return_counts=True)
        r = len(vals)
        contrib = np.zeros(nseq)
        for v, c in zip(vals, counts):
            contrib[col == v] = 1.0 / (r * c)
        w += contrib
    if w.sum() == 0:
        return np.ones(nseq)
    w *= nseq / w.sum()
    return w


def _entropy_weight(counts: np.ndarray, wsum: float, background: Background,
                    ere: float, esigma: float, M: int) -> float:
    """Entropy-weighted effective sequence number (``p7_EntropyWeight``):
    find eff_nseq such that the mean match relative entropy hits the
    target ``etarget = max(ere, esigma-scaled floor)``; bisection on the
    scaling factor."""
    etarget = max(ere, 6.0 * 0.5 * esigma / (M + 18.0) / math.log(2) / 2)
    f = background.residue_frequencies

    def rel_entropy(scale):
        c = counts * scale + f * 1.0     # plus prior
        p = c / c.sum(axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            kl = np.where(p > 0, p * np.log2(p / f), 0.0)
        return float(kl.sum(axis=1).mean())

    if rel_entropy(1.0) <= etarget:
        return wsum
    lo, hi = 1e-4, 1.0
    for _ in range(60):
        mid = math.sqrt(lo * hi)
        if rel_entropy(mid) > etarget:
            hi = mid
        else:
            lo = mid
    return wsum * math.sqrt(lo * hi)
