"""E-value calibration parity against a reference hmmbuild.

Rebuilds LuxC from its bundled MSA and compares the simulated evparams
with the STATS lines hmmbuild wrote into the bundled ``LuxC.hmm``
(round-3 verdict, missing #3).  The two runs use different RNG streams,
so mu/tau carry simulation sampling noise (sigma ~0.1 bits for the
N=200 Gumbel location fits, ~0.35 bits for the 8-sample exponential
tail); lambda is a deterministic function of the model and must match
almost exactly.  Tau additionally carries a known ~+0.4-bit systematic
vs the reference's FLogsum-table ForwardParser (PARITY_NOTES).
"""
import math

import numpy as np
import pytest

from pyhmmer_tpu.easel import MSAFile
from pyhmmer_tpu.easel.alphabet import Alphabet
from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.builder import Builder
from pyhmmer_tpu.plan7.background import Background
from pyhmmer_tpu.plan7.fitting import (gumbel_fit_complete,
                                       gumbel_fit_complete_loc,
                                       exp_fit_complete)


def test_luxc_evparam_parity(data_dir):
    aa = Alphabet.amino()
    with MSAFile(data_dir / "msa" / "LuxC.sto", digital=True,
                 alphabet=aa) as f:
        msa = f.read()
    with HMMFile(data_dir / "hmms" / "txt" / "LuxC.hmm") as f:
        ref = f.read()
    hmm, _, _ = Builder(aa).build_msa(msa, Background(aa))

    ours = np.asarray(hmm.evparam, dtype=float)
    want = np.asarray(ref.evparam, dtype=float)
    # lambda: deterministic p7_Lambda formula on a golden-matching model
    assert abs(ours[1] - want[1]) < 1e-3
    assert ours[1] == ours[3] == ours[5]
    # MSV mu: quantized-filter Gumbel location fit, sampling noise only
    assert abs(ours[0] - want[0]) < 0.5, (ours[0], want[0])
    # Viterbi mu: VF semantics (zero NN/CC/JJ, -3 nats); sampling noise
    assert abs(ours[2] - want[2]) < 0.5, (ours[2], want[2])
    # Forward tau: 8-sample tail fit noise + a +0.65 +- 0.34 bit
    # systematic (measured over 5 seeds, round 5).  The FLogsum-table
    # hypothesis is REFUTED by direct A/B: calibrating through HMMER's
    # 16k-entry table scorer (ops.native.forward_flogsum, now the
    # calibrate-path scorer) moves tau by +0.005 bits vs exact
    # logsumexp, and the f32 odds-space parser matches exact to <1e-4
    # bits on random sequences -- every scorer we can build agrees.
    # The residual offset must live in the reference's own vectorized
    # ForwardParser behavior on deep-negative random-sequence scores
    # (sparse-rescaling underflow is the leading suspect), which cannot
    # be reproduced without the vendored C (PARITY_NOTES round 5).
    assert abs(ours[4] - want[4]) < 1.2, (ours[4], want[4])


def test_gumbel_fit_complete_recovers_parameters():
    rng = np.random.default_rng(3)
    mu_true, lam_true = 4.2, 0.71
    x = mu_true - np.log(-np.log(rng.uniform(size=4000))) / lam_true
    mu, lam = gumbel_fit_complete(x)
    assert abs(mu - mu_true) < 0.08
    assert abs(lam - lam_true) < 0.03
    # location-only fit with the true lambda
    mu2 = gumbel_fit_complete_loc(x, lam_true)
    assert abs(mu2 - mu_true) < 0.08


def test_exp_fit_complete_recovers_parameters():
    rng = np.random.default_rng(4)
    mu_true, lam_true = -1.5, 0.9
    x = mu_true + rng.exponential(1.0 / lam_true, size=4000)
    mu, lam = exp_fit_complete(x)
    assert abs(mu - mu_true) < 0.01
    assert abs(lam - lam_true) < 0.05


def test_forward_flogsum_table_behavior(data_dir):
    """The FLogsum-table Forward (logsum.c emulation, the calibrate-path
    scorer) must sit a hair ABOVE the exact logsumexp score -- the
    truncated-index lookup overestimates every sum -- and within ~0.01
    bits of it.  This is the direct A/B that refutes the table as the
    source of the tau systematic."""
    import math
    from pyhmmer_tpu.ops import native, reference as ref
    from pyhmmer_tpu.plan7.profile import Profile
    if not native.available():
        pytest.skip("no native library")
    aa = Alphabet.amino()
    with HMMFile(data_dir / "hmms" / "txt" / "Thioesterase.hmm") as f:
        hmm = f.read()
    bg = Background(aa)
    prof = Profile(hmm.M, aa).configure(hmm, bg, 100)
    rng = np.random.default_rng(5)
    f_ = np.asarray(bg.residue_frequencies, float)
    f_ = f_ / f_.sum()
    LOG2 = math.log(2.0)
    for _ in range(5):
        dsq = rng.choice(len(f_), size=100, p=f_).astype(np.uint8)
        exact = ref._forward_np(prof, dsq).score / LOG2
        tab = native.forward_flogsum(prof, dsq) / LOG2
        assert -1e-4 < tab - exact < 2e-2, (tab, exact)
