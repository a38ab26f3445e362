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
    # Forward tau: 8-sample tail fit noise + known ~0.4-bit systematic
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
