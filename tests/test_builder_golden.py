"""Builder fidelity: rebuild a bundled MSA and match the reference
hmmbuild output (tests/data/hmms/txt/LuxC.hmm was built from
tests/data/msa/LuxC.sto by HMMER 3.3.2 hmmbuild with defaults).

Pins the full default path: consensus-column PB weights -> fast
architecture -> fake traces + doctoring -> entropy-weighted effective
sequence number (esl_root_Bisection convention) -> mixture-Dirichlet
parameter estimation (Blocks9 + fixed amino insert prior)."""

import numpy as np
import pytest

from pyhmmer_tpu.easel import MSAFile
from pyhmmer_tpu.easel.alphabet import Alphabet
from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.builder import Builder
from pyhmmer_tpu.plan7.background import Background


@pytest.fixture(scope="module")
def luxc(data_dir):
    aa = Alphabet.amino()
    with MSAFile(data_dir / "msa" / "LuxC.sto", digital=True,
                 alphabet=aa) as f:
        msa = next(iter(f))
    with HMMFile(data_dir / "hmms" / "txt" / "LuxC.hmm") as f:
        ref = next(iter(f))
    return aa, msa, ref


def test_build_msa_matches_reference_hmmbuild(luxc):
    aa, msa, ref = luxc
    hmm, prof, _ = Builder(aa).build_msa(msa, Background(aa))

    # architecture: exact consensus-column assignment
    assert hmm.M == ref.M == 400
    assert np.array_equal(hmm.map, ref.map)

    # effective sequence number: exact to the reference's printed value
    # (the bisection grid is deterministic)
    assert hmm.eff_nseq == pytest.approx(1.98999, abs=1e-4)

    # probability parameters: log-space agreement.  The residual is
    # sub-percent weight-vector wobble (the reference's exact esl PB
    # internals aren't fully recoverable without the C source); the
    # tolerances below fail loudly for any structural regression
    # (wrong prior, wrong counting, wrong eff-number).
    dm = np.abs(np.log(np.maximum(hmm.mat[1:], 1e-9))
                - np.log(np.maximum(ref.mat[1:], 1e-9)))
    assert dm.mean() < 0.01
    assert dm.max() < 0.05
    di = np.abs(np.log(np.maximum(hmm.ins, 1e-9))
                - np.log(np.maximum(ref.ins, 1e-9)))
    assert di.max() < 0.02
    t1 = np.where(hmm.t > 0, hmm.t, 1e-9)
    t2 = np.where(ref.t > 0, ref.t, 1e-9)
    dt = np.abs(np.log(t1) - np.log(t2))
    assert dt.mean() < 0.005
    assert dt.max() < 0.06

    # conventions: D_M pinning, node-M row, B-state dummy
    assert hmm.t[0, 5] == 1.0 and hmm.t[0, 6] == 0.0
    assert hmm.t[hmm.M, 5] == 1.0 and hmm.t[hmm.M, 6] == 0.0
    assert hmm.t[hmm.M, 2] == 0.0
    assert hmm.mat[0, 0] == 1.0 and hmm.mat[0, 1:].sum() == 0.0


def test_amino_insert_rows_are_reference_constant(luxc):
    aa, msa, ref = luxc
    hmm, _, _ = Builder(aa).build_msa(msa, Background(aa))
    # hmmbuild writes (near-)identical amino insert emission rows; check
    # against the reference's constant row to 4 decimals in -log space
    row = -np.log(np.maximum(ref.ins[1], 1e-9))
    mine = -np.log(np.maximum(hmm.ins[1:], 1e-9))
    assert np.abs(mine - row[None, :]).max() < 5e-3


def test_weighting_schemes_run_and_differ(luxc):
    aa, msa, ref = luxc
    bg = Background(aa)
    effs = {}
    for scheme in ("pb", "gsc", "blosum", "none"):
        hmm, _, _ = Builder(aa, weighting=scheme).build_msa(msa, bg)
        # consensus columns are weight-dependent; all schemes must land
        # near the PB-architecture answer
        assert 390 <= hmm.M <= 410, scheme
        hmm.validate()
        effs[scheme] = hmm.eff_nseq
    # none-weighting skips relative weighting but entropy-weighting
    # still compresses the counts
    assert effs["none"] <= len(msa.names)
    # blosum at wid=0.62 clusters some of the 13 LuxC seqs
    assert effs["blosum"] != effs["pb"]


def test_effective_number_modes(luxc):
    aa, msa, ref = luxc
    bg = Background(aa)
    h_clust, _, _ = Builder(aa, effective_number="clust").build_msa(msa, bg)
    assert 1 <= h_clust.eff_nseq <= len(msa.names)
    h_none, _, _ = Builder(aa, effective_number="none").build_msa(msa, bg)
    assert h_none.eff_nseq == len(msa.names)
    h_set, _, _ = Builder(aa, effective_number=3.0).build_msa(msa, bg)
    assert h_set.eff_nseq == 3.0
    h_exp, _, _ = Builder(aa, effective_number="exp").build_msa(msa, bg)
    assert 0 < h_exp.eff_nseq <= len(msa.names)
    h_exp.validate()


def test_prior_schemes(luxc):
    aa, msa, ref = luxc
    bg = Background(aa)
    h_lap, _, _ = Builder(aa, prior_scheme="laplace").build_msa(msa, bg)
    h_lap.validate()
    # laplace differs from the alphabet (Blocks9) prior
    h_def, _, _ = Builder(aa).build_msa(msa, bg)
    assert not np.allclose(h_lap.mat[1:], h_def.mat[1:])
    with pytest.raises(ValueError):
        Builder(aa, prior_scheme="bogus").build_msa(msa, bg)
