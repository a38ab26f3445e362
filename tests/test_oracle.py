"""Oracle DP identities and golden score parity."""
import numpy as np
import pytest

from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.background import Background
from pyhmmer_tpu.plan7.profile import Profile
from pyhmmer_tpu.easel.seqfile import SequenceFile
from pyhmmer_tpu.ops import reference as ref

LN2 = np.log(2)


@pytest.fixture(scope="module")
def setup(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmm = f.read()
    bg = Background(hmm.alphabet)
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        seqs = {s.name.decode(): s for s in f}
    return hmm, bg, seqs


def test_forward_backward_agree(setup):
    hmm, bg, seqs = setup
    sq = seqs["938293.PRJEB85.HG003685_328"]
    prof = Profile(hmm.M, hmm.alphabet).configure(hmm, bg, len(sq))
    fwd = ref.forward(prof, sq.sequence)
    bck = ref.backward(prof, sq.sequence)
    assert abs(fwd.score - bck.score) < 1e-9


@pytest.mark.parametrize("name,pre_bits", [
    ("938293.PRJEB85.HG003685_328", 179.1),
    ("938293.PRJEB85.HG003689_19", 172.4),
    ("938293.PRJEB85.HG003686_519", 175.5),
])
def test_forward_matches_golden_prescores(setup, name, pre_bits):
    hmm, bg, seqs = setup
    sq = seqs[name]
    L = len(sq)
    prof = Profile(hmm.M, hmm.alphabet).configure(hmm, bg, L)
    fwd = ref.forward(prof, sq.sequence)
    got = (fwd.score - bg.null_one(L)) / LN2
    assert abs(got - pre_bits) < 0.1


def test_posterior_rows_sum_to_one(setup):
    hmm, bg, seqs = setup
    sq = seqs["938293.PRJEB85.HG003689_19"]
    prof = Profile(hmm.M, hmm.alphabet).configure(hmm, bg, len(sq))
    fwd = ref.forward(prof, sq.sequence, keep_matrix=True)
    bck = ref.backward(prof, sq.sequence, keep_matrix=True)
    pp = ref.posterior_matrices(fwd, bck, prof, sq.sequence)
    total = (pp["M"][1:].sum(axis=1) + pp["I"][1:].sum(axis=1)
             + pp["N"][1:] + pp["J"][1:] + pp["C"][1:])
    np.testing.assert_allclose(total, 1.0, atol=1e-6)


def test_msv_quantized_vs_float(setup):
    """Quantized MSV must track the float MSV within 1/3-bit rounding
    noise: the calibrated MSV Gumbel (STATS MSV) describes the filter
    score, so a constant offset here directly corrupts the F1 gate's
    pass rate (this caught a missing final C->T move that admitted ~85%
    of random targets)."""
    hmm, bg, seqs = setup
    sq = seqs["938293.PRJEB85.HG003687_187"]
    prof = Profile(hmm.M, hmm.alphabet).configure(hmm, bg, len(sq))
    uq = ref.msv_score_quantized(prof, sq.sequence)
    uf = ref.msv_score(prof, sq.sequence)
    assert np.isfinite(uq)
    assert abs(uq - uf) < 1.5


def test_msv_quantized_random_pvalues(setup):
    """On i.i.d. random sequences the calibrated MSV Gumbel should put
    the median quantized filter score near the distribution's bulk
    (median survival ~0.2-0.6), i.e. the F1=0.02 gate passes only a few
    percent -- the property the cascade's economics depend on."""
    from pyhmmer_tpu.plan7.evalues import gumbel_surv
    hmm, bg, seqs = setup
    rng = np.random.default_rng(11)
    L = 320
    prof = Profile(hmm.M, hmm.alphabet).configure(hmm, bg, L)
    nullsc = L * np.log(L / (L + 1.0)) + np.log(1.0 / (L + 1.0))
    ps = []
    for _ in range(20):
        dsq = rng.integers(0, 20, size=L).astype(np.uint8)
        uq = ref.msv_score_quantized(prof, dsq)
        ps.append(float(gumbel_surv((uq - nullsc) / LN2,
                                    prof.evparam[0], prof.evparam[1])))
    med = float(np.median(ps))
    assert 0.1 < med < 0.8
    assert np.mean(np.asarray(ps) <= 0.02) <= 0.2
