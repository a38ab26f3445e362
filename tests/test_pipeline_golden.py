"""Pipeline golden parity on the reference tables (subset for speed)."""
import numpy as np
import pytest

from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.pipeline import Pipeline
from pyhmmer_tpu.easel.seqfile import SequenceFile

GOLDEN_STRONG = [
    # name, score, bias, best-domain score  (PF02826.tbl)
    ("938293.PRJEB85.HG003685_328", 179.1, 0.0, 178.3),
    ("938293.PRJEB85.HG003686_519", 175.5, 0.0, 174.2),
    ("938293.PRJEB85.HG003689_19", 172.4, 0.0, 171.6),
    ("938293.PRJEB85.HG003686_258", 140.5, 0.0, 139.4),
    ("938293.PRJEB85.HG003685_432", 32.1, 0.1, 30.1),
    ("938293.PRJEB85.HG003691_27", 30.2, 0.0, 29.0),
    ("938293.PRJEB85.HG003686_375", 16.6, 0.1, 15.8),
    ("938293.PRJEB85.HG003691_51", 16.2, 0.1, 15.4),
]

# clustered + biased: the trace-ensemble null2 depends on the sampler RNG
# stream (PARITY_NOTES.md gap #2/#3), so the tolerance is wider
GOLDEN_STOCHASTIC = [
    ("938293.PRJEB85.HG003687_187", 6.1, 3.8, 3.3),
]


@pytest.fixture(scope="module")
def searched(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmm = f.read()
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        seqs = {s.name.decode(): s for s in f}
    wanted = [seqs[n] for n, *_ in GOLDEN_STRONG + GOLDEN_STOCHASTIC]
    pli = Pipeline(hmm.alphabet, Z=2100.0)
    hits = pli.search_hmm(hmm, wanted)
    return {h.name.decode(): h for h in hits}


@pytest.mark.parametrize("name,score,bias,dsc", GOLDEN_STRONG)
def test_golden_scores(searched, name, score, bias, dsc):
    h = searched[name]
    assert abs(h.score - score) <= 0.15
    assert abs(h.bias - bias) <= 0.15
    assert abs(h.best_domain.score - dsc) <= 0.15


@pytest.mark.parametrize("name,score,bias,dsc", GOLDEN_STOCHASTIC)
def test_golden_scores_stochastic(searched, name, score, bias, dsc):
    h = searched[name]
    assert abs(h.score - score) <= 0.8
    assert abs(h.bias - bias) <= 0.8


def test_domain_coordinates(searched):
    h = searched["938293.PRJEB85.HG003685_328"]
    d = h.domains[1]
    assert (d.env_from, d.env_to) == (100, 279)
    assert (d.ali_from, d.ali_to) == (101, 279)
    a = d.alignment
    assert (a.hmm_from, a.hmm_to) == (2, 178)


def test_thioesterase_domain(data_dir):
    """The canonical reference test case (test_hmmer.py:51-106)."""
    with HMMFile(data_dir / "hmms" / "txt" / "Thioesterase.hmm") as f:
        hmm = f.read()
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        seqs = [s for s in f if s.name.endswith(b"HG003687_113")]
    pli = Pipeline(hmm.alphabet, Z=2100.0)
    hits = pli.search_hmm(hmm, seqs)
    assert len(hits) == 1
    hit = hits[0]
    assert abs(hit.score - 8.6) <= 0.15
    assert abs(hit.bias - 1.5) <= 0.15
    assert len(hit.domains) == 1
    d = hit.domains[0]
    assert abs(d.score - 8.1) <= 0.15
    a = d.alignment
    assert (a.hmm_from, a.hmm_to) == (79, 93)
    assert (a.target_from, a.target_to) == (115, 129)
    assert (d.env_from, d.env_to) == (115, 129)
    assert a.hmm_sequence == "GWSfGGvlAyEmArq"
    assert a.target_sequence == "GHSMGGSVAVAIAHE"
