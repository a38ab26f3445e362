"""Round-2 compatibility surface: pickling, HMMER2 parsing, hmmscan over
pressed/optimized-profile databases (VERDICT.md items 2, 3, 4, 7;
reference behaviors: plan7.pyx:2484-2616/8079-8263 (pickle),
plan7.pyx:3498-3591 (HMMER2), hmmer/_hmmscan.py:190-215 (pressed scan))."""
import pickle

import numpy as np
import pytest

import pyhmmer_tpu as ph
from pyhmmer_tpu.plan7 import (HMM, HMMFile, HMMPressedFile, Pipeline,
                               Background, TopHits)
from pyhmmer_tpu.easel import Alphabet, SequenceFile


@pytest.fixture(scope="module")
def proteome(data_dir):
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        return f.read_block()


@pytest.fixture(scope="module")
def pf02826(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        return f.read()


# ---------------------------------------------------------------------------
# pickle (plan7.pyx:2484-2616, 8079-8263)
# ---------------------------------------------------------------------------

def test_pickle_hmm_roundtrip(pf02826):
    h2 = pickle.loads(pickle.dumps(pf02826))
    assert h2 == pf02826
    assert h2.alphabet == pf02826.alphabet
    assert np.array_equal(h2.evparam, pf02826.evparam)
    assert np.array_equal(h2.cutoffs, pf02826.cutoffs)
    assert h2.consensus == pf02826.consensus
    assert h2.checksum == pf02826.checksum


def test_pickle_tophits_roundtrip(pf02826, proteome):
    pli = Pipeline(pf02826.alphabet, Background(pf02826.alphabet))
    th = pli.search_hmm(pf02826, proteome[:400])
    assert len(th.reported) >= 1
    t2 = pickle.loads(pickle.dumps(th))
    assert len(t2) == len(th)
    assert t2.Z == th.Z and t2.domZ == th.domZ
    assert t2.query_name == th.query_name
    assert [h.name for h in t2.reported] == [h.name for h in th.reported]
    for h1, h2 in zip(th, t2):
        assert h2.score == h1.score and h2.lnP == h1.lnP
        assert h2.evalue == h1.evalue          # uses hits backref + Z
        assert h2.hits is t2                   # backref rebuilt, not shared
        assert len(h2.domains) == len(h1.domains)
        for d1, d2 in zip(h1.domains, h2.domains):
            assert d2.score == d1.score
            assert d2.env_from == d1.env_from and d2.env_to == d1.env_to
            assert d2.hit is h2
            a1, a2 = d1.alignment, d2.alignment
            assert a2.hmm_sequence == a1.hmm_sequence
            assert a2.target_sequence == a1.target_sequence
            assert a2.posterior_probabilities == a1.posterior_probabilities


def test_pickle_alphabet_identity():
    for a in (Alphabet.amino(), Alphabet.dna(), Alphabet.rna()):
        b = pickle.loads(pickle.dumps(a))
        assert b == a and b.K == a.K and b.symbols == a.symbols


# ---------------------------------------------------------------------------
# HMMER2 ASCII parsing (plan7.pyx:201-218, 3498-3591; fixtures txt2/)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["Thioesterase", "RREFam"])
def test_hmmer2_parses_against_hmmer3_twin(data_dir, name):
    with HMMFile(data_dir / "hmms" / "txt2" / f"{name}.hmm2") as f:
        assert f.format == "2.0"
        h2s = list(f)
    with HMMFile(data_dir / "hmms" / "txt" / f"{name}.hmm") as f:
        h3s = list(f)
    assert len(h2s) == len(h3s)
    for h2, h3 in zip(h2s, h3s):
        assert h2.name == h3.name
        assert h2.M == h3.M
        assert h2.alphabet == h3.alphabet
        # emissions / core transitions match to HMMER2's 1000*log2 integer
        # quantization.  Node 0 and node M transition rows and the insert
        # rows at 0/M are lossy in the HMMER2 format (I0 mass folds into
        # B->M1; tM->* are dropped), so they are excluded.
        assert np.abs(h2.mat[1:] - h3.mat[1:]).max() < 5e-4
        assert np.abs(h2.ins[1:-1] - h3.ins[1:-1]).max() < 5e-4
        assert np.abs(h2.t[1:-1] - h3.t[1:-1]).max() < 5e-4
        # B->D1 survives the roundtrip exactly (up to quantization)
        assert abs(h2.t[0, 2] - h3.t[0, 2]) < 5e-4
        if h3.map is not None:
            assert np.array_equal(h2.map, h3.map)


def test_hmmer2_model_scores_match_twin(data_dir, proteome):
    """A search with the HMMER2-parsed model reproduces the HMMER3 twin's
    forward scores within quantization tolerance."""
    from pyhmmer_tpu.ops import reference as refops
    with HMMFile(data_dir / "hmms" / "txt2" / "Thioesterase.hmm2") as f:
        h2 = f.read()
    with HMMFile(data_dir / "hmms" / "txt" / "Thioesterase.hmm") as f:
        h3 = f.read()
    bg = Background(h2.alphabet)
    p2 = h2.to_profile(bg, L=400)
    p3 = h3.to_profile(bg, L=400)
    for seq in list(proteome)[:20]:
        p2.reconfig_length(len(seq))
        p3.reconfig_length(len(seq))
        s2 = refops.forward(p2, seq.sequence).score
        s3 = refops.forward(p3, seq.sequence).score
        assert abs(s2 - s3) < 0.2   # nats; ~0.3 bits of quantization drift


# ---------------------------------------------------------------------------
# hmmscan over pressed databases (hmmer/_hmmscan.py:190-215)
# ---------------------------------------------------------------------------

def _scan_rows(results):
    rows = {}
    for th in results:
        rows[th.query_name] = [(h.name, round(h.score, 2)) for h in
                               th.reported]
    return rows


def test_hmmscan_pressed_database(data_dir, proteome):
    """hmmscan accepts an HMMPressedFile (the reference's primary scan
    input) and reproduces the text-HMM scan."""
    seqs = list(proteome)[:40]
    with HMMFile(data_dir / "hmms" / "txt" / "RREFam.hmm") as f:
        hmms = list(f)
    want = _scan_rows(ph.hmmscan(seqs, hmms))
    with HMMPressedFile(data_dir / "hmms" / "db" / "RREFam.hmm") as db:
        got = _scan_rows(ph.hmmscan(seqs, db))
    assert set(got) == set(want)
    for q in want:
        assert [g[0] for g in got[q]] == [w[0] for w in want[q]]
        for g, w in zip(got[q], want[q]):
            assert abs(g[1] - w[1]) <= 0.3   # f32 .h3m vs ASCII rounding


def test_hmmscan_optimized_profile_block(data_dir, proteome):
    """hmmscan accepts OptimizedProfileBlock / OptimizedProfile inputs."""
    from pyhmmer_tpu.plan7 import OptimizedProfileBlock
    seqs = list(proteome)[:40]
    with HMMPressedFile(data_dir / "hmms" / "db" / "RREFam.hmm") as db:
        oms = list(db)
    block = OptimizedProfileBlock(oms[0].alphabet, oms)
    got = _scan_rows(ph.hmmscan(seqs, block))
    with HMMPressedFile(data_dir / "hmms" / "db" / "RREFam.hmm") as db:
        want = _scan_rows(ph.hmmscan(seqs, db))
    assert got == want
