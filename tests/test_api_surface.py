"""API-surface parity tests: errors module, plan7 view classes, alphabet
singletons, and the daemon client/server round trip.

Modeled on the reference's object-model unit tests (SURVEY.md §4:
``test_plan7/*``, ``test_easel/*``); the daemon round-trip test goes
beyond the reference, which ships no offline daemon test.
"""

import copy
import io
import pickle

import pytest

import pyhmmer_tpu
from pyhmmer_tpu import errors
from pyhmmer_tpu.easel import Alphabet, DNA, RNA, AA, SequenceFile
from pyhmmer_tpu.plan7 import (
    HMM,
    HMMFile,
    Cutoffs,
    EvalueParameters,
    Offsets,
    Pipeline,
    Profile,
    ProfileTransitions,
    ScoreData,
    Transitions,
)


# --- errors ---------------------------------------------------------------


def test_errors_surface():
    err = errors.UnexpectedError(1, "p7_Pipeline")
    assert err.code == 1 and err.function == "p7_Pipeline"
    assert "eslFAIL" in str(err)

    err = errors.AllocationError("P7_HIT", 8, 4)
    assert err.count == 4 and "32 bytes" in str(err)

    err = errors.AlphabetMismatch(Alphabet.amino(), Alphabet.dna())
    assert err == errors.AlphabetMismatch(Alphabet.amino(), Alphabet.dna())
    assert isinstance(err, ValueError)

    err = errors.InvalidParameter("strand", "x", choices=["watson", "crick"])
    assert "watson" in str(err)

    err = errors.ServerError(15, "bad request")
    assert err.code == 15 and isinstance(err, RuntimeError)

    assert errors.statuscode[0] == "eslOK"


# --- alphabet singletons ----------------------------------------------------


def test_alphabet_singletons():
    assert DNA() is DNA()
    assert isinstance(DNA(), Alphabet)
    assert Alphabet.dna() is DNA()
    assert Alphabet.rna() is RNA()
    assert Alphabet.amino() is AA()
    assert DNA().K == 4 and AA().K == 20
    assert pickle.loads(pickle.dumps(RNA())) is RNA()


# --- enums ------------------------------------------------------------------


def test_transition_enums():
    assert Transitions.MM == 0 and Transitions.DD == 6
    assert ProfileTransitions.BM == 3 and ProfileTransitions.II == 7
    assert int(Transitions.IM) == 3


# --- Cutoffs / EvalueParameters views ---------------------------------------


def test_cutoffs_view():
    hmm = HMM(Alphabet.amino(), M=10, name=b"test")
    cut = hmm.cutoffs
    assert isinstance(cut, Cutoffs)
    assert cut.gathering is None
    assert not cut.gathering_available()
    cut.gathering = (10.0, 12.0)
    assert cut.gathering == (10.0, 12.0)
    assert cut.gathering1 == 10.0 and cut.gathering2 == 12.0
    assert cut.gathering_available()
    assert hmm.flags & (1 << 10)  # p7H_GA set on the owner
    # array-style access still works (internal compute layers index it)
    assert float(hmm.cutoffs[0]) == 10.0
    del cut.gathering
    assert cut.gathering is None
    assert not (hmm.flags & (1 << 10))
    cut.trusted = (25.0, 25.0)
    cut.noise = (5.0, 4.5)
    assert cut.as_vector()[2] == 25.0
    c2 = copy.copy(cut)
    assert c2 == cut


def test_evalue_parameters_view(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "Thioesterase.hmm") as f:
        hmm = next(iter(f))
    ev = hmm.evalue_parameters
    assert isinstance(ev, EvalueParameters)
    assert ev.m_mu is not None and ev.f_tau is not None
    assert ev.m_lambda == pytest.approx(0.69844, abs=1e-4)
    assert ev.m_mu == pytest.approx(-10.1820, abs=1e-4)
    ev2 = hmm.copy().evalue_parameters
    assert ev2 == ev
    ev2.f_tau = -10.0
    assert ev2 != ev


def test_offsets():
    off = Offsets()
    assert off.model is None and off.filter is None and off.profile is None
    off.model = 1234
    assert off.model == 1234
    off2 = copy.copy(off)
    off2.model = None
    assert off.model == 1234 and off2.model is None
    assert "1234" in repr(off)


def test_scoredata(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "Thioesterase.hmm") as f:
        hmm = next(iter(f))
    from pyhmmer_tpu.plan7 import Background

    prof = Profile(hmm.M, hmm.alphabet)
    prof.configure(hmm, Background(hmm.alphabet), L=400)
    om = prof.to_optimized()
    sd = ScoreData(prof, om)
    assert sd.M == hmm.M
    assert sd.ssv_scores.shape[0] == hmm.M
    sd2 = sd.copy()
    assert (sd2.ssv_scores == sd.ssv_scores).all()


# --- Domains view -------------------------------------------------------------


def test_domains_view(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmm = next(iter(f))
    with SequenceFile(
        data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
        digital=True, alphabet=Alphabet.amino(),
    ) as f:
        seqs = f.read_block(sequences=500)
    pli = Pipeline(Alphabet.amino())
    hits = pli.search_hmm(hmm, seqs)
    assert len(hits) > 0
    hit = hits[0]
    doms = hit.domains
    assert doms.hit is hit
    assert len(doms.reported) <= len(doms)
    assert len(doms.included) <= len(doms)
    assert all(d.included for d in doms.included)


# --- daemon client/server round trip -----------------------------------------


@pytest.fixture(scope="module")
def daemon_server(data_dir):
    from pyhmmer_tpu import daemon

    with SequenceFile(
        data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
        digital=True, alphabet=Alphabet.amino(),
    ) as f:
        seqs = f.read_block(sequences=300)
    with HMMFile(data_dir / "hmms" / "txt" / "RREFam.hmm") as f:
        hmms = list(f)
    server = daemon.Server(seqdbs=[seqs], hmmdbs=[hmms], port=0)
    server.start()
    yield server, seqs, hmms
    server.shutdown()


def test_daemon_search_hmm(daemon_server, data_dir):
    from pyhmmer_tpu import daemon

    server, seqs, _ = daemon_server
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmm = next(iter(f))

    # direct pipeline reference result
    pli = Pipeline(Alphabet.amino())
    expected = pli.search_hmm(hmm, seqs)

    with daemon.Client("127.0.0.1", server.port) as client:
        hits = client.search_hmm(hmm)

    assert len(hits) == len(expected) and len(hits) >= 2
    for got, want in zip(hits, expected):
        assert got.name == want.name
        assert got.score == pytest.approx(want.score, abs=1e-4)
        assert got.lnP == pytest.approx(want.lnP, rel=1e-6)
        assert len(got.domains) == len(want.domains)
        for dg, dw in zip(got.domains, want.domains):
            assert dg.env_from == dw.env_from and dg.env_to == dw.env_to
            assert dg.score == pytest.approx(dw.score, abs=1e-4)
            if dw.alignment is not None:
                assert dg.alignment.hmm_sequence == dw.alignment.hmm_sequence
                assert dg.alignment.target_from == dw.alignment.target_from
    assert hits.Z == expected.Z


def test_daemon_search_seq_with_ranges(daemon_server):
    from pyhmmer_tpu import daemon

    server, seqs, _ = daemon_server
    query = seqs[3]
    with daemon.Client("127.0.0.1", server.port) as client:
        hits = client.search_seq(query, ranges=[(0, 99)])
    # self-hit must be found inside the subrange if the query is in it
    assert any(h.name == query.name for h in hits)


def test_daemon_scan_seq(daemon_server):
    from pyhmmer_tpu import daemon

    server, seqs, hmms = daemon_server
    query = seqs[0]
    pli = Pipeline(Alphabet.amino())
    expected = pli.scan_seq(query, hmms)
    with daemon.Client("127.0.0.1", server.port) as client:
        hits = client.scan_seq(query)
    assert len(hits) == len(expected)
    for got, want in zip(hits, expected):
        assert got.name == want.name
        assert got.score == pytest.approx(want.score, abs=1e-4)


def test_daemon_server_error(daemon_server):
    from pyhmmer_tpu import daemon
    from pyhmmer_tpu.errors import ServerError

    server, seqs, _ = daemon_server
    query = seqs[0]
    with daemon.Client("127.0.0.1", server.port) as client:
        with pytest.raises(ServerError):
            client.search_seq(query, db=99)  # nonexistent database
