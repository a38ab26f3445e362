"""Window/sequence-parallel nhmmer (SURVEY 2.6 sequence-parallel row):
long targets sliced across shards with max_length halos must reproduce
the single-shot pipeline's hits with global coordinates and E-values.
"""
import numpy as np
import pytest

from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.longtargets import LongTargetsPipeline
from pyhmmer_tpu.easel import SequenceFile
from pyhmmer_tpu.easel.sequence import DigitalSequence, DigitalSequenceBlock
from pyhmmer_tpu.parallel.mesh import sharded_nhmmer


def test_sharded_nhmmer_matches_single(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "bmyD.hmm") as f:
        bmyd = f.read()
    with SequenceFile(
            data_dir / "seqs" / "1390.SAMEA104415756.OFHT01000022.fna",
            digital=True, alphabet=bmyd.alphabet) as f:
        genome = f.read_block()
    # a 180 kb slice containing the golden hit regions (185 kb and
    # 313-315 kb in full-genome coordinates)
    lo, hi = 150_000, 330_000
    sl = DigitalSequence(bmyd.alphabet, name=b"slice",
                         sequence=genome[0].sequence[lo:hi])
    block = DigitalSequenceBlock(bmyd.alphabet, [sl])

    single = LongTargetsPipeline(bmyd.alphabet).search_hmm(bmyd, block)
    sharded = sharded_nhmmer(bmyd, block, n_shards=3)

    def rows(th):
        return sorted((h.name, h.best_domain.ali_from,
                       h.best_domain.ali_to, round(h.score, 4),
                       round(h.evalue, 8), h.reported)
                      for h in th.hits)

    assert rows(sharded) == rows(single)
    assert len(single.reported) >= 2
    # lengths and alignment coordinates are global
    for h in sharded.hits:
        assert h.length == len(sl)
        d = h.best_domain
        assert d.alignment.target_length == len(sl)
        assert 1 <= min(d.ali_from, d.ali_to) <= len(sl)


def test_sharded_nhmmer_multiple_targets(data_dir):
    """Slicing across several targets (the shard list interleaves
    slices of different sequences)."""
    with HMMFile(data_dir / "hmms" / "txt" / "bmyD.hmm") as f:
        bmyd = f.read()
    with SequenceFile(
            data_dir / "seqs" / "1390.SAMEA104415756.OFHT01000022.fna",
            digital=True, alphabet=bmyd.alphabet) as f:
        genome = f.read_block()
    seq = genome[0].sequence
    a = DigitalSequence(bmyd.alphabet, name=b"ctgA",
                        sequence=seq[150_000:220_000])
    b = DigitalSequence(bmyd.alphabet, name=b"ctgB",
                        sequence=seq[300_000:330_000])
    block = DigitalSequenceBlock(bmyd.alphabet, [a, b])

    single = LongTargetsPipeline(bmyd.alphabet).search_hmm(bmyd, block)
    sharded = sharded_nhmmer(bmyd, block, n_shards=4)

    def rows(th):
        return sorted((h.name, h.best_domain.ali_from,
                       h.best_domain.ali_to, round(h.score, 4))
                      for h in th.hits)

    assert rows(sharded) == rows(single)
    assert {h.name for h in single.hits} == {b"ctgA", b"ctgB"}
