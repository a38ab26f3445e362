"""File I/O: alphabets, sequences, FASTA, HMMER3 ASCII + binary."""
import io
import glob
import numpy as np
import pytest

from pyhmmer_tpu.easel.alphabet import Alphabet
from pyhmmer_tpu.easel.seqfile import SequenceFile
from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.hmmfile import write_hmm_binary, write_hmm_ascii


def test_alphabet_roundtrip():
    aa = Alphabet.amino()
    s = "ACDEFGHIKLMNPQRSTVWYBJZOUX"
    codes = aa.encode(s)
    assert aa.decode(codes) == s
    assert aa.K == 20 and aa.Kp == 29
    dna = Alphabet.dna()
    assert dna.decode(dna.encode("acgtn")) == "ACGTN"


def test_alphabet_nonresidue():
    aa = Alphabet.amino()
    codes = aa.encode("MKL*")
    assert codes[-1] == aa.nonresidue_code


def test_fasta_parse(data_dir):
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        seqs = list(f)
    assert len(seqs) == 2100
    assert seqs[0].name == b"938293.PRJEB85.HG003688_1"
    assert len(seqs[0]) == 142  # includes the trailing stop codon (*)


def test_fasta_read_block_caps(data_dir):
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        block = f.read_block(sequences=10)
        assert len(block) == 10
        rest = f.read_block()
        assert len(rest) == 2090


def test_hmm_ascii_parse(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmm = f.read()
    assert hmm.name == b"2-Hacid_dh_C"
    assert hmm.accession == b"PF02826.20"
    assert hmm.M == 178
    assert abs(float(hmm.evparam[4]) - (-5.1587)) < 1e-4
    np.testing.assert_allclose(hmm.t.sum(axis=1), 3.0, atol=1e-3)


def test_hmm_binary_matches_ascii(data_dir):
    for binf in sorted(glob.glob(str(data_dir / "hmms" / "bin" / "*.h3m"))):
        stem = binf.rsplit("/", 1)[1][:-4]
        with HMMFile(binf) as f:
            bins = list(f)
        with HMMFile(data_dir / "hmms" / "txt" / f"{stem}.hmm") as f:
            txts = list(f)
        assert len(bins) == len(txts)
        for hb, ht in zip(bins, txts):
            assert hb.name == ht.name and hb.M == ht.M
            np.testing.assert_allclose(hb.mat[1:], ht.mat[1:], atol=2e-5)
            np.testing.assert_allclose(hb.t, ht.t, atol=2e-5)


def test_hmm_binary_roundtrip_byte_identical(data_dir):
    for binf in sorted(glob.glob(str(data_dir / "hmms" / "bin" / "*.h3m"))):
        with HMMFile(binf) as f:
            hmms = list(f)
        buf = io.BytesIO()
        for h in hmms:
            write_hmm_binary(h, buf)
        assert buf.getvalue() == open(binf, "rb").read()


def test_hmm_ascii_write_reparse(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "Thioesterase.hmm") as f:
        hmm = f.read()
    buf = io.StringIO()
    write_hmm_ascii(hmm, buf)
    buf.seek(0)
    with HMMFile(io.BytesIO(buf.getvalue().encode())) as f:
        hmm2 = f.read()
    assert hmm2.name == hmm.name and hmm2.M == hmm.M
    np.testing.assert_allclose(hmm2.mat, hmm.mat, atol=1e-5)
    np.testing.assert_allclose(hmm2.t, hmm.t, atol=1e-5)
    assert hmm2.consensus == hmm.consensus
    assert np.array_equal(hmm2.map, hmm.map)
