"""GeneticCode, Bitfield, KeyHash, Vector/Matrix, Randomness
(reference test patterns: ``tests/test_easel/test_genetic_code.py``,
``test_bitfield.py``, ``test_keyhash.py``, ``test_vector.py``)."""
import pickle

import numpy as np
import pytest

from pyhmmer_tpu.easel import (
    Alphabet, Bitfield, GeneticCode, KeyHash, Randomness,
    TextSequence, VectorD, VectorF, VectorU8, MatrixD,
)


class TestGeneticCode:
    def test_standard_translation(self):
        dna = Alphabet.dna()
        gc = GeneticCode()
        seq = TextSequence(sequence="ATGAAACGTTAA").digitize(dna)
        prot = gc.translate(seq.sequence)
        amino = Alphabet.amino()
        assert amino.decode(prot[:3]) == "MKR"
        # stop codon encodes as the unknown residue
        assert prot[3] == amino.unknown_code

    def test_tables_differ(self):
        dna = Alphabet.dna()
        seq = TextSequence(sequence="TGA").digitize(dna)
        std = GeneticCode(1).translate(seq.sequence)
        mito = GeneticCode(2).translate(seq.sequence)
        amino = Alphabet.amino()
        assert std[0] == amino.unknown_code          # stop in standard
        assert amino.decode(mito[:1]) == "W"          # Trp in vertebrate mito

    def test_ambiguous_resolution(self):
        # CGN -> R in the standard code regardless of the wobble base
        dna = Alphabet.dna()
        gc = GeneticCode()
        seq = TextSequence(sequence="CGN").digitize(dna)
        assert Alphabet.amino().decode(gc.translate(seq.sequence)) == "R"
        # NNN cannot resolve -> X
        seq = TextSequence(sequence="NNN").digitize(dna)
        assert Alphabet.amino().decode(gc.translate(seq.sequence)) == "X"

    def test_length_check(self):
        gc = GeneticCode()
        with pytest.raises(ValueError):
            gc.translate(np.zeros(4, dtype=np.uint8))

    def test_invalid_table(self):
        with pytest.raises(ValueError):
            GeneticCode(7)

    def test_sequence_translate(self):
        dna = Alphabet.dna()
        seq = TextSequence(name=b"orf1", sequence="ATGGGT").digitize(dna)
        prot = seq.translate()
        assert prot.name == b"orf1"
        assert prot.textize().sequence == "MG"


class TestBitfield:
    def test_basics(self):
        b = Bitfield([True, False, False, True])
        assert len(b) == 4
        assert b[0] and not b[1]
        assert b.count() == 2
        assert b.count(False) == 2
        b.toggle(1)
        assert b[1]
        b[1] = False
        assert not b[1]
        assert list(b) == [True, False, False, True]

    def test_zeros_ones(self):
        assert Bitfield.zeros(5).count() == 0
        assert Bitfield.ones(5).count() == 5

    def test_index_errors(self):
        b = Bitfield.zeros(3)
        assert b[-1] is False
        with pytest.raises(IndexError):
            b[3]


class TestKeyHash:
    def test_add_lookup(self):
        kh = KeyHash()
        assert kh.add(b"first") == 0
        assert kh.add(b"second") == 1
        assert kh.add(b"first") == 0
        assert kh[b"second"] == 1
        assert b"first" in kh and b"third" not in kh
        assert list(kh) == [b"first", b"second"]
        kh2 = kh.copy()
        kh.clear()
        assert len(kh) == 0 and len(kh2) == 2


class TestVector:
    def test_ops(self):
        v = VectorD([1.0, 2.0, 3.0])
        assert v.sum() == 6.0
        assert v.argmax() == 2
        assert (v + v)[1] == 4.0
        assert (v * 2)[0] == 2.0
        assert v @ v == 14.0
        v.reverse()
        assert list(v) == [3.0, 2.0, 1.0]

    def test_normalize_entropy(self):
        v = VectorD([1.0, 1.0, 1.0, 1.0])
        v.normalize()
        assert abs(v.sum() - 1.0) < 1e-12
        assert abs(v.entropy() - 2.0) < 1e-12
        assert abs(v.relative_entropy(VectorD([.25, .25, .25, .25]))) < 1e-12

    def test_f32_and_u8(self):
        assert VectorF([0.5]).itemsize == 4
        v = VectorU8([1, 2, 250])
        assert v.max() == 250
        assert np.asarray(v).dtype == np.uint8

    def test_buffer(self):
        v = VectorD([1.0, 2.0])
        a = np.asarray(v)
        assert a.dtype == np.float64 and a[1] == 2.0


class TestMatrix:
    def test_ops(self):
        m = MatrixD([[1.0, 2.0], [3.0, 4.0]])
        assert m.shape == (2, 2)
        assert m[1, 1] == 4.0
        assert m.argmax() == (1, 1)
        assert list(m[0]) == [1.0, 2.0]
        assert m.sum() == 10.0
        with pytest.raises(ValueError):
            MatrixD([[1.0], [2.0, 3.0]])


class TestRandomness:
    def test_stream(self):
        r1 = Randomness(42)
        r2 = Randomness(42)
        assert r1.random() == r2.random()
        x = r1.normalvariate(0.0, 1.0)
        assert isinstance(x, float)

    def test_copy_preserves_state(self):
        r = Randomness(7)
        r.random()
        c = r.copy()
        assert r.random() == c.random()

    def test_pickle(self):
        r = Randomness(5)
        r.random()
        c = pickle.loads(pickle.dumps(r))
        assert r.random() == c.random()


# --- MSA subset/annotation methods (reference easel.pyx:5226-6431) --------

def test_msa_mark_fragments():
    from pyhmmer_tpu.easel import TextSequence, TextMSA
    s1 = TextSequence(name=b"seq1", sequence="--ATGC---")
    s2 = TextSequence(name=b"seq2", sequence="TTATCCG-T")
    s3 = TextSequence(name=b"seq3", sequence="TT-TCCGAT")
    msa = TextMSA(name=b"msa", sequences=[s1, s2, s3])
    bits = msa.mark_fragments(0.5)
    assert list(bits) == [True, False, False]


def test_msa_select_rows_cols():
    from pyhmmer_tpu.easel import Alphabet, TextSequence, TextMSA
    s1 = TextSequence(name=b"a", sequence="ACGT")
    s2 = TextSequence(name=b"b", sequence="A-GT")
    s3 = TextSequence(name=b"c", sequence="AC-T")
    msa = TextMSA(name=b"m", sequences=[s1, s2, s3])
    sub = msa.select(sequences=[0, 2], columns=[0, 3])
    assert sub.names == [b"a", b"c"]
    assert sub.rows == ["AT", "AT"]
    d = msa.digitize(Alphabet.dna())
    dsub = d.select(sequences=[1])
    assert dsub.names == [b"b"]
    assert dsub.codes.shape == (1, 4)


def test_msa_reverse_complement_and_sample():
    from pyhmmer_tpu.easel import Alphabet, TextSequence, TextMSA, DigitalMSA
    ab = Alphabet.dna()
    msa = TextMSA(name=b"m", sequences=[
        TextSequence(name=b"a", sequence="--ATGC---")]).digitize(ab)
    rc = msa.reverse_complement()
    assert rc.textize().rows[0] == "---GCAT--"
    msa.reverse_complement(inplace=True)
    assert msa.textize().rows[0] == "---GCAT--"
    m = DigitalMSA.sample(ab, 4, 12)
    assert 1 <= len(m.names) <= 4
    assert m.codes.shape[0] == len(m.names)


def test_sequencefile_readinto(data_dir):
    from pyhmmer_tpu.easel import SequenceFile, TextSequence
    path = data_dir / "seqs" / "938293.PRJEB85.HG003687.faa"
    with SequenceFile(str(path)) as f:
        first = f.read()
    with SequenceFile(str(path)) as f:
        buf = TextSequence(name=b"")
        out = f.readinto(buf)
        assert out is buf
        assert buf.name == first.name
        assert buf.sequence == first.sequence


def test_msafile_phylip_interleaved(tmp_path):
    from pyhmmer_tpu.easel import MSAFile
    p = tmp_path / "t.phy"
    p.write_text(
        " 3 12\n"
        "seqA       ACGTAC\n"
        "seqB       ACGTTC\n"
        "seqC       AC--AC\n"
        "\n"
        "GTACGT\n"
        "GTACGA\n"
        "GTAC-T\n")
    with MSAFile(str(p), format="phylip") as f:
        msa = f.read()
    assert msa.names == [b"seqA", b"seqB", b"seqC"]
    assert msa.rows == ["ACGTACGTACGT", "ACGTTCGTACGA", "AC--ACGTAC-T"]


def test_msafile_selex(tmp_path):
    from pyhmmer_tpu.easel import MSAFile
    p = tmp_path / "t.slx"
    p.write_text(
        "% a comment\n"
        "seq1 ACDE.F\n"
        "seq2 ACD-EF\n"
        "\n"
        "seq1 GHIK\n"
        "seq2 GH-K\n")
    with MSAFile(str(p), format="selex") as f:
        msa = f.read()
    assert msa.names == [b"seq1", b"seq2"]
    assert msa.rows == ["ACDE.FGHIK", "ACD-EFGH-K"]


def test_msafile_ssi_fetch(data_dir):
    """SSI-indexed random access on MSAFile (reference easel.pyx:6848
    role) using the bundled LuxC.sto + .ssi fixture pair."""
    from pyhmmer_tpu.easel import MSAFile

    with MSAFile(data_dir / "msa" / "LuxC.sto") as f:
        msa = f.fetch(b"LuxC")
    assert msa is not None and len(msa.names) == 13
    with MSAFile(data_dir / "msa" / "LuxC.sto") as f:
        import pytest
        with pytest.raises(KeyError):
            f.fetch(b"nonexistent")


def test_daemon_sequence_format(tmp_path):
    """hmmpgmd cached-database ('daemon') sequence format: '#' header
    line + FASTA records (reference format list easel.pyx:158-169)."""
    import io
    from pyhmmer_tpu.easel import SequenceFile

    p = tmp_path / "cache.fa"
    p.write_text("#1234 2\n>seq1 first\nACDEFGH\n>seq2 second\n"
                 "MKLVNNW\n")
    with SequenceFile(p, format="daemon") as f:
        seqs = list(f)
    assert [s.name for s in seqs] == [b"seq1", b"seq2"]
    assert seqs[0].sequence == "ACDEFGH"

    # missing header line is an error
    q = tmp_path / "bad.fa"
    q.write_text(">seq1\nACDEF\n")
    import pytest
    with pytest.raises(ValueError):
        with SequenceFile(q, format="daemon") as f:
            list(f)
