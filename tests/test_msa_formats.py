"""MSA format breadth: real a2m/psiblast parsers + the 10 writers
(reference format list ``easel.pyx:141-152``), exercised as
write->reparse roundtrips plus a2m-specific semantics."""

import io

import numpy as np
import pytest

from pyhmmer_tpu.easel.alphabet import Alphabet
from pyhmmer_tpu.easel.msa import TextMSA
from pyhmmer_tpu.easel.msafile import MSAFile


@pytest.fixture()
def msa():
    m = TextMSA(name=b"toy")
    m.names = [b"seq1", b"seq2", b"seq3"]
    m.rows = ["ACDE.F-H", "ACDEgFGH", "-CDE.FGH"]
    m.reference = b"xxxx.xxx"
    return m


ALL_FORMATS = ["stockholm", "pfam", "afa", "a2m", "psiblast", "clustal",
               "clustallike", "selex", "phylip", "phylips"]


@pytest.mark.parametrize("fmt", ALL_FORMATS)
def test_write_reparse_roundtrip(msa, fmt):
    buf = io.BytesIO()
    msa.write(buf, format=fmt)
    buf.seek(0)
    with MSAFile(buf, format=fmt) as f:
        back = f.read()
    assert [n for n in back.names] == msa.names
    # gap characters may normalize ('.' -> '-'), residues must survive;
    # a2m re-justifies inserts, so compare residue content per row
    for orig, rt in zip(msa.rows, back.rows):
        o = [c.upper() for c in orig if c.isalpha()]
        r = [c.upper() for c in rt if c.isalpha()]
        assert o == r, fmt
    # column count preserved for all column-preserving formats
    if fmt not in ("a2m",):
        assert all(len(r) == len(msa.rows[0]) for r in back.rows)


def test_a2m_parse_semantics():
    text = (">one\nAC-deFG\n>two\nACWDEFG\n")
    # one: consensus ACxFG? lowercase de are inserts; two: all consensus
    with pytest.raises(ValueError):
        with MSAFile(io.BytesIO(text.encode()), format="a2m") as f:
            f.read()   # mismatched consensus counts (5 vs 7) must raise

    text = (">one\nAC-wyFG\n>two\nACWklFG\n")
    with MSAFile(io.BytesIO(text.encode()), format="a2m") as f:
        m = f.read()
    # 5 consensus columns + a 2-wide insert block between cols 3 and 4
    assert m.reference == b"xxx..xx"
    assert m.rows[0] == "AC-wyFG"
    assert m.rows[1] == "ACWklFG"

    # left-justified '.'-padding when insert lengths differ
    text = (">one\nACGwTT\n>two\nACGTT\n")
    with MSAFile(io.BytesIO(text.encode()), format="a2m") as f:
        m = f.read()
    assert m.rows[0] == "ACGwTT"
    assert m.rows[1] == "ACG.TT"


def test_a2m_digital_roundtrip(msa):
    aa = Alphabet.amino()
    # digitize, write a2m, re-read digital
    fixed = TextMSA(name=b"t")
    fixed.names = [b"a", b"b"]
    fixed.rows = ["ACDEFG", "AC-EFG"]
    d = fixed.digitize(aa)
    buf = io.BytesIO()
    d.write(buf, format="a2m")
    buf.seek(0)
    with MSAFile(buf, format="a2m", digital=True, alphabet=aa) as f:
        back = f.read()
    assert np.array_equal(back.codes, d.codes)


def test_psiblast_blocks():
    text = ("one  ACDE\ntwo  AC-E\n\none  FGH-\ntwo  FGHH\n")
    with MSAFile(io.BytesIO(text.encode()), format="psiblast") as f:
        m = f.read()
    assert m.rows == ["ACDEFGH-", "AC-EFGHH"]


def test_selex_rf_roundtrip(msa):
    buf = io.BytesIO()
    msa.write(buf, format="selex")
    buf.seek(0)
    with MSAFile(buf, format="selex") as f:
        back = f.read()
    assert back.reference == msa.reference
