"""BLAST v4 protein-volume support (`easel/ncbi.py`).

The reference reads BLAST databases via ``esl_sqio_ncbi.c`` but ships
no fixture and never tests the format; this coverage validates our
implementation against the published v4 volume layout: field-level
structure of a written volume (including the little-endian
total-residue quirk), round-trip through SequenceFile, digital mode,
and a search over a BLAST-volume target database.
"""
import struct

import numpy as np
import pytest

from pyhmmer_tpu.easel import SequenceFile
from pyhmmer_tpu.easel.alphabet import Alphabet
from pyhmmer_tpu.easel import ncbi


@pytest.fixture()
def volume(tmp_path, data_dir):
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=False) as f:
        seqs = [f.read() for _ in range(40)]
    base = tmp_path / "benchdb"
    n = ncbi.write_protein_db(seqs, base)
    assert n == 40
    return base, seqs


def test_pin_structure(volume):
    base, seqs = volume
    raw = open(str(base) + ".pin", "rb").read()
    version, dbtype = struct.unpack_from(">II", raw, 0)
    assert version == 4 and dbtype == 1
    pin = ncbi.read_pin(base)
    assert pin["nseq"] == len(seqs)
    assert pin["total_res"] == sum(len(s.sequence) for s in seqs)
    assert pin["maxlen"] == max(len(s.sequence) for s in seqs)
    # the documented v4 quirk: the residue total is LITTLE-endian on
    # disk while every other integer is big-endian
    off = 8 + 4 + len("pyhmmer_tpu database") + 4 + \
        len("Jan 1, 2026  12:00 AM") + 4
    le = struct.unpack_from("<Q", raw, off)[0]
    assert le == pin["total_res"]
    # offsets are monotone and bracket the member files
    assert (np.diff(pin["seq_off"]) > 0).all()
    import os
    assert int(pin["seq_off"][-1]) == os.path.getsize(
        str(base) + ".psq")
    assert int(pin["hdr_off"][-1]) == os.path.getsize(
        str(base) + ".phr")


def test_roundtrip_and_sequencefile(volume):
    base, seqs = volume
    rows = list(ncbi.iter_protein_db(base))
    assert len(rows) == len(seqs)
    for (name, desc, txt), s in zip(rows, seqs):
        assert name == s.name
        assert desc == (s.description or b"")
        assert txt == s.sequence

    # SequenceFile integration (path may be the basename or .pin)
    with SequenceFile(str(base) + ".pin", format="ncbi") as f:
        got = list(f)
    assert [g.name for g in got] == [s.name for s in seqs]
    assert got[0].sequence == seqs[0].sequence

    # digital mode digitizes through the standard alphabet machinery
    with SequenceFile(base, format="ncbi", digital=True,
                      alphabet=Alphabet.amino()) as f:
        block = f.read_block()
    assert len(block) == len(seqs)
    np.testing.assert_array_equal(
        block[0].sequence,
        Alphabet.amino().encode(seqs[0].sequence))


def test_search_over_blast_volume(volume, data_dir):
    """End to end: hmmsearch over targets loaded from a BLAST volume
    equals the same search over the FASTA originals."""
    from pyhmmer_tpu.plan7 import HMMFile
    from pyhmmer_tpu import hmmer
    from pyhmmer_tpu.easel.sequence import DigitalSequenceBlock

    base, seqs = volume
    aa = Alphabet.amino()
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmm = f.read()
    with SequenceFile(base, format="ncbi", digital=True,
                      alphabet=aa) as f:
        targets = f.read_block()
    want = DigitalSequenceBlock(
        aa, (s.digitize(aa) for s in seqs))
    th_a = next(hmmer.hmmsearch(hmm, targets))
    th_b = next(hmmer.hmmsearch(hmm, want))
    assert [(h.name, round(h.score, 6)) for h in th_a.reported] == \
        [(h.name, round(h.score, 6)) for h in th_b.reported]


def test_rejects_non_protein(tmp_path):
    bad = tmp_path / "x"
    with open(str(bad) + ".pin", "wb") as fh:
        fh.write(struct.pack(">II", 4, 0))   # nucleotide volume
    with pytest.raises(ValueError):
        ncbi.read_pin(bad)
    with open(str(bad) + ".pin", "wb") as fh:
        fh.write(struct.pack(">II", 5, 1))   # wrong version
    with pytest.raises(ValueError):
        ncbi.read_pin(bad)
