"""Streamed I/O: blockwise hmmsearch, file-streamed genome windows.

Reference behavior: hmmsearch workers stream/re-open target files
(``hmmer/_hmmsearch.py:81-90``) and the long-targets pipeline reads
genome windows off disk (``plan7.pyx:7494-7539``) so peak memory is
independent of database size.
"""

import io
import random
import tracemalloc

import numpy as np
import pytest

from pyhmmer_tpu.easel import SequenceFile
from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.longtargets import LongTargetsPipeline
from pyhmmer_tpu import hmmer


@pytest.fixture(scope="module")
def pf02826(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        return f.read()


def _rows(th):
    return [(h.name, round(h.score, 6), round(h.evalue, 6))
            for h in th.reported]


def test_hmmsearch_streamed_blocks_match_full(data_dir, pf02826):
    """Streaming the target file in small blocks + merge reproduces the
    single-block search exactly (hits, scores, E-values)."""
    path = data_dir / "seqs" / "938293.PRJEB85.HG003687.faa"
    with SequenceFile(path, digital=True) as f:
        full = list(hmmer.hmmsearch([pf02826], f.read_block()))[0]
    with SequenceFile(path, digital=True) as f:
        # ~700 KB of residues -> several blocks
        streamed = list(hmmer.hmmsearch([pf02826], f,
                                        block_residues=120_000))[0]
    assert _rows(streamed) == _rows(full)
    assert streamed.Z == full.Z


def test_sequence_file_is_not_slurped(tmp_path):
    """Opening a FASTA path must not read the file into memory; block
    reads with a residue cap keep peak allocation near the cap."""
    random.seed(7)
    path = tmp_path / "big.fa"
    with open(path, "w") as fh:
        for i in range(400):
            fh.write(f">seq{i}\n")
            for _ in range(25):
                fh.write("".join(random.choice("ACDEFGHIKLMNPQRSTVWY")
                                 for _ in range(60)) + "\n")
    size = path.stat().st_size  # ~640 KB
    tracemalloc.start()
    with SequenceFile(path, digital=True) as f:
        while True:
            b = f.read_block(residues=20_000)
            if len(b) == 0:
                break
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < size / 3, (peak, size)


def test_records_chunked_streams_fasta(tmp_path):
    path = tmp_path / "multi.fa"
    with open(path, "w") as fh:
        fh.write(">a first record\nACGTACGT\nACGT\n")
        fh.write(">b\n" + "ACGT" * 50 + "\n")
        fh.write(">c empty\n")
        fh.write(">d\nTTTT\n")
    with SequenceFile(path) as f:
        out = []
        for header, chunks in f.records_chunked(chunk_residues=16):
            seq = "".join(chunks)
            out.append((header.name, header.description, len(seq)))
    assert out == [(b"a", b"first record", 12), (b"b", b"", 200),
                   (b"c", b"empty", 0), (b"d", b"", 4)]


def test_streamed_windows_match_inmemory(tmp_path, data_dir):
    """The file-streamed window generator yields exactly the in-memory
    pipeline's window boundaries and contents."""
    from pyhmmer_tpu.easel.alphabet import Alphabet

    dna = Alphabet.dna()
    random.seed(3)
    path = tmp_path / "genome.fa"
    lens = [10, 999, 5000, 12345]
    with open(path, "w") as fh:
        for i, n in enumerate(lens):
            fh.write(f">chr{i}\n")
            s = "".join(random.choice("ACGT") for _ in range(n))
            for j in range(0, n, 70):
                fh.write(s[j: j + 70] + "\n")

    pli = LongTargetsPipeline(dna)
    W, C = 4096, 500
    with SequenceFile(path, digital=True, alphabet=dna) as f:
        mem = f.read_block()
    inmem = []
    for sq, wit, fl in pli._inmemory_records(list(mem), W, C):
        ws = [(i, win.tobytes()) for i, win, _ in wit]
        inmem.append((sq.name, fl(), ws))
    with SequenceFile(path, digital=True, alphabet=dna) as f:
        streamed = []
        for sq, wit, fl in pli._streamed_records(f, W, C):
            ws = [(i, win.tobytes()) for i, win, _ in wit]
            streamed.append((sq.name, fl(), ws))
    assert streamed == inmem


def test_nhmmer_streamed_matches_inmemory(data_dir):
    """nhmmer over a digital SequenceFile (windowed off disk) reproduces
    the in-memory block run hit for hit."""
    with HMMFile(data_dir / "hmms" / "txt" / "bmyD.hmm") as f:
        bmyd = f.read()
    path = data_dir / "seqs" / "BGC0001090.gbk"
    with SequenceFile(path, digital=True, alphabet=bmyd.alphabet) as f:
        block = f.read_block()
    full = list(hmmer.nhmmer(bmyd, block))[0]
    with SequenceFile(path, digital=True, alphabet=bmyd.alphabet) as f:
        streamed = list(hmmer.nhmmer(bmyd, f))[0]
    assert [(h.name, round(h.score, 6), h.length) for h in streamed.reported] \
        == [(h.name, round(h.score, 6), h.length) for h in full.reported]
