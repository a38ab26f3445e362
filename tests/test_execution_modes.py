"""The reference's central test pattern (SURVEY section 4): the SAME
search run through every execution mode must be result-identical
(``test_hmmer.py:240-370`` runs single/multi-thread/multi-process/
reverse dispatchers through one shared assertion set).

Modes here: batched engine, sequential float64 oracle, streamed
blockwise file input, device-sharded (thread-per-shard + merge), and
the multi-host runtime's degenerate path.
"""
import io

import pytest

from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.easel import SequenceFile
from pyhmmer_tpu.easel.sequence import DigitalSequenceBlock
from pyhmmer_tpu import hmmer
from pyhmmer_tpu.parallel.mesh import sharded_search
from pyhmmer_tpu.parallel import multihost


@pytest.fixture(scope="module")
def workload(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmms = list(f)
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        full = f.read_block()
    want = set()
    for line in open(data_dir / "tables" / "PF02826.tbl"):
        if not line.startswith("#"):
            want.add(line.split()[0].encode())
    subset = [s for s in full if s.name in want][:8] + list(full)[:250]
    seen, uniq = set(), []
    for s in subset:
        if s.name not in seen:
            seen.add(s.name)
            uniq.append(s)
    return hmms, DigitalSequenceBlock(hmms[0].alphabet, uniq), data_dir


def _rows(th):
    # evalue at 4 significant digits: the engine and oracle accumulate
    # Z bookkeeping through different float paths (1-ulp exp wobble)
    return [(h.name, round(h.score, 4), float(f"{h.evalue:.4g}"),
             h.included, len(h.domains)) for h in th.reported]


def test_all_execution_modes_identical(workload):
    hmms, targets, data_dir = workload

    engine_rows = [_rows(th) for th in hmmer.hmmsearch(hmms, targets)]
    assert sum(len(r) for r in engine_rows) >= 8

    oracle_rows = [_rows(th) for th in
                   hmmer.hmmsearch(hmms, targets, backend="oracle")]
    assert oracle_rows == engine_rows

    # streamed blockwise file input (two blocks + merge)
    fasta = io.StringIO()
    for s in targets:
        t = s.textize()
        fasta.write(f">{t.name.decode()}\n{t.sequence}\n")
    fasta.seek(0)
    with SequenceFile(fasta, digital=True,
                      alphabet=hmms[0].alphabet) as sf:
        streamed_rows = [_rows(th) for th in hmmer.hmmsearch(
            hmms, sf, block_residues=40_000)]
    assert streamed_rows == engine_rows

    sharded_rows = [_rows(th) for th in
                    sharded_search(hmms, targets, n_shards=4)]
    assert sharded_rows == engine_rows

    mh_rows = [_rows(th) for th in
               multihost.multihost_search(hmms, targets)]
    assert mh_rows == engine_rows
