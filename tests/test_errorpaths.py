"""Error-path and fallback coverage (round-3 verdict #9).

Reference anchors: worker-exception kill-switch semantics
(``test_hmmer.py:261-303``), the no-native-library engine fallback
(``engine.py`` pure-Python path), and daemon Server behavior under
concurrent clients.
"""
import threading

import numpy as np
import pytest

from pyhmmer_tpu.easel.alphabet import Alphabet
from pyhmmer_tpu.easel import SequenceFile
from pyhmmer_tpu.easel.sequence import DigitalSequenceBlock
from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.pipeline import Pipeline
from pyhmmer_tpu.engine import SearchEngine
from pyhmmer_tpu import hmmer


@pytest.fixture(scope="module")
def small_search(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmms = list(f)
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        full = f.read_block()
    # small subset guaranteed to produce hits
    want = set()
    for line in open(data_dir / "tables" / "PF02826.tbl"):
        if not line.startswith("#"):
            want.add(line.split()[0].encode())
    subset = [s for s in full if s.name in want][:6] + list(full)[:60]
    seen, uniq = set(), []
    for s in subset:
        if s.name not in seen:
            seen.add(s.name)
            uniq.append(s)
    return hmms, DigitalSequenceBlock(hmms[0].alphabet, uniq)


class _Boom(RuntimeError):
    pass


def test_callback_exception_engine(small_search):
    """A raising progress callback aborts the search cleanly: the
    exception reaches the caller and no worker threads leak."""
    hmms, targets = small_search
    before = threading.active_count()

    def cb(query, total):
        raise _Boom("callback failure")

    with pytest.raises(_Boom):
        list(hmmer.hmmsearch(hmms, targets, callback=cb))
    assert threading.active_count() == before


def test_callback_exception_oracle(small_search):
    hmms, targets = small_search

    def cb(query, total):
        raise _Boom("callback failure")

    with pytest.raises(_Boom):
        list(hmmer.hmmsearch(hmms, targets, backend="oracle",
                             callback=cb))


def test_sharded_search_worker_exception(small_search):
    """An exception inside one shard's engine propagates out of
    sharded_search and leaves no leaked worker threads."""
    from pyhmmer_tpu.parallel.mesh import sharded_search

    hmms, targets = small_search
    before = threading.active_count()

    class _BadEngine:
        def search(self, queries, block):
            raise _Boom("shard worker failure")

    with pytest.raises(_Boom):
        sharded_search(hmms, targets, n_shards=4,
                       engine_factory=lambda dev: _BadEngine())
    assert threading.active_count() == before


def test_no_native_fallback_parity(small_search, monkeypatch):
    """With the native library disabled the engine's pure-Python
    fallback must report the identical hit set (engine.py fallback
    branch; previously zero-coverage)."""
    from pyhmmer_tpu.ops import native

    hmms, targets = small_search
    ref_rows = [[(h.name, round(h.score, 4), h.included)
                 for h in th.reported]
                for th in SearchEngine(hmms[0].alphabet).search(
                    hmms, targets)]

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    fb_rows = [[(h.name, round(h.score, 4), h.included)
                for h in th.reported]
               for th in SearchEngine(hmms[0].alphabet).search(
                   hmms, targets)]
    assert fb_rows == ref_rows
    assert sum(len(r) for r in fb_rows) >= 6


def test_daemon_server_concurrent_clients(data_dir):
    """Several clients searching simultaneously against one Server get
    complete, identical answers (ThreadingTCPServer path)."""
    from pyhmmer_tpu import daemon

    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True, alphabet=Alphabet.amino()) as f:
        seqs = f.read_block(sequences=200)
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmm = f.read()

    server = daemon.Server(seqdbs=[seqs], port=0)
    server.start()
    try:
        results = [None] * 3
        errors = []

        def go(i):
            try:
                with daemon.Client("127.0.0.1", server.port) as client:
                    th = client.search_hmm(hmm)
                results[i] = [(h.name, round(h.score, 3))
                              for h in th.hits]
            except Exception as exc:   # surfaced below
                errors.append(exc)

        threads = [threading.Thread(target=go, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert results[0] and results[0] == results[1] == results[2]
    finally:
        server.shutdown()
