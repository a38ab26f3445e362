"""Application-layer golden parity tests (SURVEY.md §4: the reference
exercises every CLI-equivalent through golden files --
``test_hmmer.py:51-830``)."""
import pytest

import pyhmmer_tpu as ph
from pyhmmer_tpu.plan7 import HMMFile, HMMPressedFile
from pyhmmer_tpu.easel import SequenceFile, MSAFile


@pytest.fixture(scope="module")
def luxc(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "LuxC.hmm") as f:
        return f.read()


def test_hmmalign_luxc_golden(data_dir, luxc):
    """hmmalign output is byte-identical to the bundled HMMER golden
    alignment (reference test_hmmer.py:808-820)."""
    with SequenceFile(data_dir / "seqs" / "LuxC.faa", digital=True) as f:
        seqs = f.read_block()
    with MSAFile(data_dir / "msa" / "LuxC.hmmalign.sto") as f:
        ref = f.read()
    msa = ph.hmmalign(luxc, seqs, trim=True)
    assert list(msa.names) == list(ref.names)
    assert list(msa.alignment) == list(ref.alignment)


def test_hmmscan_rrefam_golden(data_dir):
    """hmmscan hits match the bundled ``RREFam.scan.tbl`` golden table
    (reference test_hmmer.py TestHMMScan.test_rrefam_block)."""
    expected = {}
    with open(data_dir / "tables" / "RREFam.scan.tbl") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.split()
            expected.setdefault(f[2], []).append(
                (f[0], float(f[5]), float(f[6])))
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        seqs = [s for s in f if s.name.decode() in expected]
    with HMMFile(data_dir / "hmms" / "txt" / "RREFam.hmm") as f:
        hmms = list(f)
    for th in ph.hmmscan(seqs, hmms):
        qn = th.query_name.decode()
        got = [(h.name.decode(), h.score, h.bias) for h in th if h.reported]
        exp = expected[qn]
        assert [g[0] for g in got] == [e[0] for e in exp]
        for (gn, gs, gb), (en, es, eb) in zip(got, exp):
            # null2 on clustered hits carries sampler-RNG wobble
            # (PARITY_NOTES.md gap #2/#3): allow 0.3 bits there
            assert abs(gs - es) <= 0.3
            assert abs(gb - eb) <= 0.3


def test_jackhmmer_pksi_golden(data_dir):
    """jackhmmer first iteration matches the bundled phmmer golden
    domtbl (reference test_hmmer.py TestJackhmmer.test_pksi)."""
    with SequenceFile(data_dir / "seqs" / "PKSI.faa", digital=True) as f:
        seqs = f.read_block()
    res = next(iter(ph.jackhmmer(seqs[-1:], seqs, max_iterations=1)))
    assert res.iteration == 1
    hits = res.hits
    hits.sort()
    exp = []
    with open(data_dir / "tables" / "A0A089QRB9.domtbl") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.split()
            exp.append((f[0], float(f[7])))
    got = [(h.name.decode(), h.score) for h in hits for _ in h.domains]
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (gn, gs), (en, es) in zip(got, exp):
        # big multidomain hits carry ensemble-null2 wobble; scores are
        # hundreds-to-thousands of bits there, so use a relative bound
        assert abs(gs - es) <= max(0.2, 0.01 * abs(es))


def test_phmmer_self_hit(data_dir):
    with SequenceFile(data_dir / "seqs" / "LuxC.faa", digital=True) as f:
        seqs = f.read_block()
    th = next(iter(ph.phmmer(seqs[0], seqs)))
    assert len(th) >= 1
    assert th[0].name == seqs[0].name        # best hit is self
    assert th[0].score > 100.0


def test_hmmpress_roundtrip(tmp_path, data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "RREFam.hmm") as f:
        hmms = list(f)
    base = tmp_path / "RREFam.hmm"
    with open(base, "wb") as fh:          # hmmpress sits NEXT TO the db
        for h in hmms:
            h.write(fh)
    n = ph.hmmpress(hmms, base)
    assert n == len(hmms)
    for ext in (".h3m", ".h3f", ".h3p", ".h3i"):
        assert (tmp_path / ("RREFam.hmm" + ext)).exists()
    with HMMFile(base) as f:
        assert f.is_pressed()
        oms = list(f.optimized_profiles())
    assert [om.name for om in oms] == [h.name for h in hmms]
    with HMMPressedFile(base) as pf:
        assert len(list(pf)) == len(hmms)


def test_jackhmmer_pksi_checkpoints(data_dir):
    """Iterative convergence shape (reference test_pksi_checkpoint:
    HMMER CLI converges in 3 iterations / 5 hits / 17 MSA seqs; the
    ensemble-RNG domain-count wobble on the giant multidomain PKS hits
    can merge one envelope and converge one iteration earlier --
    PARITY_NOTES.md gap #2)."""
    with SequenceFile(data_dir / "seqs" / "PKSI.faa", digital=True) as f:
        seqs = f.read_block()
    iterations = next(iter(ph.jackhmmer(seqs[-1:], seqs, checkpoints=True)))
    assert 2 <= len(iterations) <= 4
    last = iterations[-1]
    assert last.converged
    assert len(last.hits) == 5
    # 17 +- 2: each ensemble-RNG envelope merge/split on the two giant
    # multidomain PKS hits shifts the MSA row count by one (gap #2)
    assert abs(len(last.msa.sequences) - 17) <= 2


def test_sharded_search_matches_single_shot(data_dir):
    """Data-parallel shard + merge == single-shot search (the reference's
    reverse-dispatcher equivalence, SURVEY.md §2.6: sum auto-Z,
    re-threshold)."""
    from pyhmmer_tpu.parallel.mesh import sharded_search
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmm = f.read()
    from pyhmmer_tpu.easel import DigitalSequenceBlock
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        full = f.read_block()
    import jax
    targets = DigitalSequenceBlock(full.alphabet, list(full)[:300])
    single = list(ph.hmmsearch([hmm], targets))[0]
    # one shard per virtual device: each engine's buffers/kernels are
    # pinned to its own device of the 8-device CPU mesh (conftest)
    devices = jax.devices()
    assert len(devices) >= 8, "conftest should expose 8 virtual devices"
    merged = sharded_search([hmm], targets, n_shards=len(devices))[0]
    assert merged.Z == single.Z
    s_rows = [(h.name, round(h.score, 4), round(h.evalue, 6), h.included)
              for h in single if h.reported]
    m_rows = [(h.name, round(h.score, 4), round(h.evalue, 6), h.included)
              for h in merged if h.reported]
    assert s_rows == m_rows


def test_hmmscan_bit_cutoffs_engine_routing(data_dir):
    """GA-cutoff hmmscan goes through the batched engine with per-model
    thresholds preserved; flags match the sequential oracle scan."""
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmms = list(f)
    with HMMFile(data_dir / "hmms" / "txt" / "LuxC.hmm") as f:
        hmms += list(f)
    assert all(h.cutoffs[0] > -99998.0 for h in hmms)  # GA present
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        full = f.read_block()
    # pick targets that include golden PF02826 hits
    names = set()
    for line in open(data_dir / "tables" / "PF02826.tbl"):
        if not line.startswith("#"):
            names.add(line.split()[0].encode())
    queries = [s for s in full if s.name in names][:6]
    eng = list(ph.hmmscan(queries, hmms, bit_cutoffs="gathering"))
    ora = list(ph.hmmscan(queries, hmms, bit_cutoffs="gathering",
                          backend="oracle"))
    assert len(eng) == len(ora) == len(queries)
    for te, to in zip(eng, ora):
        re_ = [(h.name, round(h.score, 3), h.included) for h in te
               if h.reported]
        ro = [(h.name, round(h.score, 3), h.included) for h in to
              if h.reported]
        assert re_ == ro
    # the PF02826 GA is low enough that the golden targets report
    assert any(len([h for h in t if h.reported]) for t in eng)


def test_hmmscan_pressed_file_direct(data_dir, tmp_path):
    """hmmscan over an HMMPressedFile iterates the pressed DB directly
    (no .h3m filename convention on the caller side)."""
    with HMMFile(data_dir / "hmms" / "txt" / "RREFam.hmm") as f:
        hmms = list(f)
    base = tmp_path / "RRE.hmm"
    ph.hmmpress(hmms, base)
    from pyhmmer_tpu.plan7.optimized import HMMPressedFile
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        seqs = list(f.read_block())[:4]
    pf = HMMPressedFile(base)
    res = list(ph.hmmscan(seqs, pf))
    assert len(res) == 4
    assert all(r.Z == len(hmms) for r in res)
