"""Reference-pressed database interop: parse the REAL ``.h3f``/``.h3p``
members written by HMMER's hmmpress (golden fixtures
``tests/data/hmms/db/``) and search with the reconstructed models --
no ``.h3m`` involved."""

import numpy as np
import pytest

from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.pressed import (read_h3f_records, read_h3p_records,
                                       reconstruct_models)
from pyhmmer_tpu.plan7.optimized import HMMPressedFile
from pyhmmer_tpu.plan7.background import Background
from pyhmmer_tpu.plan7.profile import Profile
from pyhmmer_tpu.easel import SequenceFile
import pyhmmer_tpu as ph


@pytest.fixture(scope="module")
def db(data_dir):
    return data_dir / "hmms" / "db"


def test_h3f_fields_match_own_quantization(db, data_dir):
    from pyhmmer_tpu.ops.quantize import quantize_msv
    recs = read_h3f_records(db / "PF02826.hmm.h3f")
    assert len(recs) == 1
    r = recs[0]
    assert r["name"] == b"2-Hacid_dh_C"
    assert r["M"] == 178
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmm = next(iter(f))
    prof = Profile(hmm.M, hmm.alphabet).configure(
        hmm, Background(hmm.alphabet), 400)
    q = quantize_msv(prof)
    assert (r["bias_b"], r["tec_b"], r["tbm_b"]) == (
        q.bias_b, q.tec_b, q.tbm_b)
    assert r["scale_b"] == pytest.approx(q.scale_b, rel=1e-6)
    # quantized costs agree cell-for-cell on canonical residues
    K = hmm.alphabet.K
    assert np.array_equal(r["cost"][:K], q.cost[:K])
    assert np.allclose(r["evparam"], np.asarray(hmm.evparam), atol=1e-4)


def test_h3p_forward_part_matches_h3m_profile(db):
    recs = read_h3p_records(db / "PF02826.hmm.h3p")
    r = recs[0]
    assert r["accession"] == b"PF02826.20"
    with HMMFile(db / "PF02826.hmm.h3m") as f:
        hmm = next(iter(f))
    prof = Profile(hmm.M, hmm.alphabet).configure(
        hmm, Background(hmm.alphabet), 400)
    ours = np.exp(prof.msc[: hmm.alphabet.K, 1:])
    assert np.allclose(r["odds_m"][: hmm.alphabet.K], ours, rtol=1e-5)


def test_reconstruct_models_matches_h3m(db):
    models = reconstruct_models(db / "RREFam.hmm.h3f",
                                db / "RREFam.hmm.h3p")
    with HMMFile(db / "RREFam.hmm.h3m") as f:
        refs = list(f)
    assert len(models) == len(refs) == 10
    for m, ref in zip(models, refs):
        assert m.name == ref.name
        assert m.M == ref.M
        assert np.abs(m.mat[1:] - ref.mat[1:]).max() < 1e-4
        assert np.abs(m.t[1:-1] - ref.t[1:-1]).max() < 1e-4
        # B-row occupancy mass recovered through the entry inversion
        assert abs((m.t[0, 0] + m.t[0, 1])
                   - (ref.t[0, 0] + ref.t[0, 1])) < 1e-4


def test_search_reference_pressed_no_h3m(db, data_dir, tmp_path):
    """End to end: pressed members only (no .h3m on disk), search the
    golden targets, hit-for-hit + 0.1-bit score parity with the
    .h3m-parameterized search."""
    import shutil
    for ext in (".h3f", ".h3p", ".h3i"):
        shutil.copy(db / ("PF02826.hmm" + ext),
                    tmp_path / ("PF02826.hmm" + ext))
    pf = HMMPressedFile(tmp_path / "PF02826.hmm")
    oms = list(pf)
    assert len(oms) == 1
    hmm_rec = oms[0].profile._hmm

    with HMMFile(db / "PF02826.hmm.h3m") as f:
        hmm_ref = next(iter(f))
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        full = f.read_block()
    names = set()
    for line in open(data_dir / "tables" / "PF02826.tbl"):
        if not line.startswith("#"):
            names.add(line.split()[0].encode())
    from pyhmmer_tpu.easel import DigitalSequenceBlock
    targets = DigitalSequenceBlock(
        full.alphabet,
        [s for s in full if s.name in names] + list(full)[:100])

    th_rec = list(ph.hmmsearch([hmm_rec], targets))[0]
    th_ref = list(ph.hmmsearch([hmm_ref], targets))[0]
    rows_rec = [(h.name, h.score) for h in th_rec if h.reported]
    rows_ref = [(h.name, h.score) for h in th_ref if h.reported]
    assert [r[0] for r in rows_rec] == [r[0] for r in rows_ref]
    for (n1, s1), (n2, s2) in zip(rows_rec, rows_ref):
        assert abs(s1 - s2) < 0.1, (n1, s1, s2)
