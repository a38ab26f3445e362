"""Interpret-mode CI parity for the survivor-rows Pallas kernels.

The device-resident postprocessing (``ops.rows_pallas``) replaces the
native full-L Forward/Backward parsers + special-state decode that feed
region finding (``csrc/hmmdp.cpp`` phases 0-2; reference:
``impl_sse/fwdback.c`` parser mode).  These tests run both kernels
through the Pallas interpreter and check the emitted decode term
streams -- btot / etot / mocc after host cumsum -- and the forward /
backward scores against the exact NumPy oracle (``ops.reference``),
across multiple profiles in one batch (scalar-prefetch indexing),
ragged lengths (the pinned backward init), and strip-boundary lengths.
"""

import os
import sys

import numpy as np
import pytest

os.environ["PYHMMER_TPU_PALLAS_INTERPRET"] = "1"
sys.modules.pop("pyhmmer_tpu.ops.rows_pallas", None)

from pyhmmer_tpu.easel.alphabet import Alphabet
from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.background import Background
from pyhmmer_tpu.plan7.profile import Profile
from pyhmmer_tpu.ops import batch as B
from pyhmmer_tpu.ops import reference as ref


@pytest.fixture(scope="module")
def setup(data_dir):
    aa = Alphabet.amino()
    bg = Background(aa)
    hmms = []
    with HMMFile(data_dir / "hmms" / "txt" / "Thioesterase.hmm") as f:
        hmms.extend(f)
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmms.extend(f)
    profs = [Profile(h.M, aa).configure(h, bg, 400, multihit=True)
             for h in hmms]
    pb = B.ProfileBatch(profs)

    rng = np.random.default_rng(11)
    Bn, Lmax = 8, 128
    fill = aa.nonresidue_code
    codes = np.full((Bn, Lmax), fill, dtype=np.uint8)
    lengths = np.zeros(Bn, dtype=np.int64)
    # ragged lengths incl. strip-boundary cases (R=8) and a tiny one
    for i, L in enumerate([128, 127, 96, 65, 64, 17, 9, 5]):
        codes[i, :L] = rng.integers(0, aa.K, L).astype(np.uint8)
        lengths[i] = L
    # a nonresidue code INSIDE a sequence (the proteome's stop '*'): the
    # kernels must zero its emissions exactly like the native parsers
    codes[2, 40] = aa.nonresidue_code
    # make row 0 a consensus-ish repeat so at least one pair carries
    # real domain mass (posterior terms near 1, not only noise)
    row = np.argmax(hmms[1].mat[1:129], axis=1)
    codes[0, : len(row)] = row.astype(np.uint8)
    lengths[0] = len(row)
    dev = B.SeqDevice(codes, lengths)
    return aa, pb, profs, dev, codes, lengths


def _oracle_rows(prof, dsq):
    """btot/etot/mocc + score from the exact NumPy parsers."""
    L = len(dsq)
    prof.reconfig_length(L)
    f = ref.forward(prof, dsq)
    b = ref.backward(prof, dsq)
    lloop = np.log1p(-3.0 / (L + 3.0))
    btot = np.zeros(L + 1)
    etot = np.zeros(L + 1)
    mocc = np.zeros(L + 1)
    for i in range(1, L + 1):
        btot[i] = btot[i - 1] + np.exp(
            f.xB[i - 1] + b.xB[i - 1] - f.score)
        etot[i] = etot[i - 1] + np.exp(f.xE[i] + b.xE[i] - f.score)
        pN = np.exp(f.xN[i - 1] + lloop + b.xN[i] - f.score)
        pJ = np.exp(f.xJ[i - 1] + lloop + b.xJ[i] - f.score)
        pC = np.exp(f.xC[i - 1] + lloop + b.xC[i] - f.score)
        mocc[i] = 1.0 - (pN + pJ + pC)
    return btot, etot, mocc, f.score, b.score


def test_rows_kernels_match_oracle(setup):
    aa, pb, profs, dev, codes, lengths = setup
    from pyhmmer_tpu.ops.rows_pallas import survivor_rows

    # pairs mixing both profiles over ragged lanes (sorted by profile
    # inside survivor_rows; `order` maps back)
    pair_p = np.array([1, 0, 1, 0, 1, 1, 0, 1], dtype=np.int32)
    pair_b = np.array([0, 0, 1, 3, 4, 5, 6, 7], dtype=np.int32)
    terms_d, fsc_d, bsc_d, order = survivor_rows(pb, dev, pair_p, pair_b)
    terms = np.asarray(terms_d, np.float64)
    fsc = np.asarray(fsc_d, np.float64)
    bsc = np.asarray(bsc_d, np.float64)

    for g, src in enumerate(order):
        pi, bi = int(pair_p[src]), int(pair_b[src])
        L = int(lengths[bi])
        dsq = codes[bi, :L]
        btot_o, etot_o, mocc_o, fs_o, bs_o = _oracle_rows(profs[pi], dsq)

        t = terms[g]
        btot = np.concatenate([[0.0], np.cumsum(t[:L, 0])])
        etot = np.concatenate([[0.0], np.cumsum(t[1: L + 1, 1])])
        mocc = 1.0 - t[: L + 1, 2]
        mocc[0] = 0.0

        assert abs(fsc[g] - fs_o) < 1e-3, (g, fsc[g], fs_o)
        # backward score is the integrity audit: must agree with forward
        assert abs(bsc[g] - fs_o) < 2e-3, (g, bsc[g], fs_o)
        np.testing.assert_allclose(btot, btot_o, atol=3e-4, rtol=2e-3)
        np.testing.assert_allclose(etot, etot_o, atol=3e-4, rtol=2e-3)
        np.testing.assert_allclose(mocc, mocc_o, atol=3e-4, rtol=2e-3)


def test_rows_native_domaindef_ext(setup, data_dir):
    """End-to-end: device rows -> hmmdp_domaindef(ext_rows) must give
    the same domains as the classic native path."""
    from pyhmmer_tpu.ops import native
    if not native.available():
        pytest.skip("no native library")
    aa, pb, profs, dev, codes, lengths = setup
    from pyhmmer_tpu.ops.rows_pallas import survivor_rows

    # strongest pair: consensus repeat of PF02826 on lane 0
    pair_p = np.array([1], dtype=np.int32)
    pair_b = np.array([0], dtype=np.int32)
    terms_d, fsc_d, _, order = survivor_rows(pb, dev, pair_p, pair_b)
    terms = np.asarray(terms_d, np.float64)[0]
    fsc = float(np.asarray(fsc_d)[0])
    L = int(lengths[0])
    dsq = codes[0, :L]

    btot = np.concatenate([[0.0], np.cumsum(terms[:L, 0])])
    etot = np.concatenate([[0.0], np.cumsum(terms[1: L + 1, 1])])
    mocc = 1.0 - terms[: L + 1, 2]
    mocc[0] = 0.0
    ext = np.stack([btot, etot, mocc])

    prof = profs[1]
    prof.reconfig_length(L)
    base = native.domaindef(prof, dsq, True, 42)
    ext_out = native.domaindef(prof, dsq, True, 42,
                               ext_rows=ext, ext_fwdsc=fsc)
    assert base is not None and ext_out is not None
    fwd_b, res_b = base
    fwd_e, res_e = ext_out
    assert abs(fwd_b - fwd_e) < 1e-3
    assert res_b.nregions == res_e.nregions
    assert len(res_b.domains) == len(res_e.domains)
    for db, de in zip(res_b.domains, res_e.domains):
        assert (db.ienv, db.jenv, db.iali, db.jali) == \
            (de.ienv, de.jenv, de.iali, de.jali)
        assert abs(db.envsc - de.envsc) < 1e-6
        assert abs(db.oasc - de.oasc) < 1e-4


def test_rows_kernels_large_model(data_dir):
    """Large-Mp coverage (LuxC, M=400 -> 512 model lanes): the scan
    depth, roll distances, and transfer rows all change with Mp, so the
    small-model test alone would miss layout bugs on big profiles."""
    from pyhmmer_tpu.ops.rows_pallas import survivor_rows

    aa = Alphabet.amino()
    bg = Background(aa)
    with HMMFile(data_dir / "hmms" / "txt" / "LuxC.hmm") as f:
        hmm = f.read()
    prof = Profile(hmm.M, aa).configure(hmm, bg, 400, multihit=True)
    pb = B.ProfileBatch([prof])

    rng = np.random.default_rng(23)
    Bn, Lmax = 8, 256
    fill = aa.nonresidue_code
    codes = np.full((Bn, Lmax), fill, dtype=np.uint8)
    lengths = np.zeros(Bn, dtype=np.int64)
    for i, L in enumerate([256, 255, 200, 129, 128, 63, 17, 7]):
        codes[i, :L] = rng.integers(0, aa.K, L).astype(np.uint8)
        lengths[i] = L
    # consensus slice so one pair carries real domain mass
    row = np.argmax(hmm.mat[1:257], axis=1)
    codes[0, : len(row)] = row.astype(np.uint8)
    dev = B.SeqDevice(codes, lengths)

    pair_p = np.zeros(4, dtype=np.int32)
    pair_b = np.array([0, 2, 4, 7], dtype=np.int32)
    terms_d, fsc_d, bsc_d, order = survivor_rows(pb, dev, pair_p, pair_b)
    terms = np.asarray(terms_d, np.float64)
    fsc = np.asarray(fsc_d, np.float64)
    bsc = np.asarray(bsc_d, np.float64)
    for g, src in enumerate(order):
        bi = int(pair_b[src])
        L = int(lengths[bi])
        dsq = codes[bi, :L]
        btot_o, etot_o, mocc_o, fs_o, _bs = _oracle_rows(prof, dsq)
        t = terms[g]
        btot = np.concatenate([[0.0], np.cumsum(t[:L, 0])])
        etot = np.concatenate([[0.0], np.cumsum(t[1: L + 1, 1])])
        mocc = 1.0 - t[: L + 1, 2]
        mocc[0] = 0.0
        assert abs(fsc[g] - fs_o) < 2e-3, (g, fsc[g], fs_o)
        assert abs(bsc[g] - fs_o) < 3e-3
        np.testing.assert_allclose(btot, btot_o, atol=5e-4, rtol=3e-3)
        np.testing.assert_allclose(etot, etot_o, atol=5e-4, rtol=3e-3)
        np.testing.assert_allclose(mocc, mocc_o, atol=5e-4, rtol=3e-3)


def test_marginal_audit_fallback(setup):
    """Rows whose region-threshold comparisons sit inside the audit
    epsilon must transparently rerun the exact host parsers IN the same
    native call -- output identical to the classic path, marginal
    counter incremented."""
    from pyhmmer_tpu.ops import native
    if not native.available():
        pytest.skip("no native library")
    aa, pb, profs, dev, codes, lengths = setup
    from pyhmmer_tpu.ops.rows_pallas import survivor_rows

    pair_p = np.array([1], dtype=np.int32)
    pair_b = np.array([0], dtype=np.int32)
    terms_d, fsc_d, _, order = survivor_rows(pb, dev, pair_p, pair_b)
    terms = np.asarray(terms_d, np.float64)[0]
    fsc = float(np.asarray(fsc_d)[0])
    L = int(lengths[0])
    dsq = codes[0, :L]
    btot = np.concatenate([[0.0], np.cumsum(terms[:L, 0])])
    etot = np.concatenate([[0.0], np.cumsum(terms[1: L + 1, 1])])
    mocc = 1.0 - terms[: L + 1, 2]
    mocc[0] = 0.0
    # force a marginal comparison: row 1's rt2 check
    # (mocc[1] - (btot[1]-btot[0]) < rt2) is evaluated on every scan;
    # pin its margin to ~1e-6, far inside the 2e-4 audit epsilon
    mocc[1] = 0.10 + (btot[1] - btot[0]) + 1e-6
    ext = np.stack([btot, etot, mocc])

    prof = profs[1]
    prof.reconfig_length(L)
    before = native.marginal_count()
    base = native.domaindef(prof, dsq, True, 42)
    out = native.domaindef(prof, dsq, True, 42,
                           ext_rows=ext, ext_fwdsc=fsc)
    assert native.marginal_count() == before + 1
    fwd_b, res_b = base
    fwd_e, res_e = out
    # the fallback recomputed the EXACT parsers: bit-identical output,
    # including the exact (not device f32) forward score
    assert fwd_b == fwd_e
    assert len(res_b.domains) == len(res_e.domains)
    for db, de in zip(res_b.domains, res_e.domains):
        assert (db.ienv, db.jenv, db.envsc) == (de.ienv, de.jenv,
                                                de.envsc)
