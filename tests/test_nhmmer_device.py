"""CI coverage for the nhmmer device gating path.

The device gates (``LongTargetsPipeline._device_gates``) normally run only
on a real accelerator; this file forces them through the Pallas
interpreter (``PYHMMER_TPU_NHMMER_DEVICE=force`` +
``PYHMMER_TPU_PALLAS_INTERPRET=1``) so the gate code in
``plan7/longtargets.py`` runs in CI -- including the >256-subwindow
batches whose ``Bpad = 384`` lane padding used to break the survivor
gather (advisor finding, round 3).

Also validates the f32 prefilter margin empirically: the device
Viterbi/Forward scores must sit far inside ``DEVICE_GATE_MARGIN`` of the
exact host kernels, otherwise the margin scheme could silently drop true
hits.
"""
import os
import sys

import numpy as np
import pytest

os.environ["PYHMMER_TPU_PALLAS_INTERPRET"] = "1"
for _m in ("pyhmmer_tpu.ops.msv_pallas", "pyhmmer_tpu.ops.fwd_pallas",
           "pyhmmer_tpu.ops.vit_pallas"):
    sys.modules.pop(_m, None)

from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.background import Background
from pyhmmer_tpu.plan7.profile import Profile
from pyhmmer_tpu.plan7.longtargets import LongTargetsPipeline
from pyhmmer_tpu.easel import SequenceFile
from pyhmmer_tpu.easel.sequence import DigitalSequence, DigitalSequenceBlock
from pyhmmer_tpu.ops import native, reference as refops
from pyhmmer_tpu.ops.quantize import quantize_msv


@pytest.fixture(scope="module")
def bmyd(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "bmyD.hmm") as f:
        return f.read()


def _make_pend(alphabet, rng, n, lmin=40, lmax=220):
    pend = []
    for i in range(n):
        L = int(rng.integers(lmin, lmax + 1))
        sub = rng.integers(0, alphabet.K, L).astype(np.uint8)
        pend.append(dict(sub=sub, a=1, win_start=0, orig_len=L,
                         strand="+", seqidx=0, sq=None))
    return pend


def test_device_gates_bpad_384(bmyd):
    """300 subwindows pad to Bpad=384 (not a multiple of 256): the
    survivor-gather lane tile must divide it.  MSV must be
    integer-exact vs the native host kernel; the f32 Viterbi/Forward
    prefilter scores must sit well inside DEVICE_GATE_MARGIN of the
    exact host scores."""
    alphabet = bmyd.alphabet
    pli = LongTargetsPipeline(alphabet)
    prof = Profile(bmyd.M, alphabet).configure(
        bmyd, pli.background, 400, multihit=True)
    rng = np.random.default_rng(11)
    pend = _make_pend(alphabet, rng, 300)

    usc, vit, fwd = pli._device_gates(prof, pend)
    assert usc.shape == (300,) and vit.shape == (300,) and fwd.shape == (300,)

    q = quantize_msv(prof)
    margin = LongTargetsPipeline.DEVICE_GATE_MARGIN
    worst_v = worst_f = 0.0
    for j in (0, 1, 17, 63, 128, 255, 256, 280, 299):
        sub = pend[j]["sub"]
        u_host = native.msv_quant(q, sub)
        if u_host is None:
            u_host = refops.msv_score_quantized(prof, sub)
        assert usc[j] == pytest.approx(u_host, abs=1e-9), j
        prof.reconfig_length(len(sub))
        v_host = native.viterbi_score(prof, sub)
        if v_host is None:
            v_host = refops.viterbi_score(prof, sub)
        f_host = refops.forward(prof, sub).score
        worst_v = max(worst_v, abs(vit[j] - v_host))
        worst_f = max(worst_f, abs(fwd[j] - f_host))
    # empirical validation of the margin: f32 error must be far below it
    assert worst_v < 0.05 * margin, worst_v
    assert worst_f < 0.05 * margin, worst_f


def test_nhmmer_forced_device_hit_parity(data_dir, bmyd, monkeypatch):
    """End-to-end: a genome slice searched with the device gates forced
    on (interpret mode) reports exactly the same hits as the host path.
    The slice covers the two golden bmyD hits near 313-315 kb."""
    with SequenceFile(
            data_dir / "seqs" / "1390.SAMEA104415756.OFHT01000022.fna",
            digital=True, alphabet=bmyd.alphabet) as f:
        genome = f.read_block()
    lo, hi = 308000, 320000
    sl = DigitalSequence(bmyd.alphabet, name=b"slice",
                         sequence=genome[0].sequence[lo:hi])
    block = DigitalSequenceBlock(bmyd.alphabet, [sl])

    def run():
        pli = LongTargetsPipeline(bmyd.alphabet)
        return pli.search_hmm(bmyd, block)

    monkeypatch.setenv("PYHMMER_TPU_NHMMER_DEVICE", "0")
    host_hits = run()
    monkeypatch.setenv("PYHMMER_TPU_NHMMER_DEVICE", "force")
    dev_hits = run()

    key = lambda h: (h.name, h.best_domain.ali_from, h.best_domain.ali_to,
                     round(h.score, 6))
    assert sorted(map(key, dev_hits)) == sorted(map(key, host_hits))
    assert len(host_hits) >= 1           # the slice does contain hits
