"""Engine-level CI coverage of the Pallas cascade path.

The engine on CPU normally uses the XLA fallback kernels; every round
until now the ``use_pallas=True`` flow (fused MSV+bias, strip gathers,
device Forward/Viterbi, margin-checked bias gating) only ever executed
on real TPU hardware.  This runs the WHOLE engine through the Pallas
interpreter on a golden-bearing subset and asserts hit-for-hit identity
with the fallback engine -- the class of bug this catches: gate-margin
errors, survivor-gather layout mistakes, fused-bias divergence.
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
from pyhmmer_tpu.easel import SequenceFile
from pyhmmer_tpu.easel.sequence import DigitalSequenceBlock
from pyhmmer_tpu.engine import SearchEngine


def test_engine_pallas_vs_fallback(data_dir):
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmms = list(f)
    with HMMFile(data_dir / "hmms" / "txt" / "RREFam.hmm") as f:
        hmms += list(f)[:3]
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        full = f.read_block()
    # subset containing the golden PF02826 hits plus background targets
    want = set()
    tbl = data_dir / "tables" / "PF02826.tbl"
    for line in open(tbl):
        if not line.startswith("#"):
            want.add(line.split()[0].encode())
    subset = [s for s in full if s.name in want] + list(full)[:120]
    seen, uniq = set(), []
    for s in subset:
        if s.name not in seen:
            seen.add(s.name)
            uniq.append(s)
    targets = DigitalSequenceBlock(hmms[0].alphabet, uniq)

    res_fb = SearchEngine(hmms[0].alphabet,
                          use_pallas=False).search(hmms, targets)
    res_pl = SearchEngine(hmms[0].alphabet,
                          use_pallas=True).search(hmms, targets)

    for qi in range(len(hmms)):
        # hit sets, order, inclusion, and domain coordinates must be
        # identical; scores carry the f32 device-rows forward score
        # (ops.rows_pallas), in agreement with the exact path to well
        # under a millbit -- far inside every reported-precision contract
        rows_fb = [(h.name, h.included) for h in res_fb[qi] if h.reported]
        rows_pl = [(h.name, h.included) for h in res_pl[qi] if h.reported]
        assert rows_pl == rows_fb, (qi, rows_pl, rows_fb)
        for hf, hp in zip((h for h in res_fb[qi] if h.reported),
                          (h for h in res_pl[qi] if h.reported)):
            assert abs(hp.score - hf.score) < 2e-3, (hf.name, hp.score,
                                                     hf.score)
            assert abs(hp.bias - hf.bias) < 2e-3
            dn_f = [(d.env_from, d.env_to, d.included) for d in hf.domains]
            dn_p = [(d.env_from, d.env_to, d.included) for d in hp.domains]
            assert dn_f == dn_p, (hf.name, dn_f, dn_p)
        assert res_pl[qi].n_past_msv == res_fb[qi].n_past_msv
        assert res_pl[qi].n_past_bias == res_fb[qi].n_past_bias
        assert res_pl[qi].n_past_fwd == res_fb[qi].n_past_fwd
    # the golden hits are actually present (non-trivial workload)
    assert sum(len(r.reported) for r in res_pl) >= len(want)


def test_engine_pallas_forced_rows(data_dir, monkeypatch):
    """Same equivalence with every survivor forced through the device
    rows stage (speculation + sparse host routing disabled), so the
    ops.rows_pallas path demonstrably produced the reported hits."""
    monkeypatch.setenv("PYHMMER_TPU_SPEC_P1B", "-1")
    monkeypatch.setenv("PYHMMER_TPU_HOST_BUDGET", "0")
    monkeypatch.setenv("PYHMMER_TPU_DEVICE_ROWS", "1")
    with HMMFile(data_dir / "hmms" / "txt" / "PF02826.hmm") as f:
        hmms = list(f)
    with SequenceFile(data_dir / "seqs" / "938293.PRJEB85.HG003687.faa",
                      digital=True) as f:
        full = f.read_block()
    targets = DigitalSequenceBlock(hmms[0].alphabet, list(full)[:400])

    res_fb = SearchEngine(hmms[0].alphabet,
                          use_pallas=False).search(hmms, targets)
    eng = SearchEngine(hmms[0].alphabet, use_pallas=True)
    res_pl = eng.search(hmms, targets)
    # the rows stage actually ran and attached device rows
    assert eng.last_timing.get("n_rows_ext", 0) > 0, eng.last_timing
    for qi in range(len(hmms)):
        rows_fb = [(h.name, h.included,
                    [(d.env_from, d.env_to) for d in h.domains])
                   for h in res_fb[qi] if h.reported]
        rows_pl = [(h.name, h.included,
                    [(d.env_from, d.env_to) for d in h.domains])
                   for h in res_pl[qi] if h.reported]
        assert rows_pl == rows_fb, (qi, rows_pl, rows_fb)
        for hf, hp in zip((h for h in res_fb[qi] if h.reported),
                          (h for h in res_pl[qi] if h.reported)):
            assert abs(hp.score - hf.score) < 2e-3
            assert abs(hp.bias - hf.bias) < 2e-3
