"""Interpret-mode CI parity for the three Pallas stage kernels.

The conftest forces CPU, where the engine uses the XLA fallback kernels
(`ops.batch`); the Pallas kernels otherwise only run on real TPU
hardware.  These tests execute them through the Pallas interpreter
(``PYHMMER_TPU_PALLAS_INTERPRET=1``) and compare against the fallback
kernels on shapes that exercise the lane-tiled strip layout (Bpad >
lane tile, lengths straddling strip boundaries, MSV overflow rows) --
the exact regression class a kernel/layout rewrite can introduce.
"""

import os
import sys

import numpy as np
import pytest

os.environ["PYHMMER_TPU_PALLAS_INTERPRET"] = "1"
for _m in ("pyhmmer_tpu.ops.msv_pallas", "pyhmmer_tpu.ops.fwd_pallas",
           "pyhmmer_tpu.ops.vit_pallas"):
    sys.modules.pop(_m, None)

import jax.numpy as jnp

from pyhmmer_tpu.easel.alphabet import Alphabet
from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.plan7.background import Background
from pyhmmer_tpu.plan7.profile import Profile
from pyhmmer_tpu.ops import batch as B
from pyhmmer_tpu.ops.quantize import tjb_units


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

    # sequences: random + straddling strip boundaries + empty-ish rows;
    # B = 256 with a 128 lane tile forces 2 lane tiles
    rng = np.random.default_rng(7)
    Bn, Lmax = 256, 192
    fill = aa.nonresidue_code
    codes = np.full((Bn, Lmax), fill, dtype=np.uint8)
    lengths = np.zeros(Bn, dtype=np.int64)
    for i in range(Bn):
        L = int(rng.integers(5, Lmax + 1))
        if i % 17 == 0:
            L = [1, 7, 8, 9, 63, 64, 65, 191, 192][i // 17 % 9]
        codes[i, :L] = rng.integers(0, aa.K, L).astype(np.uint8)
        lengths[i] = L
    # a couple of high-scoring rows (consensus repeats) to push the MSV
    # DP toward saturation/overflow territory
    cons = np.array([np.argmax(h.mat[1:], axis=1) for h in hmms],
                    dtype=object)
    for i, h in enumerate(hmms):
        row = np.argmax(h.mat[1: 1 + min(h.M, Lmax)], axis=1)
        codes[i, : len(row)] = row.astype(np.uint8)
        lengths[i] = len(row)
    dev = B.SeqDevice(codes, lengths)
    return aa, pb, dev, codes, lengths


def test_msv_pallas_matches_fallback(setup):
    aa, pb, dev, codes, lengths = setup
    from pyhmmer_tpu.ops.msv_pallas import (_msv_pallas, _strip_r,
                                            build_msv_tensors)
    t = build_msv_tensors(pb)
    Bt = 128                                   # force 2 lane tiles
    R = _strip_r(t["cost"].shape[1], Bt)
    dx, ovf, biaslog = _msv_pallas(dev.strips(R, Bt), t["cost"],
                                   dev.tjb_row, t["scal"],
                                   dev.tile_bounds(R, Bt), t["odds"],
                                   dev.p1_row, R, Bt)
    dx = np.asarray(dx)[:, : dev.B]
    ovf = np.asarray(ovf)[:, : dev.B]

    # the fused f32 bias-filter scores must sit far inside the engine's
    # length-scaled recheck margin (2e-3 + 1e-6 L nats) of the exact f64
    # host filter for every (profile, lane) pair
    from pyhmmer_tpu.ops import native
    biaslog = np.asarray(biaslog)[:, : dev.B].astype(np.float64)
    for pi in range(pb.P):
        exact = native.bias_filter_batch(
            pb.filter_odds[pi].astype(np.float64), codes, lengths)
        if exact is None:
            pytest.skip("native library unavailable")
        err = np.abs(biaslog[pi] - exact)
        margin = 2e-3 + 1e-6 * np.maximum(lengths, 1)
        assert (err < 0.25 * margin).all(), (pi, err.max())

    from pyhmmer_tpu.ops.batch import _msv_kernel
    dx2, ovf2 = _msv_kernel(
        dev.codes, dev.mask_f,
        *pb.device("msv_cost", "msv_bias", "msv_tec", "msv_tbm"),
        dev.tjb, pb.Kp)
    dx2 = np.asarray(dx2)
    ovf2 = np.asarray(ovf2)

    # quantized DP must agree exactly wherever neither flags overflow
    both_ok = (ovf == 0) & (ovf2 == 0)
    assert both_ok.sum() > 0.8 * both_ok.size
    np.testing.assert_array_equal(dx[both_ok], dx2[both_ok])
    # overflow flags agree (both computed pre-saturation)
    np.testing.assert_array_equal(ovf > 0, ovf2 > 0)


def test_msv_pallas_stacked_matches_flat(setup):
    """The profile-STACKED MSV kernel (grid (nBt,), [Pg, Mpk, Bt] state)
    must reproduce the flat kernel bit-for-bit: same quantized DP, same
    overflow flags, same fused bias-filter scores (same math, different
    schedule)."""
    aa, pb, dev, codes, lengths = setup
    from pyhmmer_tpu.ops.msv_pallas import (_msv_pallas, _msv_pallas2,
                                            _strip_r, build_msv_tensors,
                                            build_msv_tensors2)
    t = build_msv_tensors(pb)
    Bt = 128
    R = _strip_r(t["cost"].shape[1], Bt)
    dx, ovf, biaslog = _msv_pallas(dev.strips(R, Bt), t["cost"],
                                   dev.tjb_row, t["scal"],
                                   dev.tile_bounds(R, Bt), t["odds"],
                                   dev.p1_row, R, Bt)
    # row cap chosen to force >= 2 groups, covering the concatenation path
    Mpk = build_msv_tensors2(pb, 10 ** 9)["Mpk"]
    t2 = build_msv_tensors2(pb, max(Mpk, (pb.P // 2) * Mpk))
    assert len(t2["groups"]) >= 2
    parts = [_msv_pallas2(dev.strips(1, Bt), cost_flat, dev.tjb_row,
                          scal2, dev.tile_bounds(8, Bt), odds2,
                          dev.p1_row, Mpk, Bt=Bt)
             for (cost_flat, scal2, odds2) in t2["groups"]]
    dx2 = np.concatenate([np.asarray(p[0]) for p in parts], axis=0)
    ovf2 = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)
    bl2 = np.concatenate([np.asarray(p[2]) for p in parts], axis=0)
    np.testing.assert_array_equal(np.asarray(dx), dx2)
    np.testing.assert_array_equal(np.asarray(ovf) > 0, ovf2 > 0)
    # bias scores renormalize at different cadences (per strip vs per
    # 8-row block): identical up to f32 rounding
    np.testing.assert_allclose(np.asarray(biaslog), bl2,
                               rtol=0, atol=5e-4)


def test_forward_pallas_matches_fallback(setup):
    aa, pb, dev, codes, lengths = setup
    from pyhmmer_tpu.ops import fwd_pallas as FP
    from pyhmmer_tpu import engine as E

    Bp = dev.Bpad
    ridx = np.full(Bp, -1, dtype=np.int32)
    ridx[: dev.B] = np.arange(dev.B)
    t = FP.build_fwd_tensors2(pb)
    Bt = 128
    R = FP._strip_r_fwd(t["Mp"], Bt)
    strips, lens, lm, bnd = E._gather_survivors_strips(
        dev.codes_t, dev.lens_d, jnp.asarray(ridx), R, Bt)
    out = np.asarray(FP._fwd_pallas2(lens, strips, t["ems"], t["eis"],
                                     t["etr2"], t["sdd"], lm, bnd, R, Bt))

    from pyhmmer_tpu.ops.batch import _forward_kernel
    codes_g, mask, loop, move = E._gather_rows_dev(dev, jnp.asarray(ridx))
    xEj = np.float32(np.log(0.5))
    ref = np.asarray(_forward_kernel(
        codes_g, mask,
        *pb.device("msc", "isc", "tMM", "tIM", "tDM", "tMD", "tDD",
                   "tBM", "tMI", "tII", "kmask"),
        xEj, xEj, loop, move, pb.Kp))

    live = ref[:, : dev.B] > -1e29
    d = np.abs(out[:, : dev.B] - ref[:, : dev.B])[live]
    # odds-space f32 vs log-space fallback: agreement well inside the
    # engine's device-gate margin
    assert d.max() < 2e-2, d.max()


def test_forward_pallas_stacked_matches_v2(setup):
    """The profile-STACKED Forward kernel must agree with the v2
    per-profile kernel to f32 rounding (same odds-space math, same
    per-profile rescale cadence, different schedule)."""
    aa, pb, dev, codes, lengths = setup
    from pyhmmer_tpu.ops import fwd_pallas as FP
    from pyhmmer_tpu import engine as E

    Bp = dev.Bpad
    ridx = np.full(Bp, -1, dtype=np.int32)
    ridx[: dev.B] = np.arange(dev.B)
    t = FP.build_fwd_tensors2(pb)
    Bt = 128
    R = FP._strip_r_fwd(t["Mp"], Bt)
    strips, lens, lm, bnd = E._gather_survivors_strips(
        dev.codes_t, dev.lens_d, jnp.asarray(ridx), R, Bt)
    ref = np.asarray(FP._fwd_pallas2(lens, strips, t["ems"], t["eis"],
                                     t["etr2"], t["sdd"], lm, bnd, R,
                                     Bt))

    # stacked: row cap forcing >= 2 groups
    Mp = t["Mp"]
    t3 = FP.build_fwd_tensors3(pb, max(Mp, (pb.P // 2) * Mp))
    assert len(t3["groups"]) >= 2
    codes_t, lens1, lm1, bnd1 = E._gather_survivors_strips(
        dev.codes_t, dev.lens_d, jnp.asarray(ridx), 1, Bt)
    g_bnd = (bnd1 + 1) // 2
    parts = [np.asarray(FP._fwd_pallas3(lens1, codes_t, ems, eis, etr,
                                        sdd, lm1, g_bnd, Mp, Bt))
             for (ems, eis, etr, sdd) in t3["groups"]]
    out = np.concatenate(parts, axis=0)

    live = ref[:, : dev.B] > -1e29
    d = np.abs(out[:, : dev.B] - ref[:, : dev.B])[live]
    # f32 accumulation-order wobble only: absolute for ordinary scores
    # plus a relative term for the consensus-repeat giants (hundreds of
    # nats); both are far inside the engine's ~0.4-nat gate margin
    tol = 2e-2 + 2e-4 * np.abs(ref[:, : dev.B])[live]
    assert (d < tol).all(), (d - tol).max()


def test_viterbi_pallas_matches_fallback(setup):
    aa, pb, dev, codes, lengths = setup
    from pyhmmer_tpu.ops import vit_pallas as VP
    from pyhmmer_tpu import engine as E

    Bp = dev.Bpad
    ridx = np.full(Bp, -1, dtype=np.int32)
    ridx[: dev.B] = np.arange(dev.B)
    codes_t, lens, lm, bnd = E._gather_survivors(
        dev.codes_t, dev.lens_d, jnp.asarray(ridx), min(Bp, 256))
    t = VP.build_vit_tensors(pb)
    out = np.asarray(VP._vit_pallas(lens, codes_t, t["msc"], t["isc"],
                                    t["tr"], lm, bnd))

    from pyhmmer_tpu.ops.batch import _viterbi_kernel
    codes_g, mask, loop, move = E._gather_rows_dev(dev, jnp.asarray(ridx))
    xEj = np.float32(np.log(0.5))
    ref = np.asarray(_viterbi_kernel(
        codes_g, mask,
        *pb.device("msc", "isc", "tMM", "tIM", "tDM", "tMD", "tDD",
                   "tBM", "tMI", "tII", "kmask"),
        xEj, xEj, loop, move, pb.Kp))

    live = ref[:, : dev.B] > -1e29
    d = np.abs(out[:, : dev.B] - ref[:, : dev.B])[live]
    assert d.max() < 2e-2, d.max()
