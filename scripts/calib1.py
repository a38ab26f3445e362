"""Stage 1: cache usc/vit/fwd for all MSV-pass candidates of the bench models."""
import sys, os
sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from pyhmmer_tpu.plan7 import HMMFile, Background
from pyhmmer_tpu.plan7.profile import Profile
from pyhmmer_tpu.plan7.pipeline import LOG2
from pyhmmer_tpu.plan7.evalues import gumbel_surv, exp_surv
from pyhmmer_tpu.easel import SequenceFile
from pyhmmer_tpu.ops import reference as refops
from pyhmmer_tpu.ops import batch as B

DATA = '/root/reference/src/pyhmmer/tests/data'
hmms = []
for name in ('PF02826', 'Thioesterase', 'KR', 'LuxC', 'RREFam'):
    with HMMFile(os.path.join(DATA, 'hmms', 'txt', name + '.hmm')) as f:
        hmms.extend(list(f))
with SequenceFile(DATA + '/seqs/938293.PRJEB85.HG003687.faa', digital=True) as f:
    targets = f.read_block()

bg = Background(hmms[0].alphabet)
fill = hmms[0].alphabet.nonresidue_code
lens = np.array([len(s) for s in targets])
Lmax = int(lens.max())
codes = np.full((len(targets), Lmax), fill, dtype=np.uint8)
for r, s in enumerate(targets):
    codes[r, :len(s)] = s.sequence

out = {}
for hmm in hmms:
    Mp = B.round_up(hmm.M, 128)
    prof = Profile(hmm.M, hmm.alphabet).configure(hmm, bg, 400, multihit=True)
    pb = B.ProfileBatch([prof] * 8, Mp=Mp)
    usc = B.msv_scores(pb, codes, lens)[0]          # [B] nats
    L = lens.astype(np.float64)
    nullsc = L * np.log(L / (L + 1.0)) + np.log(1.0 / (L + 1.0))
    ev = prof.evparam.astype(np.float64)
    P1 = gumbel_surv((usc - nullsc) / LOG2, ev[0], ev[1])
    cand = np.where(P1 <= 0.02)[0]
    print(hmm.name.decode(), 'candidates:', len(cand), flush=True)
    vit = np.empty(len(cand)); fwd = np.empty(len(cand))
    for j, ti in enumerate(cand):
        sq = targets[int(ti)]
        p = Profile(hmm.M, hmm.alphabet).configure(hmm, bg, len(sq), multihit=True)
        vit[j] = refops.viterbi_score(p, sq.sequence)
        fwd[j] = refops.forward(p, sq.sequence).score
    out[hmm.name.decode()] = dict(
        cand=cand, usc=usc[cand], nullsc=nullsc[cand], L=lens[cand],
        vit=vit, fwd=fwd, ev=ev, M=hmm.M,
        compo=np.asarray(prof.compo, dtype=np.float64))
np.savez('/tmp/calib_cache.npz',
         names=np.array(list(out.keys())),
         tnames=np.array([s.name.decode() for s in targets]),
         **{f'{k}::{kk}': vv for k, v in out.items() for kk, vv in v.items()})
print('saved')
