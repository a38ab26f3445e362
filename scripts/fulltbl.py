import sys, os
sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
from pyhmmer_tpu.plan7 import HMMFile
from pyhmmer_tpu.easel import SequenceFile
from pyhmmer_tpu import hmmer
DATA = '/root/reference/src/pyhmmer/tests/data'

def parse_tbl(path):
    rows = {}
    order = []
    for line in open(path):
        if line.startswith('#'):
            continue
        c = line.split()
        rows.setdefault(c[2], []).append((c[0], float(c[4]), float(c[5]), float(c[6])))
        order.append((c[2], c[0]))
    return rows

def check(hmmpath, tblpath):
    with HMMFile(hmmpath) as f:
        hmms = list(f)
    with SequenceFile(DATA + '/seqs/938293.PRJEB85.HG003687.faa', digital=True) as f:
        targets = f.read_block()
    golden = parse_tbl(tblpath)
    results = list(hmmer.hmmsearch(hmms, targets))
    tot_g = tot_ok = tot_extra = tot_missing = 0
    for hmm, th in zip(hmms, results):
        qn = hmm.name.decode()
        g = golden.get(qn, [])
        mine = [(h.name.decode(), h.evalue, h.score, h.bias) for h in th.reported]
        gn = set(x[0] for x in g); mn = set(x[0] for x in mine)
        missing = gn - mn; extra = mn - gn
        tot_g += len(g); tot_missing += len(missing); tot_extra += len(extra)
        for gg in g:
            m = next((x for x in mine if x[0] == gg[0]), None)
            if m and abs(m[2]-gg[2]) <= 0.1 and abs(m[3]-gg[3]) <= 0.1:
                tot_ok += 1
        if missing or extra:
            print(f'  {qn}: missing={sorted(missing)} extra={sorted(extra)}')
    print(f'{os.path.basename(tblpath)}: golden={tot_g} score-match={tot_ok} missing={tot_missing} extra={tot_extra}')

check(DATA + '/hmms/txt/PF02826.hmm', DATA + '/tables/PF02826.tbl')
check(DATA + '/hmms/txt/RREFam.hmm', DATA + '/tables/RREFam.tbl')
