"""Differential tests: native wm_test_zdrop / wm_update_extra vs the
pure-Python oracles (both ports of reference src/align.c:47-89,240-286)."""
import numpy as np
import pytest

from winnowmap_tpu.map import align as A
from winnowmap_tpu.map.hit import Extra, Reg
from winnowmap_tpu.options import MapOptions


def _random_case(rng):
    n_ops = rng.integers(1, 20)
    cig = []
    qlen = tlen = 0
    for _ in range(n_ops):
        op = int(rng.choice([0, 0, 0, 1, 2]))
        ln = int(rng.integers(1, 30))
        cig.append(ln << 4 | op)
        if op == 0:
            qlen += ln
            tlen += ln
        elif op == 1:
            qlen += ln
        else:
            tlen += ln
    if not cig or (cig[0] & 0xF) != 0:
        cig.insert(0, 5 << 4)
        qlen += 5
        tlen += 5
    if (cig[-1] & 0xF) != 0:
        cig.append(5 << 4)
        qlen += 5
        tlen += 5
    cigar = np.array(cig, np.uint32)
    qseq = rng.integers(0, 5, qlen).astype(np.uint8)
    tseq = rng.integers(0, 5, tlen).astype(np.uint8)
    return cigar, qseq, tseq


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_zdrop_and_update_extra_match_python(seed):
    rng = np.random.default_rng(seed)
    opt = MapOptions()
    mat = A.gen_simple_mat(opt.a, opt.b, opt.sc_ambi)
    for it in range(100):
        cigar, qseq, tseq = _random_case(rng)
        assert A.test_zdrop(opt, qseq, tseq, cigar, mat) == A.test_zdrop_py(
            opt, qseq, tseq, cigar, mat
        )
        for is_eqx in (0, 1):
            regs = []
            for _ in range(2):
                r = Reg()
                r.p = Extra()
                r.p.cigar = cigar.copy()
                r.qs, r.qe, r.rs, r.re = 0, len(qseq), 0, len(tseq)
                r.rev = bool(it % 2)
                regs.append(r)
            A.update_extra(regs[0], qseq, tseq, mat, opt.q, opt.e, is_eqx)
            A.update_extra_py(regs[1], qseq, tseq, mat, opt.q, opt.e, is_eqx)
            for f in ("qs", "qe", "rs", "re", "blen", "mlen"):
                assert getattr(regs[0], f) == getattr(regs[1], f)
            assert regs[0].p.dp_max == regs[1].p.dp_max
            assert regs[0].p.n_ambi == regs[1].p.n_ambi
            assert np.array_equal(regs[0].p.cigar, regs[1].p.cigar)
