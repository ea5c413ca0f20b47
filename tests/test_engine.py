"""Native C++ map engine differentials: the engine (wm_engine.cpp +
map/engine.py) must produce byte-identical results to the parity-tested
Python path (map/frag.map_one) on every corpus, host path and device path.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
GOLD = REPO / "tests" / "data" / "golden"


def _reg_key(r):
    return (r.id, r.cnt, r.rid, r.score, r.qs, r.qe, r.rs, r.re, r.parent,
            r.subsc, r.mlen, r.blen, r.n_sub, r.score0, r.mapq, r.inv, r.rev,
            r.split, r.sam_pri, r.hash, r.div,
            None if r.p is None else (r.p.dp_score, r.p.dp_max, r.p.dp_max2,
                                      r.p.n_ambi, r.p.trans_strand,
                                      tuple(r.p.cigar.tolist())))


def _build_golden_setup(sv_aware=True, hpc=False):
    from winnowmap_tpu.index.build import build_index, load_weight_set
    from winnowmap_tpu.io.fastx import read_all
    from winnowmap_tpu.options import (IndexOptions, MapOptions, MM_F_CIGAR,
                                       MM_F_OUT_SAM, set_preset,
                                       update_mid_occ)

    io_, mo = IndexOptions(), MapOptions()
    if hpc:
        set_preset("map-pb", io_, mo)
    mo.flag |= MM_F_CIGAR | MM_F_OUT_SAM
    mo.sv_aware = sv_aware
    wset = load_weight_set(str(GOLD / "t_rep_k15.txt"), io_.k)
    mi = build_index(read_all(str(GOLD / "t_ref.fa")), io_.w, io_.k,
                     io_.flag, wset)
    update_mid_occ(mo, mi)
    reads = read_all(str(GOLD / "t_reads.fa"))
    return mi, mo, [r.seq for r in reads], [r.name for r in reads]


def _assert_equal(py_results, eng_results, names):
    assert len(py_results) == len(eng_results)
    for i, (a, b) in enumerate(zip(py_results, eng_results)):
        ka = [_reg_key(r) for r in a.regs]
        kb = [_reg_key(r) for r in b.regs]
        assert ka == kb, f"regs mismatch on read {i} ({names[i]})"
        assert (a.rep_len, a.frag_gap, a.rep_len_defined) == \
            (b.rep_len, b.frag_gap, b.rep_len_defined), \
            f"meta mismatch on read {i} ({names[i]})"


@pytest.mark.parametrize("sv_aware", [True, False])
def test_engine_matches_python_host(sv_aware, monkeypatch):
    """Engine vs map_one on the golden corpus, host kernels only.

    The div field differs by design: the engine skips est_err because it
    only ever populates trial regs that are discarded (frag.py note), and
    map_one's vanilla/stage2 passes skip it too -- so div is -1.0 on both
    sides for every surviving reg; the key includes it to prove that.
    """
    monkeypatch.setenv("WM_NO_TPU", "1")
    from winnowmap_tpu.map.engine import map_batch_engine
    from winnowmap_tpu.map.frag import map_one

    mi, mo, seqs, names = _build_golden_setup(sv_aware=sv_aware)
    py = [map_one(mi, mo, s, n) for s, n in zip(seqs, names)]
    eng = map_batch_engine(mi, mo, seqs, names)
    _assert_equal(py, eng, names)


def test_engine_matches_python_hpc(monkeypatch):
    """map-pb preset (HPC sketching + adjust_minier walks)."""
    monkeypatch.setenv("WM_NO_TPU", "1")
    from winnowmap_tpu.map.engine import map_batch_engine
    from winnowmap_tpu.map.frag import map_one

    mi, mo, seqs, names = _build_golden_setup(hpc=True)
    py = [map_one(mi, mo, s, n) for s, n in zip(seqs, names)]
    eng = map_batch_engine(mi, mo, seqs, names)
    _assert_equal(py, eng, names)


def test_engine_matches_python_splice(monkeypatch):
    """-x splice preset through the engine (exts host kernels, two-strand
    trials, fix_bad_ends_splice) vs the parity-tested Python path."""
    monkeypatch.setenv("WM_NO_TPU", "1")
    from winnowmap_tpu.index.build import build_index, load_weight_set
    from winnowmap_tpu.io.fastx import read_all
    from winnowmap_tpu.map.engine import map_batch_engine
    from winnowmap_tpu.map.frag import map_one
    from winnowmap_tpu.options import (IndexOptions, MapOptions, MM_F_CIGAR,
                                       MM_F_OUT_SAM, set_preset,
                                       update_mid_occ)

    io_, mo = IndexOptions(), MapOptions()
    set_preset("splice", io_, mo)
    mo.flag |= MM_F_CIGAR | MM_F_OUT_SAM
    wset = load_weight_set(str(GOLD / "s_rep_k15.txt"), io_.k)
    mi = build_index(read_all(str(GOLD / "s_ref.fa")), io_.w, io_.k,
                     io_.flag, wset)
    update_mid_occ(mo, mi)
    reads = read_all(str(GOLD / "s_reads.fa"))
    seqs = [r.seq for r in reads]
    names = [r.name for r in reads]
    py = [map_one(mi, mo, s, n) for s, n in zip(seqs, names)]
    eng = map_batch_engine(mi, mo, seqs, names)
    _assert_equal(py, eng, names)


def test_engine_device_matches_host():
    """Engine with the TPU scheduler == engine with host kernels (and both
    == the Python path by the tests above).  Runs in a subprocess so the
    JAX device runtime does not leak into other tests."""
    code = r"""
import sys
sys.path.insert(0, %r)
sys.path.insert(0, %r)
from test_engine import _build_golden_setup, _assert_equal
import winnowmap_tpu
winnowmap_tpu.enable_compile_cache()
from winnowmap_tpu.map.engine import map_batch_engine
mi, mo, seqs, names = _build_golden_setup()
dev = map_batch_engine(mi, mo, seqs, names)
import os
os.environ["WM_NO_TPU"] = "1"
host = map_batch_engine(mi, mo, seqs, names)
_assert_equal(host, dev, names)
print("ENGINE-DEVICE-OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", code % (str(REPO), str(REPO / "tests"))],
        capture_output=True, text=True, timeout=1200)
    assert "ENGINE-DEVICE-OK" in r.stdout, r.stdout + r.stderr
