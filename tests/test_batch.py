"""Batched mapping driver parity: map_batch must be byte-identical to the
per-read sequential path (reference mm_map semantics, src/map.c:279-981).

Two layers:
- in-process (CPU): scheduler/generator plumbing with host kernels
  (WM_NO_TPU=1), cheap and always run;
- subprocess (real TPU): full device path (Pallas DP + traceback), skipped
  when no TPU is reachable.
"""
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _paf_lines(mi, mo, rec, res):
    from winnowmap_tpu.io import paf as pafmod

    return [
        pafmod.write_paf(mi, rec.name, len(rec.seq), r, mo.flag, res.rep_len,
                         rec.comment, False)
        for r in res.regs
    ]


def test_batch_scheduler_parity_host(golden_dir, monkeypatch):
    monkeypatch.setenv("WM_NO_TPU", "1")
    from winnowmap_tpu.index.build import build_index, load_weight_set
    from winnowmap_tpu.io.fastx import read_all
    from winnowmap_tpu.map.batch import map_batch
    from winnowmap_tpu.map.frag import map_one
    from winnowmap_tpu.options import (IndexOptions, MapOptions, MM_F_CIGAR,
                                       update_mid_occ)

    io, mo = IndexOptions(), MapOptions()
    mo.flag |= MM_F_CIGAR
    wset = load_weight_set(str(golden_dir / "t_rep_k15.txt"), io.k)
    mi = build_index(read_all(str(golden_dir / "t_ref.fa")), io.w, io.k,
                     io.flag, wset)
    update_mid_occ(mo, mi)
    batch = read_all(str(golden_dir / "t_reads.fa"))[:6]
    seq_res = [map_one(mi, mo, r.seq, r.name) for r in batch]
    bat_res = map_batch(mi, mo, [r.seq for r in batch],
                        [r.name for r in batch])
    for rec, a, b in zip(batch, seq_res, bat_res):
        assert _paf_lines(mi, mo, rec, a) == _paf_lines(mi, mo, rec, b)


TPU_SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import winnowmap_tpu
    winnowmap_tpu.enable_compile_cache()
    from winnowmap_tpu.index.build import build_index, load_weight_set
    from winnowmap_tpu.io.fastx import read_all
    from winnowmap_tpu.map.batch import map_batch
    from winnowmap_tpu.map.frag import map_one
    from winnowmap_tpu.io import paf as pafmod
    from winnowmap_tpu.options import (IndexOptions, MapOptions, MM_F_CIGAR,
                                       update_mid_occ)

    from winnowmap_tpu.options import set_preset

    G = {golden!r}

    def run_one(preset):
        io, mo = IndexOptions(), MapOptions()
        if preset:
            set_preset(preset, io, mo)
            io.k, io.w = 15, 50  # match the committed weight list
        mo.flag |= MM_F_CIGAR
        wset = load_weight_set(G + "/t_rep_k15.txt", io.k)
        mi = build_index(read_all(G + "/t_ref.fa"), io.w, io.k, io.flag,
                         wset)
        update_mid_occ(mo, mi)
        batch = read_all(G + "/t_reads.fa")[:6]

        def lines(rec, res):
            return [pafmod.write_paf(mi, rec.name, len(rec.seq), r, mo.flag,
                                     res.rep_len, rec.comment, False)
                    for r in res.regs]

        seq_res = [map_one(mi, mo, r.seq, r.name) for r in batch]
        bat_res = map_batch(mi, mo, [r.seq for r in batch],
                            [r.name for r in batch])
        for rec, a, b in zip(batch, seq_res, bat_res):
            assert lines(rec, a) == lines(rec, b), (preset, rec.name)

    run_one(None)       # map-ont defaults: extd device kernels
    run_one("asm20")    # single gap cost: extz device kernels
    print("TPU-BATCH-PARITY-OK")
""")


@pytest.mark.skipif(os.environ.get("WM_SKIP_TPU_TESTS") == "1",
                    reason="TPU tests disabled")
def test_batch_device_parity_tpu(golden_dir):
    from conftest import tpu_alive
    if not tpu_alive():
        pytest.skip("no TPU available (tunnel down or init timeout)")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         TPU_SCRIPT.format(repo=str(REPO), golden=str(golden_dir))],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    if proc.returncode != 0 and "No TPU" in proc.stderr:
        pytest.skip("no TPU available")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "TPU-BATCH-PARITY-OK" in proc.stdout
