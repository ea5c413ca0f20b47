"""Engine chain exchange: anchor sets exported from the native engine's
threads onto the device chain kernel (chain/device.py) must leave mapping
output byte-identical to the host-chain engine run.  WM_DEV_CHAIN_MIN=1
forces every chain through the exchange; interpreter-mode Pallas covers
the DP jobs so the whole device scheduler path runs chip-free.
Subprocess-isolated (interpret mode + patched tile sizes)."""
import os
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["WM_PALLAS_INTERPRET"] = "1"
    os.environ["WM_DEV_CHAIN_MIN"] = "1"
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {tests!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import winnowmap_tpu.extend.pallas_kernel as PK
    PK.quantize_batch = lambda n: max(32, -(-n // 32) * 32)
    PK.extd_rows = lambda Wb: 4
    import winnowmap_tpu.map.batch as B
    import winnowmap_tpu.map.engine as E
    E.MIN_DEV_BATCH = B.MIN_DEV_BATCH = 4
    E.MIN_MERGED_BATCH = B.MIN_MERGED_BATCH = 1

    from winnowmap_tpu.index.build import build_index
    from winnowmap_tpu.options import (IndexOptions, MapOptions, MM_F_CIGAR,
                                       update_mid_occ)
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 15000)
    gstr = bytes(bytearray(b"ACGT"[int(c)] for c in genome))
    rec = [type("R", (), {{"name": "chr1", "seq": gstr,
                           "comment": None}})()]
    io_, mo = IndexOptions(), MapOptions()
    mo.flag |= MM_F_CIGAR
    mi = build_index(rec, io_.w, io_.k, io_.flag, np.zeros(0, np.uint64))
    update_mid_occ(mo, mi)
    reads, names = [], []
    ACGT = b"ACGT"
    for i in range(4):
        s = int(rng.integers(0, 10000))
        L = int(rng.integers(1200, 2500))
        sub = bytearray(gstr[s:s + L])
        for _ in range(L // 25):
            p = int(rng.integers(0, L))
            sub[p] = ACGT[int(rng.integers(0, 4))]
        reads.append(bytes(sub))
        names.append(f"r{{i}}")

    from winnowmap_tpu.map.engine import map_batch_engine
    from winnowmap_tpu.map.batch import STATS
    from test_engine import _reg_key
    dev = map_batch_engine(mi, mo, reads, names)
    n_chain = STATS.get("chain_dev_jobs", 0)
    os.environ["WM_NO_TPU"] = "1"
    host = map_batch_engine(mi, mo, reads, names)
    for i, (a, b_) in enumerate(zip(host, dev)):
        assert [_reg_key(r) for r in a.regs] == \\
            [_reg_key(r) for r in b_.regs], f"read {{i}}"
    assert n_chain > 0, "chain exchange never fired"
    print("CHAIN-EXCHANGE-OK", n_chain)
""")


def test_engine_chain_exchange_byte_equal():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("WM_NO_TPU", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         SCRIPT.format(repo=str(REPO), tests=str(REPO / "tests"))],
        capture_output=True, text=True, timeout=2300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CHAIN-EXCHANGE-OK" in proc.stdout
