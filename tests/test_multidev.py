"""Multi-device production driver: a read batch sharded over a local
device mesh, each shard driven through its own native engine + Pallas
scheduler (parallel/multidev.py), must byte-match the single-device engine
run.  Runs on the CPU mesh with interpreter-mode Pallas (chip-free); on a
real TPU fleet the same code runs the compiled kernels per chip.
Subprocess-isolated: interpret mode + patched tile sizes must not leak
into other tests' compiled-call caches.
"""
import os
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = textwrap.dedent("""
    import os, sys, time
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    os.environ["WM_PALLAS_INTERPRET"] = "1"
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

    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, 12000)
    gstr = bytes(bytearray(b"ACGT"[int(c)] for c in genome))
    rec = [type("R", (), {{"name": "chr1", "seq": gstr, "comment": None}})()]
    io_, mo = IndexOptions(), MapOptions()
    mo.flag |= MM_F_CIGAR
    mi = build_index(rec, io_.w, io_.k, io_.flag, np.zeros(0, np.uint64))
    update_mid_occ(mo, mi)
    reads, names = [], []
    ACGT = b"ACGT"
    for i in range(4):
        s = int(rng.integers(0, 8000))
        L = int(rng.integers(1500, 3000))
        sub = bytearray(gstr[s:s + L])
        for _ in range(L // 25):
            p = int(rng.integers(0, L))
            sub[p] = ACGT[int(rng.integers(0, 4))]
        reads.append(bytes(sub))
        names.append(f"r{{i}}")

    from winnowmap_tpu.map.engine import map_batch_engine
    from winnowmap_tpu.parallel.multidev import map_batch_multidev
    from test_engine import _reg_key

    single = map_batch_engine(mi, mo, reads, names, device=jax.devices()[0])
    multi = map_batch_multidev(mi, mo, reads, names,
                               devices=jax.devices()[:2])
    for i, (a, b_) in enumerate(zip(single, multi)):
        assert [_reg_key(r) for r in a.regs] == \
            [_reg_key(r) for r in b_.regs], f"mismatch read {{i}}"
    print("MULTIDEV-OK")
""")


def test_multidev_engine_byte_equal_cpu_mesh():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("WM_NO_TPU", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         SCRIPT.format(repo=str(REPO), tests=str(REPO / "tests"))],
        capture_output=True, text=True, timeout=2300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "MULTIDEV-OK" in proc.stdout


KCOUNT_SCRIPT = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import winnowmap_tpu.kcount.device as KD
    import winnowmap_tpu.parallel.kcount as PKC
    KD.BLOCK = PKC.BLOCK = 1 << 12  # many small blocks -> all 4 devices used

    rng = np.random.default_rng(9)
    recs = []
    for i in range(5):
        g = rng.integers(0, 4, int(rng.integers(3000, 9000)))
        s = bytes(bytearray(b"ACGT"[int(c)] for c in g))
        recs.append(type("R", (), {{"name": f"c{{i}}", "seq": s,
                                    "comment": None}})())

    from winnowmap_tpu.kcount import count_kmers
    from winnowmap_tpu.parallel.kcount import count_kmers_multidev

    host = count_kmers(recs, 15)
    for direction in ("canonical", "forward", "reverse"):
        h = count_kmers(recs, 15, direction=direction)
        m = count_kmers_multidev(recs, 15, direction=direction,
                                 devices=jax.devices()[:4])
        assert np.array_equal(h.kmers, m.kmers), direction
        assert np.array_equal(h.counts, m.counts), direction
    print("MULTIDEV-KCOUNT-OK", len(host.kmers))
""")


def test_multidev_kcount_parity():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("WM_NO_TPU", None)
    proc = subprocess.run(
        [sys.executable, "-c", KCOUNT_SCRIPT.format(repo=str(REPO))],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "MULTIDEV-KCOUNT-OK" in proc.stdout
