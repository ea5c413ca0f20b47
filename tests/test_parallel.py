"""Multi-process data-parallel mapping: strided shards + rank merge must
reproduce the single-process per-read output in input order (reference
merge semantics: --split-prefix merge, src/map.c:1278-1321)."""
import io as _io

import numpy as np

from winnowmap_tpu.index.build import build_index, load_weight_set
from winnowmap_tpu.io import paf as pafmod
from winnowmap_tpu.io.fastx import read_all
from winnowmap_tpu.map.frag import map_one
from winnowmap_tpu.options import (IndexOptions, MapOptions, MM_F_CIGAR,
                                   update_mid_occ)
from winnowmap_tpu.parallel import (global_occ_quantile, map_file_sharded,
                                    merge_parts, shard_reads)


def test_shard_reads_partition():
    n, p = 103, 4
    shards = [shard_reads(n, i, p) for i in range(p)]
    allidx = np.sort(np.concatenate(shards))
    assert np.array_equal(allidx, np.arange(n))


def test_sharded_map_merge_matches_single(golden_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("WM_NO_TPU", "1")
    io, mo = IndexOptions(), MapOptions()
    mo.flag |= MM_F_CIGAR
    wset = load_weight_set(str(golden_dir / "t_rep_k15.txt"), io.k)
    mi = build_index(read_all(str(golden_dir / "t_ref.fa")), io.w, io.k,
                     io.flag, wset)
    update_mid_occ(mo, mi)

    reads_fa = str(golden_dir / "t_reads.fa")
    records = read_all(reads_fa)[:8]
    sub_fa = tmp_path / "sub.fa"
    with open(sub_fa, "w") as f:
        for r in records:
            f.write(f">{r.name}\n{r.seq.decode()}\n")

    parts = []
    n_proc = 3
    for pid in range(n_proc):
        part = tmp_path / f"part{pid}"
        map_file_sharded(mi, mo, str(sub_fa), str(part), pid, n_proc,
                         batched=True)  # WM_NO_TPU=1 -> host kernels
        parts.append(str(part))
    merged = _io.StringIO()
    merge_parts(merged, parts)

    expect = []
    for rec in records:
        res = map_one(mi, mo, rec.seq, rec.name)
        for r in res.regs:
            expect.append(pafmod.write_paf(mi, rec.name, len(rec.seq), r,
                                           mo.flag, res.rep_len, rec.comment,
                                           False))
    assert merged.getvalue().splitlines() == expect


def test_global_occ_quantile_matches_local(golden_dir):
    io = IndexOptions()
    wset = load_weight_set(str(golden_dir / "t_rep_k15.txt"), io.k)
    mi = build_index(read_all(str(golden_dir / "t_ref.fa")), io.w, io.k,
                     io.flag, wset)
    for f in (0.0002, 0.01, 0.5):
        assert global_occ_quantile(mi, f) == mi.cal_max_occ(f)


def test_global_occ_quantile_psum_mesh(golden_dir):
    """Sharded-index quantile over an 8-device CPU mesh: psum of per-shard
    histograms must reproduce the whole-index quantile."""
    import jax
    import jax.numpy as jnp

    io = IndexOptions()
    wset = load_weight_set(str(golden_dir / "t_rep_k15.txt"), io.k)
    mi = build_index(read_all(str(golden_dir / "t_ref.fa")), io.w, io.k,
                     io.flag, wset)
    cnt = np.diff(mi.start).astype(np.int64)
    n_dev = len(jax.devices())
    MAXC = 1 << 12
    shard_hists = np.zeros((n_dev, MAXC), np.int64)
    for d in range(n_dev):
        local = cnt[d::n_dev]  # bucket-sharded index emulation
        shard_hists[d] = np.bincount(np.minimum(local, MAXC - 1),
                                     minlength=MAXC)

    def f(h):
        return jax.lax.psum(h, "i")

    summed = jax.pmap(f, axis_name="i")(jnp.asarray(shard_hists))
    hist = np.asarray(summed[0])
    n = int(hist.sum())
    ff = 0.0002
    kk = min(max(int((1.0 - ff) * n), 0), n - 1)
    v = int(np.searchsorted(np.cumsum(hist), kk + 1)) + 1
    assert v == mi.cal_max_occ(ff)
