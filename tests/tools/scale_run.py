#!/usr/bin/env python3
"""Genome-scale validation run (VERDICT r2 item 6): build and map against a
>= 1 Gbp synthetic genome, with the memory-bounded k-mer counting path, and
(optionally) a sorted-PAF differential vs the reference binary.

Usage:
  python tests/tools/scale_run.py --gbp 1.0 --n-reads 200 \
      [--oracle /tmp/refbuild/bin/winnowmap] [--workdir /tmp/wm_scale]

Prints a summary table (counting time, index build time, mapping time,
peak RSS, differential result) for STATUS.md.
"""
import argparse
import os
import resource
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def log(msg):
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[scale {time.strftime('%H:%M:%S')} rss={rss:.1f}G] {msg}",
          flush=True)


def make_corpus(workdir: Path, gbp: float, n_reads: int, read_len: int,
                seed: int):
    """Numpy-vectorized corpus generator (make_testdata.py semantics are
    per-base Python -- too slow at Gbp scale)."""
    ref = workdir / "scale_ref.fa"
    reads = workdir / "scale_reads.fa"
    if ref.exists() and reads.exists():
        log("corpus present, reusing")
        return ref, reads
    rng = np.random.default_rng(seed)
    n = int(gbp * 1e9)
    n_chrom = max(1, n // 250_000_000)
    per = n // n_chrom
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    log(f"generating {n/1e9:.2f} Gbp genome ({n_chrom} chroms)")
    chroms = []
    with open(ref, "w") as f:
        for c in range(n_chrom):
            g = rng.integers(0, 4, per).astype(np.uint8)
            # tandem-repeat arrays to exercise the down-weighting
            for _ in range(8):
                unit = rng.integers(0, 4, 400).astype(np.uint8)
                arr = np.tile(unit, 50)
                p = int(rng.integers(0, per - len(arr)))
                g[p:p + len(arr)] = arr
            s = ACGT[g].tobytes()
            chroms.append(s)
            f.write(f">chr{c + 1}\n")
            for o in range(0, len(s), 80):
                f.write(s[o:o + 80].decode() + "\n")
            log(f"chr{c + 1} written ({per/1e6:.0f} Mbp)")
    log("sampling reads")
    with open(reads, "w") as f:
        for i in range(n_reads):
            c = int(rng.integers(0, n_chrom))
            L = int(read_len + rng.integers(-read_len // 3, read_len // 3))
            p = int(rng.integers(0, per - L))
            sub = np.frombuffer(chroms[c][p:p + L], np.uint8).copy()
            code = np.zeros(len(sub), np.uint8)
            for b, v in zip(b"ACGT", range(4)):
                code[sub == b] = v
            m = rng.random(L) < 0.08
            code[m] = (code[m] + rng.integers(1, 4, int(m.sum()))) % 4
            rc = bool(rng.integers(0, 2))
            if rc:
                code = 3 - code[::-1]
            f.write(f">read{i}_chr{c+1}_{p}_{'-' if rc else '+'}\n")
            f.write(ACGT[code].tobytes().decode() + "\n")
    return ref, reads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbp", type=float, default=1.0)
    ap.add_argument("--n-reads", type=int, default=200)
    ap.add_argument("--read-len", type=int, default=15000)
    ap.add_argument("--workdir", default="/tmp/wm_scale")
    ap.add_argument("--oracle", default="/tmp/refbuild/bin/winnowmap")
    ap.add_argument("--mem-gb", type=float, default=24.0,
                    help="counting memory bound")
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()
    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    summary = {}

    ref, reads = make_corpus(wd, args.gbp, args.n_reads, args.read_len,
                             args.seed)

    # ---- k-mer counting, memory-bounded (merylOp-count.C:577-644
    # semantics: sorted-run spill + merge) --------------------------------
    rep = wd / "scale_rep.txt"
    if not rep.exists():
        from winnowmap_tpu.io.fastx import read_all
        from winnowmap_tpu.kcount import count_kmers

        t0 = time.time()
        log("counting k-mers (memory-bounded)")
        kc = count_kmers(read_all(str(ref)), 15,
                         max_memory_bytes=int(args.mem_gb * 1e9))
        thr = kc.threshold_distinct(0.9998)
        with open(rep, "w") as f:
            for line in kc.greater_than(thr).print_lines():
                f.write(line + "\n")
        summary["count_s"] = round(time.time() - t0, 1)
        log(f"counting done in {summary['count_s']}s, threshold {thr}")
        del kc

    # ---- index build ----------------------------------------------------
    from winnowmap_tpu.index.build import build_index, load_weight_set
    from winnowmap_tpu.io.fastx import read_all
    from winnowmap_tpu.options import (IndexOptions, MapOptions, MM_F_CIGAR,
                                       MM_F_OUT_CG, update_mid_occ)

    io_, mo = IndexOptions(), MapOptions()
    mo.flag |= MM_F_CIGAR | MM_F_OUT_CG  # like the CLI's -c
    t0 = time.time()
    wset = load_weight_set(str(rep), io_.k)
    records = read_all(str(ref))
    mi = build_index(records, io_.w, io_.k, io_.flag, wset)
    update_mid_occ(mo, mi)
    summary["index_s"] = round(time.time() - t0, 1)
    summary["n_minimizers"] = int(mi.pos.shape[0])
    log(f"index built in {summary['index_s']}s "
        f"({summary['n_minimizers']/1e6:.1f} M minimizers)")

    # ---- mapping ---------------------------------------------------------
    from winnowmap_tpu.map.batch import map_batch

    rd = read_all(str(reads))
    t0 = time.time()
    results = map_batch(mi, mo, [r.seq for r in rd], [r.name for r in rd])
    summary["map_s"] = round(time.time() - t0, 1)
    summary["reads_per_s"] = round(len(rd) / summary["map_s"], 2)
    ours = wd / "scale_ours.paf"
    from winnowmap_tpu.map.pipeline import _write_read

    with open(ours, "w") as f:
        for rec, res in zip(rd, results):
            _write_read(mi, mo, rec, res, f)
    log(f"mapped {len(rd)} reads in {summary['map_s']}s")

    # ---- differential vs the reference binary ---------------------------
    ref_out = wd / "scale_ref.paf"
    if os.path.exists(args.oracle) or ref_out.exists():
        if not ref_out.exists():
            t0 = time.time()
            log("running reference oracle")
            with open(ref_out, "w") as f:
                subprocess.run(
                    [args.oracle, "-t", "1", "-c", "-W", str(rep), str(ref),
                     str(reads)], stdout=f, stderr=subprocess.DEVNULL,
                    check=True, timeout=14400)
            summary["oracle_s"] = round(time.time() - t0, 1)
        a = sorted(open(ours).read().splitlines())
        b = sorted(open(ref_out).read().splitlines())
        same = sum(1 for x, y in zip(a, b) if x == y)
        summary["paf_lines_ours"] = len(a)
        summary["paf_lines_ref"] = len(b)
        summary["paf_lines_equal"] = same

        # alignment-field differential: the documented exact-set-vs-bloom
        # design difference moves the chain-statistic tags (cm/s1) and the
        # reference's uninitialized rl on every read at this scale; the
        # alignment itself (coords, CIGAR, NM, AS, MAPQ) must match.
        def _norm(lines):
            drop = ("cm", "s1", "s2", "rl")
            out = []
            for ln in lines:
                f = ln.split("\t")
                out.append("\t".join(
                    f[:12] + [t for t in f[12:]
                              if t.split(":")[0] not in drop]))
            return sorted(out)

        an, bn = _norm(a), _norm(b)
        same_aln = sum(1 for x, y in zip(an, bn) if x == y)
        summary["paf_alnfields_equal"] = same_aln
        log(f"differential: {same}/{max(len(a), len(b))} identical lines; "
            f"{same_aln} identical in all alignment fields")

    summary["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    print("SCALE-SUMMARY " + " ".join(f"{k}={v}" for k, v in
                                      sorted(summary.items())))


if __name__ == "__main__":
    main()
