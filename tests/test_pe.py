"""Paired-end / fragment-mode tests (reference src/pe.c, mm_seg_gen
hit.c:373-435, frag reading bseq.c:131-158, paired SAM format.c:391-556).

The stock reference binary asserts n_segs == 1 (map.c:291-292), so the
oracle differential (test_pe_golden_byte_parity) uses a binary patched only
to generalize that assert and to skip the longest-first reshuffle in frag
mode (the reshuffle separates pair mates before the qname-adjacency
grouping) — see tests/tools/NOTES for the exact patch and the generation
command.  golden_pe.sam + the pe_* corpus are committed.  The invariant
tests below need no oracle."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _pe_corpus(tmp_path, n_pairs=30, frag_len=400, rd_len=150, seed=42):
    rng = np.random.default_rng(seed)
    ACGT = b"ACGT"
    genome = bytes(bytearray(ACGT[c] for c in rng.integers(0, 4, 60000)))
    reads1, reads2 = [], []
    for i in range(n_pairs):
        s = int(rng.integers(0, len(genome) - frag_len - 100))
        frag = bytearray(genome[s:s + frag_len])
        for _ in range(6):
            frag[int(rng.integers(0, frag_len))] = ACGT[int(
                rng.integers(0, 4))]
        reads1.append((f"pair{i}/1", bytes(frag[:rd_len])))
        reads2.append((f"pair{i}/2", bytes(frag[frag_len - rd_len:])))
    ref = tmp_path / "pe_ref.fa"
    ref.write_text(">chr1\n" + genome.decode() + "\n")
    files = []
    for fn, rr in (("pe_1.fq", reads1), ("pe_2.fq", reads2)):
        p = tmp_path / fn
        with open(p, "w") as f:
            for n, s in rr:
                f.write(f"@{n}\n{s.decode()}\n+\n{'I' * len(s)}\n")
        files.append(p)
    rep = tmp_path / "pe_rep.txt"
    rep.write_text("ACGTACGTACGTACG\t100\n")
    return ref, files, rep, n_pairs


def _run_cli(args):
    from winnowmap_tpu.cli import main

    return main(args)


def _parse_sam(path):
    recs = []
    for line in open(path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        recs.append((f[0], int(f[1]), f[2], int(f[3]), int(f[4]), f[5],
                     f[6], int(f[7]), int(f[8])))
    return recs


def test_pe_golden_byte_parity(tmp_path):
    """Full paired SAM byte-parity against the patched reference oracle
    (reference src/pe.c mm_pair, src/hit.c mm_seg_gen, src/format.c:391-556
    paired fields).  Oracle: `winnowmap -a --frag yes -W pe_rep.txt
    pe_ref.fa pe_1.fq pe_2.fq` with the two NOTES patches; our CLI enters
    the same paired pipeline for two query files."""
    gold = REPO / "tests" / "data" / "golden"
    out = tmp_path / "pe_parity.sam"
    rc = _run_cli(["-a", "-W", str(gold / "pe_rep.txt"), "-o", str(out),
                   str(gold / "pe_ref.fa"), str(gold / "pe_1.fq"),
                   str(gold / "pe_2.fq")])
    assert rc == 0
    ours = [ln for ln in out.read_text().splitlines()
            if not ln.startswith("@PG")]
    want = [ln for ln in (gold / "golden_pe.sam").read_text().splitlines()
            if not ln.startswith("@PG")]
    assert ours == want


def test_pe_two_files_sam_invariants(tmp_path):
    ref, files, rep, n_pairs = _pe_corpus(tmp_path)
    out = tmp_path / "pe.sam"
    rc = _run_cli(["-a", "-W", str(rep), "-o", str(out), str(ref),
                   str(files[0]), str(files[1])])
    assert rc == 0
    recs = _parse_sam(out)
    by_name = {}
    for r in recs:
        if not (r[1] & 0x900):  # primary lines only
            by_name.setdefault(r[0], []).append(r)
    assert len(by_name) == n_pairs
    n_proper = 0
    for name, pair in by_name.items():
        assert not name.endswith("/1") and not name.endswith("/2"), \
            "qname must be stem-trimmed in paired mode"
        assert len(pair) == 2
        a = next(r for r in pair if r[1] & 0x40)
        b = next(r for r in pair if r[1] & 0x80)
        for r in (a, b):
            assert r[1] & 0x1  # paired flag
        if (a[1] & 0x2) and not (a[1] & 0x4) and not (b[1] & 0x4):
            n_proper += 1
            # mate fields point at each other
            assert a[6] == "=" and b[6] == "="
            assert a[7] == b[3] and b[7] == a[3]
            assert a[8] == -b[8] and a[8] != 0
    assert n_proper >= n_pairs * 0.9  # error-free-ish corpus pairs properly


def test_pe_single_file_frag_flag(tmp_path):
    """--frag yes groups adjacent same-stem reads from ONE interleaved
    file (reference MM_F_FRAG_MODE, map.c:1114,1155)."""
    ref, files, rep, n_pairs = _pe_corpus(tmp_path)
    inter = tmp_path / "pe_inter.fq"
    with open(inter, "w") as f:
        l1 = open(files[0]).read().splitlines()
        l2 = open(files[1]).read().splitlines()
        for i in range(0, len(l1), 4):
            f.write("\n".join(l1[i:i + 4]) + "\n")
            f.write("\n".join(l2[i:i + 4]) + "\n")
    out1 = tmp_path / "two.sam"
    out2 = tmp_path / "inter.sam"
    assert _run_cli(["-a", "-W", str(rep), "-o", str(out1), str(ref),
                     str(files[0]), str(files[1])]) == 0
    assert _run_cli(["-a", "--frag", "yes", "-W", str(rep), "-o",
                     str(out2), str(ref), str(inter)]) == 0
    body1 = [ln for ln in open(out1) if not ln.startswith("@")]
    body2 = [ln for ln in open(out2) if not ln.startswith("@")]
    assert body1 == body2


def test_pair_mapq_blend_and_thru():
    """mm_pair MAPQ blend + pe_thru unit semantics (pe.c:139-171,46-63)."""
    from winnowmap_tpu.map.hit import Extra, Reg
    from winnowmap_tpu.map.pe import pair, set_pe_thru

    def mk(i, rid, rs, re_, rev, dp, mapq, qs=0, qe=100):
        r = Reg(id=i, parent=i, rid=rid, rs=rs, re=re_, rev=rev, mapq=mapq,
                qs=qs, qe=qe, hash=i * 7 + 1, sam_pri=True)
        r.p = Extra(dp_max=dp)
        return r

    r0 = mk(0, 0, 1000, 1100, False, 200, 10)
    r1 = mk(0, 0, 1300, 1400, False, 200, 50)  # FF pair (s^rev: 0 then 1)
    regs = [[r0], [r1]]
    pair(5000, 33, 8, 2, [100, 100], regs)
    assert r0.proper_frag and r1.proper_frag
    assert r0.mapq >= 10 and r1.mapq >= 50  # single pair floors/blend

    # pe_thru: both ends primary, same locus, read-through geometry
    a = mk(0, 1, 500, 600, False, 100, 30, qs=0, qe=100)
    b = mk(0, 1, 501, 599, False, 100, 30, qs=0, qe=100)
    set_pe_thru([100, 100], [[a], [b]])
    assert a.pe_thru and b.pe_thru


def test_seg_gen_rebases_anchors():
    """mm_seg_gen coordinate rebase, fwd + rev (hit.c:392-414)."""
    from winnowmap_tpu.map.hit import gen_regs, seg_gen
    from winnowmap_tpu.options import MM_SEED_SEG_SHIFT

    qlens = [100, 80]
    span = 15
    # one chain with anchors from both segments, forward strand
    ax = np.array([(0 << 33) | 1000, (0 << 33) | 1120], np.uint64)
    ay = np.array([(span << 32) | 50,
                   (1 << MM_SEED_SEG_SHIFT) | (span << 32) | 130],
                  np.uint64)
    u = np.array([(300 << 32) | 2], np.uint64)
    regs0 = gen_regs(7, sum(qlens), u, ax, ay)
    out = seg_gen(7, qlens, regs0, ax, ay)
    (regs_a, ax_a, ay_a), (regs_b, ax_b, ay_b) = out
    assert len(regs_a) == 1 and len(regs_b) == 1
    assert int(ay_a[0] & 0xFFFFFFFF) == 50
    assert int(ay_b[0] & 0xFFFFFFFF) == 130 - qlens[0]
    assert regs_a[0].seg_id == 0 and regs_b[0].seg_id == 1
    assert regs_a[0].seg_split and regs_b[0].seg_split
