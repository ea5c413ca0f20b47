"""Sketch bit-exactness vs the reference oracle minimizer dump."""
import numpy as np

import winnowmap_tpu.native as native


def test_sketch_matches_oracle_dump(golden_dir, ref_records, weight_set):
    ours = []
    for rid, rec in enumerate(ref_records):
        x, y = native.sketch(rec.seq, 50, 15, rid, False, weight_set)
        ours += [
            (int(yy >> 32), int((yy & 0xFFFFFFFF) >> 1), int(xx >> 8))
            for xx, yy in zip(x, y)
        ]
    gold = [
        tuple(map(int, l.split()))
        for l in open(golden_dir / "golden_ref_minimizers.txt")
    ]
    assert ours == gold


def test_sketch_empty_and_ambiguous():
    x, y = native.sketch(b"", 50, 15, 0, False)
    assert len(x) == 0
    x, y = native.sketch(b"N" * 100, 5, 15, 0, False)
    assert len(x) == 0


def test_sketch_weight_downweights():
    # a repetitive k-mer flagged for down-weighting should be picked less
    seq = (b"ACGTACGTACGTACGTTGCAGCATCGATCAGCTACGACTACGATCAGCATCAGCATCAGT" * 50)
    x0, _ = native.sketch(seq, 10, 15, 0, False)
    # flag every k-mer that was chosen in the unweighted pass
    keys = np.unique(x0 >> np.uint64(8))
    # invert the stored key back? Not needed: flag via encode of all windows
    allk = np.array(
        sorted({native.encode_kmer(seq[i : i + 15]) for i in range(len(seq) - 14)}),
        dtype=np.uint64,
    )
    x1, _ = native.sketch(seq, 10, 15, 0, False, allk)
    # flagging everything leaves relative order intact -> identical choice
    assert np.array_equal(np.sort(x0), np.sort(x1))


def test_hpc_sketch_runs():
    seq = b"AAACCCGGGTTTAACCGGTTACGTACGTAAACCCGGGTTT" * 20
    x, y = native.sketch(seq, 10, 15, 0, True)
    assert len(x) > 0
    spans = (x & np.uint64(0xFF)).astype(int)
    assert (spans >= 15).all()  # HPC spans at least k bases


def test_device_sketch_parity():
    """Device sketch (sketch/device.py: TPU k-mer roll + murmur +
    membership, native winnowing tail) == native oracle, including HPC,
    ambiguous bases, symmetric k-mers, and weighted sets."""
    from winnowmap_tpu.sketch.device import sketch_device

    rng = np.random.default_rng(5)
    for trial in range(16):
        n = int(rng.integers(50, 2500))
        seq = rng.choice(
            list(b"ACGTacgtN"), n,
            p=[.22, .22, .22, .22, .02, .02, .02, .02, .04]
        ).astype(np.uint8).tobytes()
        hpc = trial % 2 == 1
        k = 15
        wset = []
        for off in range(0, max(1, n - k), 37):
            sub = seq[off:off + k]
            if len(sub) == k and b'N' not in sub and b'n' not in sub:
                wset.append(native.encode_kmer(sub))
        wset = (np.unique(np.array(wset, np.uint64)) if wset
                else np.zeros(0, np.uint64))
        hx, hy = native.sketch(seq, 50, k, 3, hpc, wset)
        dx, dy = sketch_device(seq, 50, k, 3, hpc, wset)
        assert np.array_equal(hx, dx) and np.array_equal(hy, dy), trial


def test_device_sketch_matches_golden_minimizers(golden_dir=None):
    """Sketch of the golden reference through the device path equals the
    reference's own minimizer dump (golden_ref_minimizers.txt)."""
    from pathlib import Path

    from winnowmap_tpu.io.fastx import read_all
    from winnowmap_tpu.sketch.device import sketch_device

    gold = Path(__file__).parent / "data" / "golden"
    wset_lines = (gold / "t_rep_k15.txt").read_text().split()
    wset = np.unique(np.array(
        [native.encode_kmer(w.encode()) for w in wset_lines[::2]], np.uint64))
    want = set()
    for line in (gold / "golden_ref_minimizers.txt").read_text().splitlines():
        rid, pos, key = line.split()
        want.add((int(rid), int(pos), int(key)))
    got = set()
    for rid, rec in enumerate(read_all(str(gold / "t_ref.fa"))):
        x, y = sketch_device(rec.seq, 50, 15, rid, False, wset)
        for xi, yi in zip(x.tolist(), y.tolist()):
            got.add((yi >> 32, (yi & 0xFFFFFFFF) >> 1, xi >> 8))
    assert got == want
