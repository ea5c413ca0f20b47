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
