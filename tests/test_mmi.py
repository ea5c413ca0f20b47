"""Reference MMI\\2 prebuilt-index interop (reference mm_idx_dump/load,
src/index.c:515-608): loading a reference-written .mmi must reproduce our
own bloom-mode index arrays exactly, and our writer must round-trip."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
GOLD = REPO / "tests" / "data" / "golden"


def _build_bloom_index():
    from winnowmap_tpu.index.build import (build_index, load_weight_bloom,
                                           load_weight_set)
    from winnowmap_tpu.io.fastx import read_all

    wset = load_weight_set(str(GOLD / "t_rep_k15.txt"), 15)
    bloom = load_weight_bloom(str(GOLD / "t_rep_k15.txt"), 15)
    return build_index(read_all(str(GOLD / "t_ref.fa")), 50, 15, 0, wset,
                       weight_bloom=bloom)


def _assert_same_index(a, b):
    assert (a.w, a.k) == (b.w, b.k)
    assert [(s.name, s.offset, s.length) for s in a.seqs] == \
        [(s.name, s.offset, s.length) for s in b.seqs]
    np.testing.assert_array_equal(a.keys, b.keys)
    np.testing.assert_array_equal(a.start, b.start)
    np.testing.assert_array_equal(a.pos, b.pos)
    np.testing.assert_array_equal(a.codes, b.codes)


def test_mmi_roundtrip(tmp_path):
    """dump_mmi -> load_mmi reproduces the index arrays bit-exactly."""
    from winnowmap_tpu.index.mmi import dump_mmi, is_mmi_file, load_mmi

    mi = _build_bloom_index()
    p = tmp_path / "t_ref.mmi"
    dump_mmi(mi, str(p))
    assert is_mmi_file(str(p))
    got = load_mmi(str(p))
    _assert_same_index(mi, got)
    assert got.flag == mi.flag


def test_mmi_reference_golden_load():
    """A .mmi written by the REFERENCE binary (winnowmap -W ... -d) loads
    into exactly the index our bloom-parity build produces from the same
    inputs — the two implementations agree on every stored minimizer,
    occurrence record and packed reference code."""
    golden = GOLD / "t_ref.mmi"
    if not golden.exists():
        pytest.skip("golden t_ref.mmi not generated (gen_goldens.sh)")
    from winnowmap_tpu.index.mmi import load_mmi

    ref = load_mmi(str(golden))
    ours = _build_bloom_index()
    _assert_same_index(ours, ref)


def test_mmi_cli_mapping_byte_equal(tmp_path):
    """CLI auto-detects an .mmi target (reference mm_idx_reader_read
    auto-detect, src/index.c:610-649) and its SAM byte-matches the
    reference binary mapping with the SAME prebuilt index (golden_mmi.sam,
    gen_goldens.sh).  Query-side weighting is off in both: the reference
    never restores the down-weight filter for loaded indexes
    (src/index.c:556-608) — see index/mmi.py.  Also asserts our own-dumped
    .mmi maps identically to the reference-dumped one."""
    golden_sam = GOLD / "golden_mmi.sam"
    golden = GOLD / "t_ref.mmi"
    if not golden_sam.exists() or not golden.exists():
        pytest.skip("golden t_ref.mmi / golden_mmi.sam not generated")

    def run(target):
        r = subprocess.run(
            [sys.executable, "-m", "winnowmap_tpu.cli", "-a",
             str(target), str(GOLD / "t_reads.fa")],
            capture_output=True, text=True, timeout=900, cwd=str(REPO))
        assert r.returncode == 0, r.stderr
        return [ln for ln in r.stdout.splitlines()
                if not ln.startswith("@PG")]

    want = [ln for ln in golden_sam.read_text().splitlines()
            if not ln.startswith("@PG")]
    assert run(golden) == want

    from winnowmap_tpu.index.mmi import dump_mmi

    ours = tmp_path / "ours.mmi"
    dump_mmi(_build_bloom_index(), str(ours))
    assert run(ours) == want
