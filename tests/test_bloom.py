"""--bloom-filter strict-parity mode: the reference loads the -W k-mer
list into a bloom filter (reference src/index.c:410-437), so its effective
down-weight set includes that filter's false positives.  Our default is
the exact set; the bloom mode must reproduce the reference filter
bit-for-bit so SAM output can be byte-identical at any scale."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
GOLD = REPO / "tests" / "data" / "golden"
REF_BLOOM = Path("/root/reference/ext/bloom")

PROBE = r"""
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include "bloom_filter.hpp"
int main(int argc, char** argv) {
  FILE* f = fopen(argv[1], "r");
  std::vector<unsigned long long> ins;
  unsigned long long v;
  while (fscanf(f, "%llu", &v) == 1) ins.push_back(v);
  fclose(f);
  bloom_parameters p;
  p.projected_element_count = std::max((uint64_t)ins.size(), (uint64_t)1000);
  p.false_positive_probability = 0.001;
  p.maximum_number_of_hashes = 2;
  if (!p) return 1;
  p.compute_optimal_parameters();
  bloom_filter filt(p);
  for (auto x : ins) filt.insert((uint64_t)x);
  printf("%llu\n", p.optimal_parameters.table_size);
  f = fopen(argv[2], "r");
  while (fscanf(f, "%llu", &v) == 1)
    printf("%d\n", filt.contains((uint64_t)v) ? 1 : 0);
  fclose(f);
  return 0;
}
"""


@pytest.mark.skipif(not REF_BLOOM.exists(),
                    reason="reference bloom header not available")
def test_bloom_matches_reference_filter(tmp_path):
    """wm_bloom (and the numpy variant in the device-sketch tail) must
    agree with the REFERENCE bloom_filter.hpp compiled as an oracle probe
    on every membership bit, at several set sizes."""
    import ctypes

    from winnowmap_tpu import native
    from winnowmap_tpu.sketch.device import _bloom_contains_np

    probe_src = tmp_path / "probe.cpp"
    probe_bin = tmp_path / "probe"
    probe_src.write_text(PROBE)
    subprocess.run(["g++", "-O2", f"-I{REF_BLOOM}", "-o", str(probe_bin),
                    str(probe_src)], check=True, capture_output=True)

    L = native.lib()
    rng = np.random.default_rng(3)
    for n_ins in (10, 5000, 120000):
        ins = np.unique(rng.integers(0, 1 << 60, n_ins).astype(np.uint64))
        qry = np.concatenate([
            ins[: len(ins) // 2],
            rng.integers(0, 1 << 60, 50000).astype(np.uint64)])
        fi, fq = tmp_path / "ins.txt", tmp_path / "qry.txt"
        np.savetxt(fi, ins, fmt="%d")
        np.savetxt(fq, qry, fmt="%d")
        out = subprocess.run([str(probe_bin), str(fi), str(fq)],
                             capture_output=True, text=True,
                             check=True).stdout.splitlines()
        ref_bits = int(out[0])
        ref = np.array([int(x) for x in out[1:]], np.uint8)

        bits = ctypes.c_uint64()
        s0 = ctypes.c_uint32()
        s1 = ctypes.c_uint32()
        L.wm_bloom_params(len(ins), ctypes.byref(bits), ctypes.byref(s0),
                          ctypes.byref(s1))
        assert bits.value == ref_bits
        table = np.zeros(bits.value // 8, np.uint8)
        L.wm_bloom_build(np.ascontiguousarray(ins), len(ins), bits.value,
                         s0.value, s1.value, table)
        ours = np.zeros(len(qry), np.uint8)
        L.wm_bloom_contains_batch(np.ascontiguousarray(qry), len(qry),
                                  table, bits.value, s0.value, s1.value,
                                  ours)
        assert np.array_equal(ref, ours), f"C membership differs at n={n_ins}"
        np_ours = _bloom_contains_np(qry, table, bits.value, s0.value,
                                     s1.value).astype(np.uint8)
        assert np.array_equal(ref, np_ours), f"np membership at n={n_ins}"


def test_bloom_mode_cli_matches_golden(capsys):
    """--bloom-filter on the golden corpus must still byte-match the
    reference output (at this scale the bloom FPs do not change the
    mapping, which the round-2 exact-set runs established; the flag's
    decisive effect is at genome scale where exact-vs-bloom diverged)."""
    from winnowmap_tpu.cli import main as wm_main

    argv = ["--sv-off", "-c", "-W", str(GOLD / "t_rep_k15.txt"),
            str(GOLD / "t_ref.fa"), str(GOLD / "t_reads.fa"),
            "--bloom-filter"]
    assert wm_main(argv) == 0
    out = capsys.readouterr().out
    gold = (GOLD / "golden_svoff.paf").read_text()
    assert out == gold


def test_bloom_index_dump_roundtrip(tmp_path):
    """An index built in bloom mode dumps/loads with its table and salts."""
    from winnowmap_tpu.index.build import (build_index, load_weight_bloom)
    from winnowmap_tpu.index.io import dump_index, load_index
    from winnowmap_tpu.io.fastx import read_all

    bloom = load_weight_bloom(str(GOLD / "t_rep_k15.txt"), 15)
    mi = build_index(read_all(str(GOLD / "t_ref.fa")), 50, 15,
                     weight_bloom=bloom)
    p = tmp_path / "ix.wmi"
    dump_index(mi, str(p))
    mi2 = load_index(str(p))
    assert mi2.bloom is not None
    t1, b1, s01, s11 = mi.bloom
    t2, b2, s02, s12 = mi2.bloom
    assert (b1, s01, s11) == (b2, s02, s12)
    assert np.array_equal(t1, t2)
    assert np.array_equal(mi.keys, mi2.keys)
