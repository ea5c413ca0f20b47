"""Debug-dump instruments byte-parity vs the reference binary.

The reference's correctness instruments (SURVEY §4) are stderr traces:
--print-seeds (QR/RS/SD/CN anchor+chain dumps, forces 1 thread),
--print-aln-seq (per-DP-call sequences + score/CIGAR), --dbg-polish
(PO MCAS trial traces).  These tests run BOTH binaries on the golden
corpus and assert the filtered traces are byte-identical — including the
reference's UNSTABLE in-place radix anchor order (ksort.h), replicated by
utils/dbg.ref_radix_argsort in dump modes.  Oracle-gated (skip when
/tmp/refbuild is absent); each run is a few seconds on the golden corpus.
"""
import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
GOLD = REPO / "tests" / "data" / "golden"
ORACLE = "/tmp/refbuild/bin/winnowmap"

ARGS = ["-c", "-W", str(GOLD / "t_rep_k15.txt"), str(GOLD / "t_ref.fa"),
        str(GOLD / "t_reads.fa")]


def _run_pair(flags, filt):
    if not os.path.exists(ORACLE):
        pytest.skip("oracle winnowmap not present")
    ref = subprocess.run([ORACLE, "-t", "1", *flags, *ARGS],
                         capture_output=True, text=True, timeout=900)
    assert ref.returncode == 0, ref.stderr[-2000:]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    ours = subprocess.run(
        [sys.executable, "-m", "winnowmap_tpu.cli", *flags, *ARGS],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=str(REPO))
    assert ours.returncode == 0, ours.stderr[-2000:]
    a, b = filt(ref.stderr), filt(ours.stderr)
    assert a, "oracle produced no trace lines (filter broken?)"
    if a != b:
        msg = f"trace length ref={len(a)} ours={len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                msg = f"first differing line {i}:\nref:  {x!r}\nours: {y!r}"
                break
        raise AssertionError(msg)


def _prefix_filter(*prefixes):
    pat = re.compile(r"^(" + "|".join(prefixes) + r")\t")

    def f(text):
        return [ln for ln in text.splitlines() if pat.match(ln)]

    return f


def test_print_seeds_trace_byte_equal():
    _run_pair(["--sv-off", "--print-seeds"],
              _prefix_filter("QR", "RS", "SD", "CN"))


def test_dbg_polish_trace_byte_equal():
    _run_pair(["--dbg-polish"], _prefix_filter("PO"))


def test_print_aln_seq_trace_byte_equal():
    def f(text):
        out, lines = [], text.splitlines()
        i = 0
        while i < len(lines):
            if lines[i].startswith("===>"):
                out.extend(lines[i:i + 3])
                i += 3
            elif lines[i].startswith("score="):
                out.append(lines[i])
                i += 1
            else:
                i += 1
        return out

    _run_pair(["--sv-off", "--print-aln-seq"], f)
