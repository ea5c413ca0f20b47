"""Sanitizer build modes for the native host library (SURVEY §5.2).

The reference ships asan/tsan debug builds of its C core via Makefile
flags; the equivalent here is WM_NATIVE_SAN=address|thread|undefined,
which rebuilds libwmtpu with that sanitizer (native/__init__._build).
These tests run the production C++ map engine (thread pool + DP-job
exchange, the code most exposed to memory/race bugs) under asan and
tsan in a subprocess and fail on any sanitizer report that names our
sources.  Reference analogue: per-thread arenas + kthread work stealing
(src/kalloc.c, src/kthread.c:30-72) exercised under the same tools.
"""
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SCRIPT = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["WM_NO_TPU"] = "1"
    sys.path.insert(0, {repo!r})
    import numpy as np
    from winnowmap_tpu.index.build import build_index
    from winnowmap_tpu.options import (IndexOptions, MapOptions, MM_F_CIGAR,
                                       update_mid_occ)
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, 20000)
    gstr = bytes(bytearray(b"ACGT"[int(c)] for c in genome))
    rec = [type("R", (), {{"name": "chr1", "seq": gstr, "comment": None}})()]
    io_, mo = IndexOptions(), MapOptions()
    mo.flag |= MM_F_CIGAR
    mi = build_index(rec, io_.w, io_.k, io_.flag, np.zeros(0, np.uint64))
    update_mid_occ(mo, mi)
    reads, names = [], []
    ACGT = b"ACGT"
    for i in range(6):
        s = int(rng.integers(0, 12000))
        L = int(rng.integers(1500, 4000))
        sub = bytearray(gstr[s:s + L])
        for _ in range(L // 20):
            p = int(rng.integers(0, L))
            sub[p] = ACGT[int(rng.integers(0, 4))]
        reads.append(bytes(sub))
        names.append(f"r{{i}}")
    from winnowmap_tpu.map.engine import map_batch_engine
    res = map_batch_engine(mi, mo, reads, names)
    n = sum(len(r.regs) for r in res)
    assert n > 0, "no alignments produced"
    print("SAN-RUN-OK", n)
""")


def _san_lib(name: str) -> str:
    out = subprocess.run(["g++", f"-print-file-name=lib{name}.so"],
                         capture_output=True, text=True).stdout.strip()
    return out if os.path.sep in out else ""


def _run_under(san: str, runtime: str):
    lib = _san_lib(runtime)
    if not lib:
        pytest.skip(f"lib{runtime}.so not found")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["WM_NATIVE_SAN"] = san
    # the sanitizer runtime must be loaded before python itself
    env["LD_PRELOAD"] = lib
    # python leaks by design; we only care about our native code
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=0"
    # CPython's GIL/atomics are tsan-noisy; reports naming our sources
    # are filtered below instead of relying on tsan's exit code
    env["TSAN_OPTIONS"] = "report_bugs=1:halt_on_error=0:exitcode=0"
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=str(REPO))],
        capture_output=True, text=True, timeout=1200, env=env)
    assert "SAN-RUN-OK" in proc.stdout, (
        f"engine run under {san} failed:\n{proc.stdout}\n{proc.stderr}")
    # fail on any sanitizer report that points into our native sources
    blaming = [ln for ln in proc.stderr.splitlines()
               if ("wm_" in ln and ".cpp" in ln)]
    in_report = any(m in proc.stderr for m in
                    ("ERROR: AddressSanitizer", "WARNING: ThreadSanitizer",
                     "runtime error:"))
    assert not (in_report and blaming), (
        f"{san} sanitizer report names winnowmap-tpu native code:\n"
        + proc.stderr[-4000:])


def test_engine_under_asan():
    _run_under("address", "asan")


def test_engine_under_tsan():
    _run_under("thread", "tsan")
