"""winnowmap-compatible command line (reference src/main.c).

Same flag surface and defaults as the reference CLI; maps reads (or an
assembly) against a reference genome and writes PAF or SAM.
"""
from __future__ import annotations

import os
import sys

import numpy as np

from . import __version__, enable_compile_cache
from .index.build import build_index, load_weight_bloom, load_weight_set
from .io.fastx import read_all
from .io.sam import sam_header
from .map.pipeline import map_file
from .options import (
    MM_F_ALL_CHAINS,
    MM_F_CIGAR,
    MM_F_COPY_COMMENT,
    MM_F_EQX,
    MM_F_FOR_ONLY,
    MM_F_HARD_MLEVEL,
    MM_F_LONG_CIGAR,
    MM_F_NO_DIAG,
    MM_F_NO_DUAL,
    MM_F_NO_LJOIN,
    MM_F_NO_PRINT_2ND,
    MM_F_OUT_CG,
    MM_F_OUT_CS,
    MM_F_OUT_CS_LONG,
    MM_F_OUT_MD,
    MM_F_OUT_SAM,
    MM_F_PAF_NO_HIT,
    MM_F_REV_ONLY,
    MM_F_SAM_HIT_ONLY,
    MM_F_SOFTCLIP,
    MM_F_SR,
    IndexOptions,
    MapOptions,
    check_options,
    set_preset,
    update_mid_occ,
)
from .utils import dbg
from .utils.log import phase_log, peakrss, realtime, cputime, warn


def _yes_no(s: str) -> bool:
    return s.lower() in ("yes", "y", "1", "true")


def _num(s: str) -> int:
    s = s.strip()
    mult = 1
    if s and s[-1] in "kKmMgG":
        mult = {"k": 10**3, "m": 10**6, "g": 10**9}[s[-1].lower()]
        s = s[:-1]
    return int(float(s) * mult)


USAGE = """Usage: winnowmap-tpu [options] <target.fa> [query.fa] [...]
A TPU-native long-read mapper with the capabilities of Winnowmap v2.03.
Run with no arguments for the option summary; flags mirror the reference
(see winnowmap --help)."""


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(USAGE, file=sys.stderr)
        return 1

    enable_compile_cache()
    io = IndexOptions()
    mo = MapOptions()

    # first pass: apply preset (reference main.c:146-160)
    i = 0
    preset = None
    while i < len(argv):
        if argv[i] == "-x" and i + 1 < len(argv):
            preset = argv[i + 1]
        elif argv[i].startswith("-x") and len(argv[i]) > 2:
            preset = argv[i][2:]
        i += 1
    if preset is not None:
        set_preset(preset, io, mo)

    pos = []
    out_path = None
    rg = None
    w_file = None
    bloom_mode = False
    idx_dump = None
    tpu_batch = False
    junc_bed = None
    split_prefix = None
    n_threads = 3
    i = 0

    def take(flag_val=None):
        nonlocal i
        if flag_val is not None:
            return flag_val
        i += 1
        if i >= len(argv):
            raise SystemExit(f"[ERROR] missing argument for {argv[i-1]}")
        return argv[i]

    while i < len(argv):
        a = argv[i]
        if not a.startswith("-") or a == "-":
            pos.append(a)
        elif a == "-x":
            i += 1  # handled in first pass
        elif a == "-W":
            w_file = take()
        elif a == "--bloom-filter":
            bloom_mode = True
        elif a == "-d":
            idx_dump = take()
        elif a == "-T":
            mo.sdust_thres = int(take())
        elif a == "-I":
            io.batch_size = _num(take())
        elif a == "--junc-bed":
            junc_bed = take()
        elif a == "--junc-bonus":
            mo.junc_bonus = int(take())
        elif a == "--tpu-batch":
            tpu_batch = True
        elif a == "--print-qname":
            dbg.flag |= dbg.DBG_PRINT_QNAME
        elif a == "--dbg-polish":
            dbg.flag |= dbg.DBG_PRINT_QNAME | dbg.DBG_POLISH
        elif a == "--print-seeds":
            # forces the sequential generator path (reference forces 1
            # thread, main.c:211)
            dbg.flag |= dbg.DBG_PRINT_QNAME | dbg.DBG_PRINT_SEED
        elif a == "--print-aln-seq":
            dbg.flag |= dbg.DBG_PRINT_QNAME | dbg.DBG_PRINT_ALN_SEQ
        elif a == "-k":
            io.k = int(take())
        elif a == "-w":
            io.w = int(take())
        elif a == "-H":
            io.flag |= 1
        elif a == "-t":
            # reference main.c:133: worker-thread count.  Our equivalent of
            # the kt_for worker pool is the native engine's pthread pool
            # (wm_engine.cpp spawn()); an explicit -t caps it (and, through
            # it, host DP/chain parallelism).  The default stays the
            # engine's own (512 mostly-blocked exchange threads) because
            # engine threads park on the device job exchange rather than
            # spinning on a core.
            n_threads = int(take())
            os.environ.setdefault("WM_ENGINE_THREADS",
                                  str(max(1, n_threads)))
        elif a == "-f":
            v = take()
            mo.mid_occ_frac = float(v.split(",")[0])
        elif a == "-g":
            mo.max_gap = _num(take())
        elif a == "-G":
            v = _num(take())
            mo.max_gap_ref = mo.bw = v
        elif a == "-F":
            mo.max_frag_len = _num(take())
        elif a == "--split-prefix":
            # reference main.c --split-prefix + splitidx.c: per-index-part
            # intermediate hit files under this prefix, merged at the end.
            # Our -I multipart path always rank-merges (map/pipeline.py);
            # the prefix names where the spill files live.
            split_prefix = take()
        elif a == "--frag":
            # reference main.c:244 --frag=yes/no toggles MM_F_FRAG_MODE
            from .options import MM_F_FRAG_MODE

            if _yes_no(take()):
                mo.flag |= MM_F_FRAG_MODE
            else:
                mo.flag &= ~MM_F_FRAG_MODE
        elif a == "-r":
            mo.bw = _num(take())
        elif a == "-n":
            mo.min_cnt = int(take())
        elif a == "-m":
            mo.min_chain_score = int(take())
        elif a == "-X":
            mo.flag |= MM_F_ALL_CHAINS | MM_F_NO_DIAG | MM_F_NO_DUAL | MM_F_NO_LJOIN
        elif a == "-p":
            mo.pri_ratio = float(take())
        elif a == "-N":
            mo.best_n = int(take())
        elif a == "-P":
            mo.flag |= MM_F_ALL_CHAINS
        elif a == "-a":
            mo.flag |= MM_F_OUT_SAM | MM_F_CIGAR
        elif a == "-c":
            mo.flag |= MM_F_OUT_CG | MM_F_CIGAR
        elif a == "-o":
            out_path = take()
        elif a == "-A":
            mo.a = int(take())
        elif a == "-B":
            mo.b = int(take())
        elif a == "-O":
            v = take().split(",")
            mo.q = int(v[0])
            mo.q2 = int(v[1]) if len(v) > 1 else mo.q2
        elif a == "-E":
            v = take().split(",")
            mo.e = int(v[0])
            mo.e2 = int(v[1]) if len(v) > 1 else mo.e2
        elif a == "-z":
            v = take().split(",")
            mo.zdrop = _num(v[0])
            if len(v) > 1:
                mo.zdrop_inv = _num(v[1])
        elif a == "-s":
            mo.min_dp_max = _num(take())
        elif a == "-L":
            mo.flag |= MM_F_LONG_CIGAR
        elif a == "-R":
            rg = take()
        elif a == "-y":
            mo.flag |= MM_F_COPY_COMMENT
        elif a == "-Y":
            mo.flag |= MM_F_SOFTCLIP
        elif a == "-D":
            mo.flag |= MM_F_NO_DIAG
        elif a == "-K":
            mo.mini_batch_size = _num(take())
        elif a == "-u":
            v = take()
            warn("splice junction matching is handled by the splice preset")
        elif a == "--sv-off":
            mo.sv_aware = False
        elif a == "--cs" or a.startswith("--cs="):
            mo.flag |= MM_F_OUT_CS | MM_F_CIGAR
            if a.endswith("=long"):
                mo.flag |= MM_F_OUT_CS_LONG
        elif a == "--MD":
            mo.flag |= MM_F_OUT_MD | MM_F_CIGAR
        elif a == "--eqx":
            mo.flag |= MM_F_EQX
        elif a == "--for-only":
            mo.flag |= MM_F_FOR_ONLY
        elif a == "--rev-only":
            mo.flag |= MM_F_REV_ONLY
        elif a == "--secondary":
            if take() == "no":
                mo.flag |= MM_F_NO_PRINT_2ND
        elif a.startswith("--secondary="):
            if a.split("=", 1)[1] == "no":
                mo.flag |= MM_F_NO_PRINT_2ND
        elif a == "--paf-no-hit":
            mo.flag |= MM_F_PAF_NO_HIT
        elif a == "--sam-hit-only":
            mo.flag |= MM_F_SAM_HIT_ONLY
        elif a == "--hard-mask-level":
            mo.flag |= MM_F_HARD_MLEVEL
        elif a == "--mask-len":
            mo.mask_len = _num(take())
        elif a == "-M":
            mo.mask_level = float(take())
        elif a == "--version":
            print(__version__)
            return 0
        elif a in ("-h", "--help"):
            print(USAGE, file=sys.stderr)
            return 0
        elif a == "--sr":
            mo.flag |= MM_F_SR
        elif a == "--min-occ-floor":
            mo.min_mid_occ = int(take())
        elif a == "--max-qlen":
            mo.max_qlen = _num(take())
        elif a == "--seed":
            mo.seed = int(take())
        elif a == "--no-end-flt":
            from .options import MM_F_NO_END_FLT

            mo.flag |= MM_F_NO_END_FLT
        elif a == "--cap-sw-mem":
            mo.max_sw_mat = _num(take())
        else:
            print(f'[ERROR] unknown option in "{a}"', file=sys.stderr)
            return 1
        i += 1

    if not pos:
        print(USAGE, file=sys.stderr)
        return 1
    if len(pos) > 1 and not (mo.flag & (MM_F_OUT_SAM | MM_F_OUT_CG | MM_F_OUT_CS | MM_F_OUT_MD)):
        pass  # PAF without CIGAR is the default
    check_options(io, mo)

    out = open(out_path, "w") if out_path else sys.stdout

    phase_log("main", "reading downweighted kmers")
    if bloom_mode:
        # strict-parity membership: the reference's bloom filter, false
        # positives included (reference src/index.c:410-437); default is
        # the exact set (no FPs -- strictly better weighting)
        bloom = load_weight_bloom(w_file, io.k)
        wset = np.zeros(0, np.uint64)
        n_in = sum(1 for line in open(w_file)) if w_file else 0
        phase_log("main", f"collected downweighted kmers into a bloom "
                          f"filter, no. of kmers read={n_in}")
    else:
        bloom = None
        wset = load_weight_set(w_file, io.k)
        phase_log("main", f"collected downweighted kmers, no. of kmers read={len(wset)}")

    target = pos[0]
    queries = pos[1:]
    from .index.io import dump_index, is_index_file, load_index
    from .index.mmi import is_mmi_file, load_mmi

    if is_mmi_file(target):
        # reference prebuilt index (MMI\2, src/index.c:556-608): it stores
        # no weight set, so query sketching runs unweighted — exactly the
        # reference's behaviour with loaded indexes (mm_idx_load never
        # restores downFilter)
        mi = load_mmi(target)
        if w_file:
            warn("prebuilt MMI index: -W list ignored (reference behaviour)")
    elif is_index_file(target):
        mi = load_index(target)
        if w_file and len(wset) and len(mi.wset) != len(wset):
            warn("prebuilt index: -W list ignored (stored set used)")
    else:
        records = read_all(target)
        mi = build_index(records, io.w, io.k, io.flag, wset,
                         bool(io.flag & 1), weight_bloom=bloom)
    phase_log("index", mi.stat_line())
    update_mid_occ(mo, mi)

    if junc_bed:
        from .index.build import read_bed

        read_bed(mi, junc_bed, read_junc=True)
    if idx_dump:
        if idx_dump.endswith(".mmi"):
            # reference-format dump so the stock winnowmap can load it
            # (reference mm_idx_dump, src/index.c:515-554)
            from .index.mmi import dump_mmi

            dump_mmi(mi, idx_dump)
        else:
            dump_index(mi, idx_dump)
        phase_log("index", f"index dumped to {idx_dump}")
    if not queries:
        if not idx_dump:
            warn("no query file given; index built only (use -d to save it)")
        return 0

    if mo.flag & MM_F_OUT_SAM:
        cl = "winnowmap-tpu " + " ".join(argv)
        print(sam_header(mi, rg, __version__, cl), file=out)

    if dbg.flag:
        # debug dumps are ordered stderr traces: sequential per-read path
        # (reference forces n_threads=1 for seed/aln dumps, main.c:211-215)
        tpu_batch = False
        os.environ["WM_NO_ENGINE"] = "1"
    if tpu_batch:
        enable_compile_cache()
    n = 0
    total_bp = sum(s_.length for s_ in mi.seqs)
    from .options import MM_F_FRAG_MODE, MM_F_SPLICE

    frag_mode = len(queries) > 1 or bool(mo.flag & MM_F_FRAG_MODE)
    if frag_mode and (mo.flag & MM_F_SPLICE):
        raise SystemExit("[ERROR] --splice and --frag should not be "
                         "specified at the same time.")
    if (io.batch_size and total_bp > io.batch_size
            and not is_index_file(target) and not is_mmi_file(target)):
        from .map.pipeline import map_file_multipart

        tdir = None
        if split_prefix:
            import pathlib

            tdir = str(pathlib.Path(split_prefix).resolve().parent)
            os.makedirs(tdir, exist_ok=True)
        n = map_file_multipart(records, io, mo, wset, queries, out=out,
                               batch_bp=io.batch_size, batched=tpu_batch,
                               tmp_dir=tdir)
    elif frag_mode:
        from .map.pipeline import map_file_frag

        n = map_file_frag(mi, mo, queries, out=out, batched=tpu_batch)
    else:
        for qf in queries:
            n += map_file(mi, mo, qf, out=out, batched=tpu_batch)
    phase_log(
        "main",
        f"Version: {__version__}; CMD: winnowmap-tpu {' '.join(argv)}",
    )
    phase_log(
        "main",
        f"Real time: {realtime():.3f} sec; CPU: {cputime():.3f} sec; "
        f"Peak RSS: {peakrss():.3f} GB",
    )
    if out is not sys.stdout:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
