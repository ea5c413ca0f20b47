"""Batch mapping driver (reference mm_map_file / worker_pipeline,
src/map.c:983-1276): read batches, longest-first scheduling, ordered output.
"""
from __future__ import annotations

import sys

from ..io import paf as pafmod
from ..io import sam as sammod
from ..io.fastx import FastxReader
from ..options import (
    MM_F_COPY_COMMENT,
    MM_F_NO_PRINT_2ND,
    MM_F_OUT_SAM,
    MM_F_PAF_NO_HIT,
    MM_F_SAM_HIT_ONLY,
    MapOptions,
)
from ..utils.log import phase_log
from .frag import map_one


def map_file(mi, opt: MapOptions, path: str, out=sys.stdout,
             map_fn=None, batched=False) -> int:
    """Map all reads in `path` against index `mi`, writing PAF/SAM to `out`.
    Returns the number of reads processed.  `map_fn` overrides the per-read
    mapper; `batched=True` uses the TPU batch driver (map/batch.py), which
    is bit-identical to the per-read path."""
    map_fn = map_fn or map_one
    n_processed = 0
    with FastxReader(path) as reader:
        while True:
            batch = reader.read_batch(opt.mini_batch_size)
            if batch is None:
                break
            for i, rec in enumerate(batch):
                rec.rid = n_processed + i
            # longest-first scheduling, ties -> later read first
            # (reference map.c:1124-1143; this changes output order)
            order = sorted(
                range(len(batch)),
                key=lambda i: (len(batch[i].seq), i),
                reverse=True,
            )
            batch = [batch[i] for i in order]
            if batched:
                from .batch import map_batch

                results = map_batch(mi, opt, [r.seq for r in batch],
                                    [r.name for r in batch])
            else:
                results = []
                for rec in batch:
                    results.append(map_fn(mi, opt, rec.seq, rec.name))
            for rec, res in zip(batch, results):
                _write_read(mi, opt, rec, res, out)
            n_processed += len(batch)
            phase_log("map_file", f"mapped {len(batch)} sequences")
    return n_processed


def _write_read(mi, opt, rec, res, out) -> None:
    regs = res.regs
    if regs:
        for r in regs:
            assert not r.sam_pri or r.id == r.parent
            if (opt.flag & MM_F_NO_PRINT_2ND) and r.id != r.parent:
                continue
            if opt.flag & MM_F_OUT_SAM:
                line = sammod.write_sam(
                    mi, rec, r, regs, opt.flag, res.rep_len
                )
            else:
                line = pafmod.write_paf(
                    mi, rec.name, len(rec.seq), r, opt.flag, res.rep_len,
                    rec.comment, bool(opt.flag & MM_F_COPY_COMMENT), rec=rec,
                )
            out.write(line + "\n")
    elif (opt.flag & MM_F_PAF_NO_HIT) or (
        (opt.flag & MM_F_OUT_SAM) and not (opt.flag & MM_F_SAM_HIT_ONLY)
    ):
        if opt.flag & MM_F_OUT_SAM:
            line = sammod.write_sam(mi, rec, None, regs, opt.flag, res.rep_len)
        else:
            line = pafmod.write_paf(
                mi, rec.name, len(rec.seq), None, opt.flag, res.rep_len,
                rec.comment, bool(opt.flag & MM_F_COPY_COMMENT),
            )
        out.write(line + "\n")


CHECK_PAIR_THRES = 1_000_000  # reference bseq.c:30


def _read_frag_batches(paths, mini_batch_bp):
    """Yield frag-mode read batches: multiple files are read in lockstep
    and interleaved (reference mm_bseq_read_frag2, bseq.c:131-158); with
    one file, a fragment's reads are kept in one batch by carrying the
    trailing same-stem group over the batch boundary (the reference reads
    ahead while names match, bseq.c:95-111)."""
    from ..io.sam import qname_same

    if len(paths) > 1:
        readers = [FastxReader(p) for p in paths]
        try:
            pend = [[] for _ in paths]
            while True:
                batch = []
                size = 0
                while size < mini_batch_bp:
                    for i, rd in enumerate(readers):
                        if not pend[i]:
                            nb = rd.read_batch(mini_batch_bp)
                            pend[i] = list(nb) if nb else []
                    if not all(pend):
                        if any(pend):
                            import sys as _s

                            print("[WARNING] query files have different "
                                  "number of records; extra records "
                                  "skipped.", file=_s.stderr)
                        if batch:
                            yield batch
                        return
                    for i in range(len(readers)):
                        rec = pend[i].pop(0)
                        batch.append(rec)
                        size += len(rec.seq)
                yield batch
        finally:
            for rd in readers:
                rd.close()
    else:
        with FastxReader(paths[0]) as rd:
            carry = []
            while True:
                nb = rd.read_batch(mini_batch_bp)
                if nb is None:
                    if carry:
                        yield carry
                    return
                batch = carry + list(nb)
                carry = []
                # hold back the trailing same-stem group so a fragment
                # never splits across batches
                if batch and len(batch[-1].seq) < CHECK_PAIR_THRES:
                    j = len(batch) - 1
                    while j > 0 and qname_same(batch[j - 1].name,
                                               batch[j].name):
                        j -= 1
                    if j > 0:
                        carry = batch[j:]
                        batch = batch[:j]
                if batch:
                    yield batch


def _group_frags(batch, frag_mode: bool):
    """Group adjacent same-stem reads into fragments (reference
    map.c:1150-1160)."""
    from ..io.sam import qname_same

    frags = []
    j = 0
    for i in range(1, len(batch) + 1):
        if (i == len(batch) or not frag_mode
                or not qname_same(batch[i - 1].name, batch[i].name)):
            frags.append(batch[j:i])
            j = i
    return frags


def _revcomp_rec(rec):
    from ..io.seqcode import revcomp_bytes

    rec.seq = revcomp_bytes(rec.seq)
    if rec.qual:
        rec.qual = rec.qual[::-1]


def _write_frag(mi, opt, recs, reses, out) -> None:
    """Emit one fragment's segments (reference pipeline step 2,
    map.c:1186-1208: per-segment records with paired SAM context)."""
    n_seg = len(recs)
    if n_seg == 1:
        _write_read(mi, opt, recs[0], reses[0], out)
        return
    regs_all = [res.regs for res in reses]
    for i, (rec, res) in enumerate(zip(recs, reses)):
        regs = res.regs
        if regs:
            for r in regs:
                assert not r.sam_pri or r.id == r.parent
                if (opt.flag & MM_F_NO_PRINT_2ND) and r.id != r.parent:
                    continue
                if opt.flag & MM_F_OUT_SAM:
                    line = sammod.write_sam(
                        mi, rec, r, regs, opt.flag, res.rep_len,
                        seg_idx=i, n_seg=n_seg, regs_all=regs_all)
                else:
                    line = pafmod.write_paf(
                        mi, rec.name, len(rec.seq), r, opt.flag,
                        res.rep_len, rec.comment,
                        bool(opt.flag & MM_F_COPY_COMMENT), rec=rec)
                out.write(line + "\n")
        elif (opt.flag & MM_F_PAF_NO_HIT) or (
            (opt.flag & MM_F_OUT_SAM)
            and not (opt.flag & MM_F_SAM_HIT_ONLY)
        ):
            if opt.flag & MM_F_OUT_SAM:
                line = sammod.write_sam(
                    mi, rec, None, regs, opt.flag, res.rep_len,
                    seg_idx=i, n_seg=n_seg, regs_all=regs_all)
            else:
                line = pafmod.write_paf(
                    mi, rec.name, len(rec.seq), None, opt.flag,
                    res.rep_len, rec.comment,
                    bool(opt.flag & MM_F_COPY_COMMENT))
            out.write(line + "\n")


def map_file_frag(mi, opt: MapOptions, paths, out=sys.stdout,
                  batched=False) -> int:
    """Fragment/paired-end mapping driver (reference mm_map_file_frag,
    src/map.c:1244-1276).  Adjacent same-stem reads form one fragment;
    with pe_ori the inner-facing segments are reverse-complemented before
    mapping and flipped back afterwards (worker_for, map.c:1009-1048).
    NOTE: no longest-first reshuffle here — the reference's reshuffle
    (map.c:1127-1143) would separate pair mates before the adjacency
    grouping; the parity oracle disables it in frag mode (tests/tools/
    NOTES)."""
    from .frag import map_frag_pair, map_one

    pe_ori = opt.pe_ori
    n_processed = 0
    for batch in _read_frag_batches(paths, opt.mini_batch_size):
        for i, rec in enumerate(batch):
            rec.rid = n_processed + i
        frags = _group_frags(batch, True)
        # pe_ori orientation normalization (reference map.c:1035-1048)
        for fr in frags:
            if len(fr) == 2:
                if pe_ori >> 1 & 1:
                    _revcomp_rec(fr[0])
                if pe_ori & 1:
                    _revcomp_rec(fr[1])
        if batched:
            from .batch import map_batch_frags

            reses = map_batch_frags(mi, opt, [[r.seq for r in fr]
                                              for fr in frags],
                                    [fr[0].name for fr in frags])
        else:
            reses = []
            for fr in frags:
                if len(fr) == 1:
                    reses.append([map_one(mi, opt, fr[0].seq, fr[0].name)])
                else:
                    reses.append(map_frag_pair(mi, opt,
                                               [r.seq for r in fr],
                                               fr[0].name))
        # flip coordinates back to the original strand (map.c:1040-1048)
        for fr, res in zip(frags, reses):
            if len(fr) == 2:
                for j in (0, 1):
                    if (j == 0 and pe_ori >> 1 & 1) or (j == 1
                                                        and pe_ori & 1):
                        _revcomp_rec(fr[j])
                        qlen = len(fr[j].seq)
                        for r in res[j].regs:
                            r.qs, r.qe = qlen - r.qe, qlen - r.qs
                            r.rev = not r.rev
        for fr, res in zip(frags, reses):
            _write_frag(mi, opt, fr, res, out)
        n_processed += len(batch)
        phase_log("map_file", f"mapped {len(batch)} sequences")
    return n_processed


def split_parts_by_bp(all_records, batch_bp: int):
    """Split the reference into parts of ~batch_bp bases (reference
    mm_idx_reader_read accumulates until sum_len > batch_size,
    index.c:293-295)."""
    parts = []
    cur, cur_len = [], 0
    for rec in all_records:
        cur.append(rec)
        cur_len += len(rec.seq)
        if cur_len > batch_bp:
            parts.append(cur)
            cur, cur_len = [], 0
    if cur:
        parts.append(cur)
    return parts


def merged_meta_index(part_seq_meta, io_opts, part_codes=None):
    """Merged metadata view over index parts for rid-based output
    (names/lengths/codes concatenated; no minimizer tables -- the
    reference's split-merge header/seq lookup, splitidx.c).
    part_seq_meta: per part, list of (name, length)."""
    import numpy as np

    from ..index.build import MinimizerIndex, SeqMeta

    merged = MinimizerIndex(w=io_opts.w, k=io_opts.k, flag=io_opts.flag)
    off = 0
    for metas in part_seq_meta:
        for name, length in metas:
            merged.seqs.append(SeqMeta(name, off, length))
            off += length
    if part_codes is not None:
        merged.codes = np.concatenate(part_codes)
    return merged


def merge_read_regs(opt: MapOptions, merged_k: int, per_part_regs,
                    per_part_rep_len):
    """Merge one read's per-part regions (reference merge_hits,
    map.c:1050-1105): concatenate, re-sort, reassign primaries and MAPQ
    on the union.  rids must already be shifted into merged space."""
    from ..options import MM_F_ALL_CHAINS, MM_F_HARD_MLEVEL, MM_F_SR
    from .hit import hit_sort, select_sub, set_mapq, set_parent, set_sam_pri

    regs = [reg for regs_p in per_part_regs for reg in regs_p]
    rep_len = max(per_part_rep_len)
    regs = hit_sort(regs, opt.alt_drop)
    set_parent(opt.mask_level, opt.mask_len, regs, opt.a * 2 + opt.b,
               opt.flag & MM_F_HARD_MLEVEL, opt.alt_drop)
    if not (opt.flag & MM_F_ALL_CHAINS):
        regs = select_sub(opt.pri_ratio, merged_k * 2, opt.best_n, regs)
        set_sam_pri(regs)
    set_mapq(regs, opt.min_chain_score, opt.a, rep_len,
             bool(opt.flag & MM_F_SR))
    return regs, rep_len


def map_file_multipart(all_records, io_opts, opt: MapOptions, wset, paths,
                       out=sys.stdout, batch_bp: int = 4_000_000_000,
                       batched: bool = False, tmp_dir: str | None = None
                       ) -> int:
    """Multi-part index mapping (reference -I + --split-prefix: index-part
    loop main.c:384-424, per-part hit dumps merged by merge_hits,
    map.c:1050-1105).  Reads are mapped against every index part; each
    read's regions are concatenated with rid shifts, rep_len is the maximum
    over parts, and primary selection + MAPQ are recomputed on the union.

    Streams one index part at a time, exactly like the reference's
    mm_idx_reader loop (index.c:634-679): each part's per-read results are
    serialized to a temp file and the merge runs after the last part, so
    peak memory is bounded by ONE part plus the serialized hits."""
    import pickle
    import tempfile
    from pathlib import Path

    from ..index.build import build_index
    from ..io.fastx import FastxReader
    from ..options import update_mid_occ
    from ..parallel.sharded import pack_results, unpack_results
    from .batch import map_batch
    from .frag import MapResult, map_one

    parts = split_parts_by_bp(all_records, batch_bp)
    n_parts = len(parts)
    part_meta = [[(r.name, len(r.seq)) for r in prt] for prt in parts]
    rid_shift = [0]
    for metas in part_meta:
        rid_shift.append(rid_shift[-1] + len(metas))

    def read_batches():
        """Yield read batches in deterministic order across part passes."""
        n_before = 0
        for path in paths:
            with FastxReader(path) as reader:
                while True:
                    batch = reader.read_batch(opt.mini_batch_size)
                    if batch is None:
                        break
                    for i, rec in enumerate(batch):
                        rec.rid = n_before + i
                    order = sorted(range(len(batch)),
                                   key=lambda i: (len(batch[i].seq), i),
                                   reverse=True)
                    yield [batch[i] for i in order]
                    n_before += len(batch)

    single = n_parts == 1
    tdir = None
    dumps = []
    codes_file = None
    import copy

    for pi, prt in enumerate(parts):
        # one part resident at a time (reference index.c:634-679)
        mi = build_index(prt, io_opts.w, io_opts.k, io_opts.flag, wset,
                         bool(io_opts.flag & 1))
        if not single:
            # spill packed codes to disk: the merge pass memmaps them for
            # SAM/cs output, so peak memory stays bounded by ONE part
            if tdir is None:
                import tempfile as _tf

                tdir = tempfile.TemporaryDirectory(dir=tmp_dir)
                codes_file = open(Path(tdir.name) / "codes.bin", "wb")
            codes_file.write(mi.codes.tobytes())
        opt_p = copy.copy(opt)
        update_mid_occ(opt_p, mi)
        if single:
            n_processed = 0
            for batch in read_batches():
                if batched:
                    res = map_batch(mi, opt_p, [r.seq for r in batch],
                                    [r.name for r in batch])
                else:
                    res = [map_one(mi, opt_p, r.seq, r.name) for r in batch]
                for rec, r in zip(batch, res):
                    _write_read(mi, opt, rec, r, out)
                n_processed += len(batch)
                phase_log("map_file", f"mapped {len(batch)} sequences")
            return n_processed
        dump_path = Path(tdir.name) / f"part{pi}.hits"
        with open(dump_path, "wb") as df:
            for batch in read_batches():
                if batched:
                    res = map_batch(mi, opt_p, [r.seq for r in batch],
                                    [r.name for r in batch])
                else:
                    res = [map_one(mi, opt_p, r.seq, r.name) for r in batch]
                for r in res:
                    for reg in r.regs:
                        reg.rid += rid_shift[pi]
                pickle.dump(pack_results(res), df,
                            protocol=pickle.HIGHEST_PROTOCOL)
        dumps.append(dump_path)
        phase_log("map_file", f"index part {pi + 1}/{n_parts} mapped")

    codes_file.close()
    import numpy as np

    merged = merged_meta_index(part_meta, io_opts, None)
    merged.codes = np.memmap(Path(tdir.name) / "codes.bin", dtype=np.uint8,
                             mode="r")

    # merge pass (reference merge_hits + splitidx temp-file replay)
    n_processed = 0
    files = [open(p, "rb") for p in dumps]
    try:
        for batch in read_batches():
            per_part = [unpack_results(*pickle.load(f)) for f in files]
            for k, rec in enumerate(batch):
                regs, rep_len = merge_read_regs(
                    opt, merged.k, [res[k].regs for res in per_part],
                    [res[k].rep_len for res in per_part])
                _write_read(merged, opt, rec,
                            MapResult(regs, rep_len, 0), out)
            n_processed += len(batch)
            phase_log("map_file", f"merged {len(batch)} sequences "
                                  f"({n_parts} index parts)")
    finally:
        for f in files:
            f.close()
        tdir.cleanup()
    return n_processed
