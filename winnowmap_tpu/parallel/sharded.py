"""Sharded-index multi-process mapping (reference shard+reduce template:
index-part loop main.c:384-424 + merge_hits, src/map.c:1050-1105, re-cast
for a jax.distributed process mesh).

Each process builds ONE index part (a contiguous genome slice), maps EVERY
read against its local part, and the per-read candidate regions are
all-gathered across the process mesh with XLA collectives
(multihost_utils.process_allgather over DCN); rank 0 then runs the
reference's merge: concatenate with rid shifts, re-sort, reassign
primaries, recompute MAPQ on the union -- byte-identical to the
single-process multi-part path (map/pipeline.map_file_multipart), which is
itself golden-tested against the single-index output.
"""
from __future__ import annotations

import sys

import numpy as np

from ..map.hit import Extra, Reg

# serialized region row: int32 fields in REG_I32 order + f32 div; cigars in
# a shared u32 blob indexed by (cigar_off, n_cigar)
REG_I32 = [
    "id", "cnt", "rid", "score", "qs", "qe", "rs", "re", "parent", "subsc",
    "as_", "mlen", "blen", "n_sub", "score0", "mapq", "split", "seg_id",
    "n_segs", "hash",
]
REG_BOOL = ["inv", "rev", "split_inv", "sam_pri", "seg_split", "is_alt"]
REG_P_I32 = ["dp_score", "dp_max", "dp_max2", "n_ambi", "trans_strand"]
ROW_W = len(REG_I32) + len(REG_BOOL) + 1 + len(REG_P_I32) + 3  # +has_p,co,nc
DIV_COL = ROW_W - 1  # div stored bit-cast in the last column


def pack_results(results):
    """list[MapResult] -> (meta (n,3) i64, rows (n_regs, ROW_W) i32,
    cigars u32 blob).  meta = (n_regs, rep_len, rep_len_defined)."""
    n = len(results)
    meta = np.zeros((n, 3), np.int64)
    rows = []
    cigs = []
    co = 0
    for i, res in enumerate(results):
        meta[i] = (len(res.regs), res.rep_len, int(res.rep_len_defined))
        for r in res.regs:
            row = np.zeros(ROW_W, np.int32)
            for j, f in enumerate(REG_I32):
                v = getattr(r, f)
                row[j] = np.uint32(v & 0xFFFFFFFF).view(np.int32) \
                    if f == "hash" else v
            o = len(REG_I32)
            for j, f in enumerate(REG_BOOL):
                row[o + j] = int(getattr(r, f))
            o += len(REG_BOOL)
            row[o] = int(r.p is not None)
            if r.p is not None:
                for j, f in enumerate(REG_P_I32):
                    row[o + 1 + j] = getattr(r.p, f)
                row[o + 1 + len(REG_P_I32)] = co
                row[o + 2 + len(REG_P_I32)] = len(r.p.cigar)
                cigs.append(np.asarray(r.p.cigar, np.uint32))
                co += len(r.p.cigar)
            row[DIV_COL] = np.float32(r.div).view(np.int32)
            rows.append(row)
    rows = np.stack(rows) if rows else np.zeros((0, ROW_W), np.int32)
    blob = np.concatenate(cigs) if cigs else np.zeros(0, np.uint32)
    return meta, rows, blob


def unpack_results(meta, rows, blob):
    """Inverse of pack_results -> list[MapResult]."""
    from ..map.frag import MapResult

    out = []
    ri = 0
    for n_regs, rep_len, rep_def in meta:
        regs = []
        for _ in range(int(n_regs)):
            row = rows[ri]
            ri += 1
            r = Reg()
            for j, f in enumerate(REG_I32):
                if f == "hash":
                    setattr(r, f, int(np.int32(row[j]).view(np.uint32)))
                else:
                    setattr(r, f, int(row[j]))
            o = len(REG_I32)
            for j, f in enumerate(REG_BOOL):
                setattr(r, f, bool(row[o + j]))
            o += len(REG_BOOL)
            if row[o]:
                r.p = Extra()
                for j, f in enumerate(REG_P_I32):
                    setattr(r.p, f, int(row[o + 1 + j]))
                co = int(row[o + 1 + len(REG_P_I32)])
                nc = int(row[o + 2 + len(REG_P_I32)])
                r.p.cigar = np.asarray(blob[co:co + nc], np.uint32)
            r.div = float(np.int32(row[DIV_COL]).view(np.float32))
            regs.append(r)
        out.append(MapResult(regs, int(rep_len), 0, bool(rep_def)))
    return out


def allgather_padded(arr, axis_pad=0):
    """process_allgather of a variable-length array: gather lengths first,
    pad to the max, gather, return the per-process unpadded list."""
    from jax.experimental import multihost_utils

    n = np.asarray([arr.shape[0]], np.int64)
    ns = np.asarray(multihost_utils.process_allgather(n, tiled=False))
    ns = ns.reshape(-1)
    m = int(ns.max()) if len(ns) else 0
    pad_shape = (m,) + arr.shape[1:]
    padded = np.zeros(pad_shape, arr.dtype)
    padded[:arr.shape[0]] = arr
    g = np.asarray(multihost_utils.process_allgather(padded, tiled=False))
    g = g.reshape((len(ns),) + pad_shape)
    return [g[i, :int(ns[i])] for i in range(len(ns))]


def map_file_partitioned(all_records, io_opts, opt, wset, reads_path,
                         out=sys.stdout, batched: bool = True,
                         n_parts: int | None = None) -> int:
    """Map with the index partitioned across the jax.distributed process
    mesh: process p builds part p, maps all reads, and the candidate
    regions are all-gathered and merged at rank 0 (which writes output).
    Single-process (n_parts given) falls back to looping parts locally --
    the differential oracle for the multi-process run."""
    import copy

    import jax

    from ..index.build import build_index
    from ..io.fastx import FastxReader
    from ..map.batch import map_batch
    from ..map.frag import MapResult, map_one
    from ..map.pipeline import (_write_read, merge_read_regs,
                                merged_meta_index)
    from ..options import update_mid_occ

    multi = n_parts is None
    if multi:
        n_parts = jax.process_count()
        rank = jax.process_index()
    else:
        rank = 0

    # contiguous bp-balanced partition of the reference records
    total_bp = sum(len(r.seq) for r in all_records)
    target = (total_bp + n_parts - 1) // n_parts
    parts = [[] for _ in range(n_parts)]
    pi, acc = 0, 0
    for rec in all_records:
        if acc >= target and pi < n_parts - 1:
            pi += 1
            acc = 0
        parts[pi].append(rec)
        acc += len(rec.seq)
    part_meta = [[(r.name, len(r.seq)) for r in prt] for prt in parts]
    rid_shift = np.cumsum([0] + [len(prt) for prt in parts])

    from ..io.seqcode import encode

    merged = merged_meta_index(part_meta, io_opts, None)
    # merged codes needed only on the writer (SAM MD/cs tags)
    merged.codes = np.concatenate(
        [np.zeros(0, np.uint8)]
        + [encode(r.seq) for prt in parts for r in prt])

    def map_part(p):
        mi = build_index(parts[p], io_opts.w, io_opts.k, io_opts.flag, wset,
                         bool(io_opts.flag & 1))
        opt_p = copy.copy(opt)
        update_mid_occ(opt_p, mi)
        results_all = []
        with FastxReader(reads_path) as reader:
            while True:
                batch = reader.read_batch(opt.mini_batch_size)
                if batch is None:
                    break
                order = sorted(range(len(batch)),
                               key=lambda i: (len(batch[i].seq), i),
                               reverse=True)
                batch = [batch[i] for i in order]
                if batched:
                    res = map_batch(mi, opt_p, [r.seq for r in batch],
                                    [r.name for r in batch])
                else:
                    res = [map_one(mi, opt_p, r.seq, r.name) for r in batch]
                for r in res:
                    for reg in r.regs:
                        reg.rid += int(rid_shift[p])
                results_all.append((batch, res))
        return results_all

    if multi:
        local = map_part(rank)
        # exchange per-part candidate regions over the process mesh
        per_part_chunks = []
        for batch, res in local:
            meta, rows, blob = pack_results(res)
            metas = allgather_padded(meta)
            rowss = allgather_padded(rows)
            blobs = allgather_padded(blob)
            per_part_chunks.append(
                (batch, [unpack_results(metas[p], rowss[p], blobs[p])
                         for p in range(n_parts)]))
    else:
        all_parts = [map_part(p) for p in range(n_parts)]
        per_part_chunks = []
        for ci in range(len(all_parts[0])):
            batch = all_parts[0][ci][0]
            per_part_chunks.append(
                (batch, [all_parts[p][ci][1] for p in range(n_parts)]))

    n_processed = 0
    if rank == 0:
        for batch, per_part in per_part_chunks:
            for k, rec in enumerate(batch):
                regs, rep_len = merge_read_regs(
                    opt, merged.k, [per_part[p][k].regs
                                    for p in range(n_parts)],
                    [per_part[p][k].rep_len for p in range(n_parts)])
                _write_read(merged, opt, rec, MapResult(regs, rep_len, 0),
                            out)
            n_processed += len(batch)
    return n_processed
