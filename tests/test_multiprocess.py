"""Real multi-process jax.distributed tests (SURVEY §4: pod emulation with
>1 process on the CPU backend).  Two actual OS processes initialize
jax.distributed against a local coordinator, exchange candidate regions
with XLA collectives, and the merged output must byte-match the
single-process oracle."""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
GOLD = REPO / "tests" / "data" / "golden"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address={coord!r},
                               num_processes=2,
                               process_id=int(sys.argv[1]))
    from winnowmap_tpu.index.build import load_weight_set
    from winnowmap_tpu.io.fastx import read_all
    from winnowmap_tpu.options import (IndexOptions, MapOptions, MM_F_CIGAR,
                                       MM_F_OUT_SAM)
    from winnowmap_tpu.parallel.sharded import map_file_partitioned

    gold = {gold!r}
    io_, mo = IndexOptions(), MapOptions()
    mo.flag |= MM_F_CIGAR | MM_F_OUT_SAM
    wset = load_weight_set(gold + "/t_rep_k15.txt", io_.k)
    records = read_all(gold + "/t_ref.fa")
    out_path = {out!r}
    rank = jax.process_index()
    with open(out_path + f".r{{rank}}", "w") as f:
        n = map_file_partitioned(records, io_, mo, wset,
                                 gold + "/t_reads.fa", out=f,
                                 batched={batched})
    print("WORKER-DONE", rank, n)
""")


@pytest.mark.parametrize("batched", [False, True])
def test_partitioned_two_processes_byte_equal(tmp_path, batched):
    """2 jax.distributed processes, index partitioned across them, regions
    all-gathered and merged at rank 0 == single-process partitioned run.

    batched=True drives the PRODUCTION engine path (map_batch -> native C++
    engine + job exchange) inside each worker -- host DP kernels, since the
    CPU workers have no chip; the engine's device scheduler itself is
    covered by test_multidev.py on the interpret-mode mesh."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("WM_NO_TPU", None)
    env["WM_NO_TPU"] = "1"  # host kernels: no device in CPU workers
    coord = f"localhost:{_free_port()}"
    out = str(tmp_path / "mp_out")
    code = WORKER.format(repo=str(REPO), coord=coord, gold=str(GOLD),
                         out=out, batched=batched)
    procs = [subprocess.Popen([sys.executable, "-c", code, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=1100)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i}:\n{outs[i]}"
        assert "WORKER-DONE" in outs[i], outs[i]

    # single-process oracle: same partition, same merge, run locally
    os.environ["WM_NO_TPU"] = "1"
    from winnowmap_tpu.index.build import load_weight_set
    from winnowmap_tpu.io.fastx import read_all
    from winnowmap_tpu.options import (IndexOptions, MapOptions, MM_F_CIGAR,
                                       MM_F_OUT_SAM)
    from winnowmap_tpu.parallel.sharded import map_file_partitioned

    io_, mo = IndexOptions(), MapOptions()
    mo.flag |= MM_F_CIGAR | MM_F_OUT_SAM
    wset = load_weight_set(str(GOLD / "t_rep_k15.txt"), io_.k)
    records = read_all(str(GOLD / "t_ref.fa"))
    ref_out = tmp_path / "sp_out"
    with open(ref_out, "w") as f:
        map_file_partitioned(records, io_, mo, wset,
                             str(GOLD / "t_reads.fa"), out=f, batched=batched,
                             n_parts=2)
    got = open(out + ".r0").read()
    want = open(ref_out).read()
    assert got == want, "multi-process output differs from single-process"
    # rank 1 writes nothing (only rank 0 merges + writes)
    assert open(out + ".r1").read() == ""
