"""End-to-end output parity with the reference oracle goldens."""
import io as _io
import subprocess
import sys

import pytest

from winnowmap_tpu.cli import main as cli_main


def _run_cli(args, capsys):
    rc = cli_main(args)
    assert rc == 0
    return capsys.readouterr().out


def _assert_equal_mod_ub(ours: str, gold: str, mapq_field: int):
    """Byte equality except MAPQ + rl on reads hit by the reference's
    uninitialized-rep_len UB (reference map.c:281 vs 917)."""
    ol, gl = ours.splitlines(), gold.splitlines()
    assert len(ol) == len(gl)
    n_ub = 0
    for o, g in zip(ol, gl):
        if o == g:
            continue
        of, gf = o.split("\t"), g.split("\t")
        assert len(of) == len(gf), (o[:120], g[:120])
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(of, gf)) if a != b]
        assert all(
            (a.startswith("rl:i:") and b.startswith("rl:i:")) or i == mapq_field
            for i, a, b in diffs
        ), (o[:150], g[:150], diffs)
        assert any(a == "rl:i:0" for _, a, b in diffs)
        n_ub += 1
    return n_ub


@pytest.fixture(scope="module")
def gold_args(request):
    d = request.getfixturevalue("golden_dir")


def test_paf_svoff_byte_equal(golden_dir, capsys):
    out = _run_cli(
        ["--sv-off", "-c", "-W", str(golden_dir / "t_rep_k15.txt"),
         str(golden_dir / "t_ref.fa"), str(golden_dir / "t_reads.fa")],
        capsys,
    )
    gold = (golden_dir / "golden_svoff.paf").read_text()
    assert out == gold


def test_paf_svoff_nocigar_byte_equal(golden_dir, capsys):
    out = _run_cli(
        ["--sv-off", "-W", str(golden_dir / "t_rep_k15.txt"),
         str(golden_dir / "t_ref.fa"), str(golden_dir / "t_reads.fa")],
        capsys,
    )
    gold = (golden_dir / "golden_svoff_nocig.paf").read_text()
    assert out == gold


def test_sam_svoff_byte_equal(golden_dir, capsys):
    out = _run_cli(
        ["--sv-off", "-a", "-W", str(golden_dir / "t_rep_k15.txt"),
         str(golden_dir / "t_ref.fa"), str(golden_dir / "t_reads.fa")],
        capsys,
    )
    strip = lambda s: "\n".join(
        l for l in s.splitlines() if not l.startswith("@PG")
    )
    gold = (golden_dir / "golden_svoff.sam").read_text()
    assert strip(out) == strip(gold)


def test_paf_svon_equal_mod_ub(golden_dir, capsys):
    out = _run_cli(
        ["-c", "-W", str(golden_dir / "t_rep_k15.txt"),
         str(golden_dir / "t_ref.fa"), str(golden_dir / "t_reads.fa")],
        capsys,
    )
    gold = (golden_dir / "golden_svon.paf").read_text()
    n_ub = _assert_equal_mod_ub(out, gold, mapq_field=11)
    assert n_ub <= 6  # only the full-coverage MCAS reads may differ


def test_sam_svon_equal_mod_ub(golden_dir, capsys):
    out = _run_cli(
        ["-a", "-W", str(golden_dir / "t_rep_k15.txt"),
         str(golden_dir / "t_ref.fa"), str(golden_dir / "t_reads.fa")],
        capsys,
    )
    strip = lambda s: "\n".join(
        l for l in s.splitlines() if not l.startswith("@PG")
    )
    gold = (golden_dir / "golden_svon.sam").read_text()
    n_ub = _assert_equal_mod_ub(strip(out), strip(gold), mapq_field=4)
    assert n_ub <= 6


def test_index_dump_load_roundtrip(golden_dir, tmp_path, capsys):
    """Prebuilt-index workflow parity (reference mm_idx_dump/load + reader
    auto-detect, src/index.c:515-649)."""
    idx = tmp_path / "t.wmi"
    rc = cli_main(["-W", str(golden_dir / "t_rep_k15.txt"),
                   "-d", str(idx), str(golden_dir / "t_ref.fa")])
    assert rc == 0
    capsys.readouterr()
    out = _run_cli(
        ["--sv-off", "-c", str(idx), str(golden_dir / "t_reads.fa")], capsys)
    gold = (golden_dir / "golden_svoff.paf").read_text()
    assert out == gold


def test_multipart_index_matches_single(golden_dir, capsys):
    """-I multi-part mapping merges per-part hits back to the single-index
    output (reference index-part loop main.c:384-424 + merge_hits
    map.c:1050-1105)."""
    single = _run_cli(
        ["--sv-off", "-c", "-W", str(golden_dir / "t_rep_k15.txt"),
         str(golden_dir / "t_ref.fa"), str(golden_dir / "t_reads.fa")],
        capsys,
    )
    multi = _run_cli(
        ["--sv-off", "-c", "-I", "100k",
         "-W", str(golden_dir / "t_rep_k15.txt"),
         str(golden_dir / "t_ref.fa"), str(golden_dir / "t_reads.fa")],
        capsys,
    )
    assert multi == single
