"""Differential tests of the full meryl operation vocabulary against the
reference binary (reference merylOp.H:32-74, merylOp-nextMer.C:470-640).

Every op is run by BOTH the reference meryl (/tmp/refbuild/bin/meryl) and
our CLI over the same two small DBs; `print` output must match byte-for-
byte.  Oracle-gated: skipped when the reference binary is absent.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

MERYL = "/tmp/refbuild/bin/meryl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MERYL), reason="oracle meryl not present")


@pytest.fixture(scope="module")
def dbs(tmp_path_factory, golden_dir):
    """Two reference-format DBs (built by the reference meryl so both sides
    read identical inputs) + our loaded copies."""
    tmp = tmp_path_factory.mktemp("meryl_ops")
    fa1 = golden_dir / "t_ref.fa"
    fa2 = golden_dir / "t_reads.fa"
    db1, db2 = tmp / "db1", tmp / "db2"
    subprocess.run([MERYL, "count", "k=15", "output", str(db1), str(fa1)],
                   check=True, capture_output=True)
    subprocess.run([MERYL, "count", "k=15", "output", str(db2), str(fa2)],
                   check=True, capture_output=True)
    return str(db1), str(db2)


def _ref(args):
    r = subprocess.run([MERYL] + args, capture_output=True, check=True)
    return r.stdout.decode()


def _ours(args, capsys):
    from winnowmap_tpu.meryl_cli import main as meryl_main

    capsys.readouterr()
    assert meryl_main(args) == 0
    return capsys.readouterr().out


NARY = ["union", "union-min", "union-max", "union-sum",
        "intersect", "intersect-min", "intersect-max", "intersect-sum",
        "subtract", "difference", "symmetric-difference"]


@pytest.mark.parametrize("op", NARY)
def test_nary_op_parity(op, dbs, capsys):
    db1, db2 = dbs
    want = _ref(["print", op, db1, db2])
    got = _ours(["print", op, db1, db2], capsys)
    assert got == want


@pytest.mark.parametrize("op", ["union", "union-sum", "intersect",
                                "intersect-sum", "subtract",
                                "symmetric-difference"])
def test_nary_op_parity_reversed(op, dbs, capsys):
    """Order matters for subtract/intersect (first-input count)."""
    db1, db2 = dbs
    want = _ref(["print", op, db2, db1])
    got = _ours(["print", op, db2, db1], capsys)
    assert got == want


MATH = [("increase", "3"), ("decrease", "2"), ("multiply", "5"),
        ("divide", "2"), ("divide-round", "2"), ("modulo", "3")]


@pytest.mark.parametrize("op,c", MATH)
def test_math_op_parity(op, c, dbs, capsys):
    db1, _ = dbs
    want = _ref(["print", op, c, db1])
    got = _ours(["print", op, c, db1], capsys)
    assert got == want


@pytest.mark.parametrize("direction", ["count-forward", "count-reverse"])
def test_count_direction_parity(direction, dbs, golden_dir, tmp_path,
                                capsys):
    """Single-line FASTA input: the vendored reference meryl drops k-mers
    spanning FASTA line breaks (see test_kcount.py docstring), so parity is
    defined on unwrapped sequences."""
    from winnowmap_tpu.io.fastx import read_all

    fa = tmp_path / "flat.fa"
    with open(fa, "w") as f:
        for rec in read_all(str(golden_dir / "t_ref.fa")):
            f.write(f">{rec.name}\n{rec.seq.decode()}\n")
    rdb = tmp_path / ("r_" + direction)
    subprocess.run([MERYL, direction, "k=15", "output", str(rdb), str(fa)],
                   check=True, capture_output=True)
    want = _ref(["print", str(rdb)])
    got = _ours(["print", "[", direction, "k=15", str(fa), "]"], capsys)
    assert got == want


def test_compare_parity(dbs, capsys):
    db1, db2 = dbs
    want = _ref(["compare", db1, db2])
    got = _ours(["compare", db1, db2], capsys)
    assert got == want


def test_ploidy_parity(dbs, capsys):
    """ploidy stdout line (noise trough + peak positions) matches the
    reference implementation (kmers-histogram-ploidy.C)."""
    db1, _ = dbs
    r = subprocess.run([MERYL, "ploidy", db1], capture_output=True)
    if r.returncode != 0:
        pytest.skip("reference ploidy rejects this input")
    want = r.stdout.decode()
    got = _ours(["ploidy", db1], capsys)
    assert got == want


def test_nested_math_in_tree(dbs, capsys):
    """Math ops compose inside [...] trees: the tree form equals piping the
    flat ops.  (The reference builder's operand attachment for mixed
    bracket/bare operand forms is quirky — merylCommandBuilder.C folds a
    bare operand after `]` into the inner op — so tree parity is defined
    against our own flat pipeline, whose per-op outputs are oracle-matched
    above.)"""
    db1, db2 = dbs
    doubled = _ours(["print", "multiply", "2", db1], capsys)
    import tempfile

    from winnowmap_tpu.meryl_cli import main as meryl_main

    with tempfile.TemporaryDirectory() as td:
        dump = os.path.join(td, "x2.txt")
        with open(dump, "w") as f:
            f.write(doubled)
        imp = os.path.join(td, "x2db")
        assert meryl_main(["import", "-k", "15", "-kmers", dump,
                           "-output", imp]) == 0
        flat = _ours(["print", "union-sum", imp, db2], capsys)
    tree = _ours(["print", "union-sum", "[", "multiply", "2", db1, "]",
                  "[", db2, "]"], capsys)
    assert tree == flat
