"""Option/preset system parity (reference options.c)."""
import math

import pytest

from winnowmap_tpu.options import (
    IndexOptions,
    MapOptions,
    check_options,
    set_preset,
    stage2_options,
)


def test_defaults_match_reference():
    io, mo = IndexOptions(), MapOptions()
    assert (io.k, io.w, io.bucket_bits) == (15, 50, 14)
    assert (mo.a, mo.b, mo.q, mo.e, mo.q2, mo.e2) == (2, 4, 4, 2, 24, 1)
    assert (mo.zdrop, mo.zdrop_inv) == (400, 200)
    assert mo.mid_occ == 5000
    assert mo.sv_aware and mo.sv_aware_min_read_length == 10000
    assert mo.min_prefix_length == 2000 and mo.max_prefix_length == 16000
    assert abs(mo.prefix_increment_factor - math.sqrt(15999 / 2000)) < 1e-12


def test_map_pb_preset():
    io, mo = IndexOptions(), MapOptions()
    set_preset("map-pb", io, mo)
    assert mo.max_prefix_length == 8000 and mo.stage2_bw == 1000
    assert mo.suffix_sample_offset == 1000


def test_asm20_preset():
    io, mo = IndexOptions(), MapOptions()
    set_preset("asm20", io, mo)
    assert io.k == 19
    assert (mo.a, mo.b, mo.q, mo.q2, mo.e, mo.e2) == (1, 4, 6, 26, 2, 1)
    check_options(io, mo)


def test_stage2_overrides():
    mo = MapOptions()
    s2 = stage2_options(mo)
    assert s2.bw == 2000 and s2.zdrop_inv == 25 and s2.max_gap == 16000


def test_check_rejects_bad_gap_penalties():
    io, mo = IndexOptions(), MapOptions()
    mo.q, mo.q2, mo.e, mo.e2 = 10, 5, 1, 2
    with pytest.raises(ValueError):
        check_options(io, mo)
