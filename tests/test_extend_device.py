"""Device (JAX) extension kernels vs the native oracle."""
import numpy as np
import pytest

import winnowmap_tpu.native as native
from winnowmap_tpu.extend.device import extd_batch, extz_batch
from winnowmap_tpu.map.align import gen_simple_mat

MAT = gen_simple_mat(2, 4, 1)


def _mutate(rng, q, sub, ind):
    out = []
    i = 0
    while i < len(q):
        r = rng.random()
        if r < ind / 2:
            i += 1
            continue
        if r < ind:
            out.append(rng.integers(0, 4))
            continue
        if r < ind + sub:
            out.append((q[i] + 1 + rng.integers(0, 3)) % 4)
        else:
            out.append(q[i])
        i += 1
    return np.array(out, dtype=np.uint8)


@pytest.fixture(scope="module")
def cases():
    rng = np.random.default_rng(3)
    qs, ts = [], []
    for _ in range(8):
        n = int(rng.integers(80, 600))
        t = rng.integers(0, 4, n).astype(np.uint8)
        qs.append(_mutate(rng, t, 0.06, 0.06))
        ts.append(t)
    return qs, ts


def _check(kernel, qs, ts, flag, w, zd):
    if kernel == "extz":
        res = extz_batch(qs, ts, MAT, 4, 2, w, zd, -1, flag)
    else:
        res = extd_batch(qs, ts, MAT, 4, 2, 24, 1, w, zd, -1, flag)
    approx = bool(flag & 0x08)
    for i in range(len(qs)):
        if kernel == "extz":
            h = native.extz(qs[i], ts[i], MAT, 4, 2, w, zd, -1, flag)
        else:
            h = native.extd(qs[i], ts[i], MAT, 4, 2, 24, 1, w, zd, -1, flag)
        assert int(h.zdropped) == res.zdropped[i]
        assert h.score == res.score[i]
        if not approx:
            assert (h.max, h.max_q, h.max_t) == (res.max[i], res.max_q[i], res.max_t[i])
            assert (h.mqe, h.mqe_t, h.mte, h.mte_q) == (
                res.mqe[i], res.mqe_t[i], res.mte[i], res.mte_q[i])
            if not h.zdropped and not (flag & 0x40):
                i0, j0 = len(ts[i]) - 1, len(qs[i]) - 1
            elif not h.zdropped and (flag & 0x40) and h.mqe - 1 > h.max:
                i0, j0 = h.mqe_t, len(qs[i]) - 1
            elif h.max_t >= 0 and h.max_q >= 0:
                i0, j0 = h.max_t, h.max_q
            else:
                continue
            assert np.array_equal(res.cigar(i, i0, j0, bool(flag & 0x80)), h.cigar)


@pytest.mark.parametrize("flag,w,zd", [
    (0, 500, 400), (0x40, 150, 200), (0x42 | 0x80, 751, 400), (0x08, 500, 400),
])
@pytest.mark.parametrize("kernel", ["extz", "extd"])
def test_device_matches_oracle(cases, kernel, flag, w, zd):
    qs, ts = cases
    _check(kernel, qs, ts, flag, w, zd)


def test_backend_gt0_canary():
    """Regression canary for the axon TPU backend miscompiling gt(x, 0) on
    loop-carried ints inside lax loops (observed: jax 0.9.0 / TPU v5 lite,
    2026-08: (r > 0) evaluates true at r == 0 while (r >= 1) is correct).
    Device code must use the >= 1 form; this test documents the hazard and
    will flag if the kernels' chosen form ever breaks too.
    """
    import jax
    import jax.numpy as jnp

    def body(c):
        r, flags = c
        flags = flags.at[r].set((r >= 1).astype(jnp.int32))
        return (r + 1, flags)

    f = jax.jit(
        lambda: jax.lax.while_loop(
            lambda c: c[0] < 3, body, (jnp.int32(0), jnp.full(4, 9, jnp.int32))
        )
    )
    _, flags = f()
    assert np.asarray(flags).tolist() == [0, 1, 1, 9]
