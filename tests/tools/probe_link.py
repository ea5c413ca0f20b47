#!/usr/bin/env python3
"""Measure the axon tunnel's dispatch/fetch economics: single round-trip
latency, pipelined throughput at depth N, and fetch-size sensitivity.
Diagnostic only; needs the chip."""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    x = np.arange(1024, dtype=np.int32)

    @jax.jit
    def f(a):
        return a + 1

    @jax.jit
    def g(a):  # ~100 us of device work
        b = a.astype(jnp.float32)
        for _ in range(4):
            b = jnp.sin(b) @ jnp.ones((1, 1), np.float32) * 0 + b
        return (b.sum() + a[0]).astype(jnp.int32)

    d = jax.device_put(x)
    np.asarray(f(d))  # compile+warm

    # 1) serial round trips
    for tag, n in (("serial", 20),):
        t0 = time.time()
        for _ in range(n):
            np.asarray(f(d))
        dt = (time.time() - t0) / n
        print(f"{tag} dispatch+fetch round trip: {dt*1e3:.2f} ms")

    # 2) dispatch-only cost (no fetch)
    t0 = time.time()
    o = None
    for _ in range(100):
        o = f(d)
    o.block_until_ready()  # may no-op on axon
    print(f"dispatch-only (100x, no fetch): "
          f"{(time.time()-t0)/100*1e3:.2f} ms each")
    np.asarray(o)

    # 3) pipelined: N in flight, then fetch all
    for depth in (2, 4, 8, 16, 32):
        t0 = time.time()
        outs = [f(d + i) for i in range(depth)]
        for oo in outs:
            try:
                oo.copy_to_host_async()
            except Exception:
                pass
        res = [np.asarray(oo) for oo in outs]
        dt = (time.time() - t0) / depth
        print(f"pipelined depth {depth:2d}: {dt*1e3:.2f} ms per call")
    assert res[0][0] == x[0] + 1 + depth - 1

    # 4) fetch size sensitivity
    for mb in (0.03, 0.5, 2, 8, 32):
        n = int(mb * 1e6 // 4)
        big = jax.device_put(np.zeros(n, np.int32))

        @jax.jit
        def h(a):
            return a + 1

        np.asarray(h(big))
        t0 = time.time()
        for _ in range(5):
            np.asarray(h(big))
        dt = (time.time() - t0) / 5
        print(f"fetch {mb:5.2f} MB: {dt*1e3:7.2f} ms "
              f"({mb/dt:6.1f} MB/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
