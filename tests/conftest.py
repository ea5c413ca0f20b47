import os
import sys
from pathlib import Path

# Multi-chip tests emulate an 8-device mesh on CPU (real TPU has 1 chip here).
# FORCE-pin (not setdefault): the agent env ships JAX_PLATFORMS=axon, and the
# axon plugin's interpreter-start registration sets jax.config
# jax_platforms="axon,cpu", so in-process jits would try to initialize the
# TPU client — which HANGS (not errors) when the chip tunnel is down.  Tests
# that need the real chip spawn subprocesses with JAX_PLATFORMS stripped.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import jax

jax.config.update("jax_platforms", "cpu")  # overrides axon's startup value

import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / "tests" / "data" / "golden"
sys.path.insert(0, str(REPO))


_TPU_ALIVE = None


def tpu_alive(timeout: int = 120) -> bool:
    """Time-bounded probe of the real TPU backend.

    The axon tunnel can be DOWN in a way that makes TPU client init hang
    forever (not error), so tests that spawn un-sandboxed TPU subprocesses
    must gate on this probe instead of discovering the hang themselves.
    Result is cached for the pytest session.
    """
    global _TPU_ALIVE
    if _TPU_ALIVE is None:
        import subprocess

        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "print('TPU-OK' if d[0].platform == 'tpu' else d)"],
                capture_output=True, text=True, timeout=timeout, env=env)
            _TPU_ALIVE = "TPU-OK" in proc.stdout
        except subprocess.TimeoutExpired:
            _TPU_ALIVE = False
    return _TPU_ALIVE


@pytest.fixture(scope="session")
def golden_dir():
    return DATA


@pytest.fixture(scope="session")
def ref_records(golden_dir):
    from winnowmap_tpu.io.fastx import read_all

    return read_all(str(golden_dir / "t_ref.fa"))


@pytest.fixture(scope="session")
def weight_set(golden_dir):
    from winnowmap_tpu.index.build import load_weight_set

    return load_weight_set(str(golden_dir / "t_rep_k15.txt"), 15)


@pytest.fixture(scope="session")
def index(ref_records, weight_set):
    from winnowmap_tpu.index.build import build_index

    return build_index(ref_records, w=50, k=15, weight_set=weight_set)


def pytest_configure(config):
    import winnowmap_tpu

    winnowmap_tpu.enable_compile_cache()
    # the axon TPU plugin ignores the JAX_PLATFORMS env var; apply it via
    # the config API so the 8-device CPU mesh is real
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
