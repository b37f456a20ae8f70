"""On-hardware Mosaic-miscompile gate as a pytest target (VERDICT r2 weak 4).

The default suite pins JAX to CPU (conftest.py), so this module is skipped
unless explicitly opted in on a TPU-equipped host:

    COME_TPU_TESTS=1 python -m pytest tests/test_tpu_gate.py -q

It runs scripts/verify_kernels_tpu.py --quick in-process: every Pallas tier
compiled on the chip vs interpret-mode execution of the same kernel.
bench.py runs the same gate before trusting any throughput number.
"""

import pathlib
import sys

import jax
import pytest

pytestmark = pytest.mark.tpu


def test_compiled_kernels_match_interpret_on_chip():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    root = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root / "scripts"))
    import verify_kernels_tpu

    assert verify_kernels_tpu.main(["--quick"]) == 0
