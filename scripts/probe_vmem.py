"""Probe usable VMEM: try increasingly large scratch allocations."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(mb):
    n = mb * 1024 * 1024 // 4 // 128
    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        o_ref[0, 0] = jnp.sum(scratch[0, :])
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=512 * 1024 * 1024),
    )
    x = jnp.ones((8, 128), jnp.float32)
    try:
        out = jax.jit(lambda x: f(x))(x)
        print(f"VMEM {mb}MB scratch: OK (sum={float(out[0,0])})", flush=True)
        return True
    except Exception as e:
        print(f"VMEM {mb}MB scratch: FAIL ({type(e).__name__}) {str(e)[:200]}",
              flush=True)
        return False

for mb in [8, 16, 24, 32, 48, 64, 96, 120]:
    if not probe(mb):
        break
