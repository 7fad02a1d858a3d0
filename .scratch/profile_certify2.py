import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import linearmpc_tpu as lmpc
from linearmpc_tpu.certify import certify
from linearmpc_tpu.types import ParameterRange

mpc, rng_e = lmpc.mpc_examples("invpend")
mpc.setup()
rng_small = ParameterRange.from_mpc(mpc)
for nm in ("xmin", "rmin", "dmin", "umin", "pmin"):
    getattr(rng_small, nm)[:] = -6.0
for nm in ("xmax", "rmax", "dmax", "umax", "pmax"):
    getattr(rng_small, nm)[:] = 6.0
t0 = time.perf_counter()
cert = certify(mpc, prange=rng_small)
t1 = time.perf_counter() - t0
print(f"box +/-6 (wave): {len(cert.partition)} regions, bound {cert.max_iterations}, {t1:.1f} s", flush=True)
t0 = time.perf_counter()
cert = certify(mpc, prange=rng_e)
t1 = time.perf_counter() - t0
print(f"default range (wave): {len(cert.partition)} regions, bound {cert.max_iterations}, "
      f"exhausted={cert.exhausted}, {t1:.1f} s", flush=True)
