import sys, time, cProfile, pstats
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
certify(mpc, prange=rng_small, max_regions=50)  # warm the jits
pr = cProfile.Profile(); pr.enable()
cert = certify(mpc, prange=rng_small)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(18)
