import sys; sys.path.insert(0, "/root/repo")
import time, cProfile, pstats
import jax
jax.config.update('jax_platforms','cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, linearmpc_tpu as lmpc

mpc, rng_e = lmpc.mpc_examples("invpend")
mpc.setup()
t0 = time.perf_counter()
pr = cProfile.Profile(); pr.enable()
empc = lmpc.build_explicit(mpc, prange=rng_e)
pr.disable()
print('regions', len(empc.regions), 'in', time.perf_counter()-t0, 's')
st = pstats.Stats(pr)
st.sort_stats('cumulative').print_stats(18)
