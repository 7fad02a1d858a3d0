"""Profile build_explicit on CPU: where does the wall time go?"""
import sys; sys.path.insert(0, "/root/repo")
import cProfile, pstats, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import linearmpc_tpu as lmpc

mpc, rng_e = lmpc.mpc_examples("invpend")
mpc.setup()
t0 = time.perf_counter()
empc = lmpc.build_explicit(mpc, prange=rng_e)
t1 = time.perf_counter() - t0
print(f"cold: {len(empc.regions)} regions in {t1:.2f} s", flush=True)
t0 = time.perf_counter()
pr = cProfile.Profile()
pr.enable()
empc = lmpc.build_explicit(mpc, prange=rng_e)
pr.disable()
t1 = time.perf_counter() - t0
print(f"warm: {len(empc.regions)} regions in {t1:.2f} s ({len(empc.regions)/t1:.1f}/s)")
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(25)
