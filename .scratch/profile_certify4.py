import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import linearmpc_tpu as lmpc
from linearmpc_tpu.certify import certify
mpc, rng_e = lmpc.mpc_examples("invpend")
mpc.setup()
t0 = time.perf_counter()
cert = certify(mpc, prange=rng_e)
t1 = time.perf_counter() - t0
print(f"default range: {len(cert.partition)} regions, bound {cert.max_iterations}, "
      f"exhausted={cert.exhausted}, {t1:.1f} s", flush=True)
