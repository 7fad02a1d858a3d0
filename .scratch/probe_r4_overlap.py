import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import linearmpc_tpu as lmpc
from linearmpc_tpu.profiling import overlap_report

mpc, _ = lmpc.mpc_examples("invpend")
mpc.setup(dtype=jnp.float32)
rep = overlap_report(mpc)
print({k: (round(v*1e3, 2) if k.endswith("_s") else round(v, 4))
       for k, v in rep.items()}, flush=True)
