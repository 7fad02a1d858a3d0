"""TPU probe: frontier-rounds configs on invpend_contact Np=6 (m=142, the
bench case), B=8. Compares r5 carried-R variants: gate on/off."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops import bnb_frontier as bf

NP = int(sys.argv[1]) if len(sys.argv) > 1 else 6
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
mpc, _ = lmpc.mpc_examples("invpend_contact", NP, NP)
mpc.setup(dtype=jnp.float32)
e = mpc.engine
hi = e.arrays_hi
print(f"m={e.ldp.m} nb={int(np.sum(np.asarray(e.ldp.is_binary)))} "
      f"node_limit={e.bnb_node_limit}", flush=True)
rng = np.random.default_rng(7)
ths = rng.uniform(-0.3, 0.3, (B, e.ldp.n_theta))

kw = dict(stack_cap=2 * 4 * NP + 2, node_limit=e.bnb_node_limit,
          node_cap=2 * e.ldp.m + 24, k_chunk=24, poll_every=4,
          primal_tol=min(e.primal_tol, 1e-6), sign_tol=1e-11)
cfgs = [
    ("default", dict(best_first=True)),
]

for name, extra in cfgs:
    kwx = dict(kw)
    if name.endswith("k48"):
        kwx["k_chunk"] = 48
    solver = bf.make_frontier_rounds(hi, hi, fast_nodes=True, **kwx, **extra)
    t0 = time.perf_counter()
    sol = solver(ths)
    sol.U.block_until_ready()
    dt = time.perf_counter() - t0
    s = solver.last_state
    st = np.asarray(sol.status)
    print(json.dumps({
        "cfg": name, "wall_s": round(dt, 1),
        "iters_mean": float(np.mean(np.asarray(sol.iters))),
        "iters_max": int(np.max(np.asarray(sol.iters))),
        "nodes_mean": float(np.mean(np.asarray(s.nodes))),
        "rounds": solver.rounds,
        "reseeds_mean": float(np.mean(np.asarray(s.reseeds))),
        "status": np.unique(st, return_counts=True)[0].tolist(),
        "counts": np.unique(st, return_counts=True)[1].tolist(),
        "fval0": float(np.asarray(sol.fval)[0]),
    }), flush=True)
