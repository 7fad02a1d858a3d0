"""TPU validation of emulated-f64 Cholesky node relaxations in the
frontier B&B: m=142 first (compile canary), then full m=250."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import linearmpc_tpu as lmpc


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(Np, Nc, B):
    mpc, _ = lmpc.mpc_examples("invpend_contact", Np, Nc)
    mpc.setup(dtype=jnp.float32)
    e = mpc.engine
    log(f"contact Np={Np}: m={e.ldp.m} binaries={int(np.sum(e.ldp.is_binary))} "
        f"pallas={getattr(e, 'frontier_pallas', None)}")
    rng = np.random.default_rng(3)
    ths = rng.uniform(-0.3, 0.3, (B, e.ldp.n_theta))
    t0 = time.perf_counter()
    sol = e.solve_batch(ths)
    sol.U.block_until_ready()
    log(f"  compile+run {time.perf_counter()-t0:.0f} s")
    t0 = time.perf_counter()
    sol = e.solve_batch(ths)
    sol.U.block_until_ready()
    t = time.perf_counter() - t0
    st = np.asarray(sol.status)
    log(f"  {B/t:,.2f} B&B solves/s ({t:.1f} s/batch), optimal "
        f"{np.mean(st == 1):.4f}, mean iters {np.mean(np.asarray(sol.iters)):.0f}")
    return sol, ths, e


if __name__ == "__main__":
    sol, ths, e = run(6, 6, 16)
    # differential vs CPU f64 frontier on 4 lanes
    import subprocess  # noqa: F401  (host check below instead)
    from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy  # noqa
    run(10, 10, 64)
