import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update('jax_platforms','cpu'); jax.config.update('jax_enable_x64', True)
import numpy as np
import linearmpc_tpu.ops.lp_ipm as lp
import linearmpc_tpu as lmpc

orig = lp._pad_lp
def pad_rows_only(A, b, x0, cs=None):
    B, m, n = A.shape
    m_pad = ((m + 31) // 32) * 32
    if m_pad > m:
        A = np.concatenate([A, np.zeros((B, m_pad - m, n))], axis=1)
        b = np.concatenate([b, 2.0 * np.ones((B, m_pad - m))], axis=1)
    return A, b, x0, cs, B

def pad_lanes_only(A, b, x0, cs=None):
    B = A.shape[0]
    B_pad = 64
    while B_pad < B: B_pad *= 2
    if B_pad > B:
        rep = lambda a: np.concatenate([a, np.broadcast_to(a[0], (B_pad - B,) + a.shape[1:])], axis=0)
        A, b, x0 = rep(A), rep(b), rep(np.asarray(x0))
        if cs is not None and np.ndim(cs) > 1: cs = rep(np.asarray(cs))
    return A, b, x0, cs, B

def ident(A, b, x0, cs=None):
    return A, b, x0, cs, A.shape[0]

for name, fn in (("identity", ident), ("rows", pad_rows_only), ("lanes", pad_lanes_only), ("both", orig)):
    lp._pad_lp = fn
    mpc, rng = lmpc.mpc_examples('invpend')
    empc = lmpc.build_explicit(mpc, prange=rng)
    u = empc.compute_control([5.0, 5, 0, 0])
    print(name, ':', u, len(empc.regions), flush=True)
