"""Replicate frontier round 1 on TPU f64, printing NaN diagnostics."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_enable_x64', True)
if os.environ.get('PCPU'): jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp, linearmpc_tpu as lmpc
from linearmpc_tpu.ops.bnb_frontier import make_xla_relax, PREC

mpc, _ = lmpc.mpc_examples('invpend_contact', 4, 4)
mpc.setup(dtype=jnp.float32)
e = mpc.engine
hi = e.arrays_hi
m = e.ldp.m
B = 8
relax = make_xla_relax(hi, max_iter=2*m+24, primal_tol=1e-6, sign_tol=1e-11,
                       mode="cholesky")
rng = np.random.default_rng(0)
th = jnp.asarray(rng.uniform(-0.3, 0.3, (B, e.ldp.n_theta)), jnp.float64)
du_t = hi.du + th @ hi.Dth.T
dl_t = hi.dl + th @ hi.Dth.T
U0 = hi.u_off + th @ hi.Uth_off.T
f_t = hi.f + th @ hi.f_theta.T
is_bin, is_eq, immut = hi.is_binary, hi.is_eq, hi.is_immutable
up_f, lo_f = hi.up_finite, hi.lo_finite
big = jnp.asarray(1e30, jnp.float64)

@jax.jit
def round1():
    eq_lane = jnp.broadcast_to(is_eq, (B, m))
    lam0 = jnp.zeros((B, m), jnp.float64)
    act0 = jnp.zeros((B, m), bool)
    side0 = jnp.ones((B, m), bool)
    lam, act, side, it, done, infeas = relax(du_t, dl_t, eq_lane, lam0, act0, side0)
    U = U0 - jnp.dot(lam, hi.HinvET.T, precision=PREC)
    fval = (0.5 * jnp.einsum("bi,ij,bj->b", U, hi.H, U, precision=PREC)
            + jnp.sum(f_t * U, axis=1))
    c = jnp.dot(lam, hi.G.T, precision=PREC)
    slack_up = jnp.where(up_f[None, :], du_t + c, big)
    slack_lo = jnp.where(lo_f[None, :], -dl_t - c, big)
    frac = jnp.minimum(slack_up, slack_lo)
    fixed = jnp.zeros((B, m), bool)
    branchable = is_bin[None, :] & ~fixed & ~immut[None, :] & (up_f | lo_f)[None, :]
    fracb = jnp.where(branchable, frac, -big)
    jb = jnp.argmax(fracb, axis=1)
    frac_jb = jnp.take_along_axis(fracb, jb[:, None], axis=1)[:, 0]
    return dict(lam_nan=jnp.isnan(lam).sum(), c_nan=jnp.isnan(c).sum(),
                fval=fval, fval_nan=jnp.isnan(fval).sum(),
                done=done, it=it, frac_jb=frac_jb, jb=jb,
                du_nan=jnp.isnan(du_t).sum(), du_max=jnp.max(jnp.abs(jnp.where(jnp.isinf(du_t), 0, du_t))),
                du_inf=jnp.isinf(du_t).sum(), dl_inf=jnp.isinf(dl_t).sum())

out = {k: np.asarray(v) for k, v in round1().items()}
for k, v in out.items():
    print(k, v, flush=True)
