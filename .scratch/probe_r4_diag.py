"""Classify m=256 disagreement/unresolved lanes: false -3? oracle stall?
How many lanes still bad>1e-8 after each tier?"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy

def log(*a):
    print(*a, file=sys.stderr, flush=True)

mpc, _ = lmpc.mpc_examples("invpend", 63, 8)
mpc.add_constraint(Ax=np.eye(4), lb=-18 * np.ones(4), ub=18 * np.ones(4),
                   ks=range(2, 64))
mpc.setup(dtype=jnp.float32)
e = mpc.engine
ldp = e.ldp
rng = np.random.default_rng(99)
B = 8192
ths = jnp.asarray(np.hstack([
    rng.uniform(-8, 8, (B, 4)), rng.uniform(-8, 8, (B, 2)),
    rng.uniform(-2, 2, (B, 1)),
]), jnp.float64)
sol = e.solve_batch(ths)
sol.U.block_until_ready()
st = np.asarray(sol.status)
U = np.asarray(sol.U, np.float64)
lam = np.asarray(sol.lam, np.float64)
act = np.asarray(sol.active)
side = np.asarray(sol.side)

# host-side f64 KKT check of OUR answers on every lane we claim optimal
G = np.asarray(ldp.G, np.float64)
Dth = np.asarray(ldp.Dth, np.float64)
du = np.asarray(ldp.du, np.float64)
dl = np.asarray(ldp.dl, np.float64)
thn = np.asarray(ths, np.float64)
du_t = du + thn @ Dth.T
dl_t = dl + thn @ Dth.T
c = lam @ G.T
immut = np.asarray(ldp.is_immutable)
inact = (~act) & ~immut
viol = np.maximum(np.where(inact, -(du_t + c), -np.inf),
                  np.where(inact, dl_t + c, -np.inf)).max(axis=1)
sgn = np.where(act & ~np.asarray(ldp.is_eq),
               np.where(side, -lam, lam), -np.inf).max(axis=1)
kkt = np.maximum(viol, sgn)
opt = st == 1
log(f"claimed optimal: {opt.sum()} lanes; worst independent KKT residual "
    f"{np.max(kkt[opt]):.2e}")
log(f"status: opt {np.mean(st==1):.4f} infeas {np.mean(st==-3):.4f} "
    f"unresolved {np.mean(st==-1):.5f} ({np.sum(st==-1)} lanes)")

# classify: run the oracle on unresolved + a sample of infeas lanes
un = np.where(st == -1)[0]
log(f"unresolved lanes: {len(un)}")
cnt = {"oracle_opt": 0, "oracle_infeas": 0, "oracle_stall": 0}
for i in un[:64]:
    _U, *_r, s_ref = solve_ldp_numpy(ldp, thn[i])
    cnt["oracle_opt" if s_ref == 1 else
        "oracle_infeas" if s_ref == -3 else "oracle_stall"] += 1
log(f"  oracle on unresolved: {cnt}")
inf_idx = np.where(st == -3)[0][:96]
cnt2 = {"oracle_opt": 0, "oracle_infeas": 0, "oracle_stall": 0}
worst_err = 0.0
for i in inf_idx:
    _U, *_r, s_ref = solve_ldp_numpy(ldp, thn[i])
    cnt2["oracle_opt" if s_ref == 1 else
         "oracle_infeas" if s_ref == -3 else "oracle_stall"] += 1
log(f"  oracle on our -3 sample: {cnt2}")
# the original 64-lane disagreement set
dis = []
for i in range(64):
    U_ref, *_r, s_ref = solve_ldp_numpy(ldp, thn[i])
    if (s_ref == 1) != (st[i] == 1):
        dis.append((i, int(s_ref), int(st[i])))
log(f"  first-64 disagreements (lane, oracle, ours): {dis}")
