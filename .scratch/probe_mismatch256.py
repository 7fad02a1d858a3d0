"""Classify m=256 engine/oracle status disagreements with HiGHS.

For each of the first N lanes of the bench's m=256 batch:
  - oracle status s_ref (NumPy f64 active-set, can stall on degeneracy)
  - engine status st (TPU compact tiers)
  - HiGHS feasibility LP (exact verdict on the hard rows)
Buckets:
  FALSE_INFEAS : engine -3 but HiGHS feasible          <- real bug
  FALSE_OPT    : engine 1 but HiGHS infeasible         <- real bug
  ORACLE_STALL : oracle !=1 but HiGHS feasible & engine 1 (KKT-checked)
  UNRESOLVED   : engine -1 on a HiGHS-feasible lane
  OK_INFEAS    : engine -3, oracle !=1, HiGHS infeasible
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import linearmpc_tpu as lmpc
from linearmpc_tpu.ops.reference_solver import solve_ldp_numpy
from scipy.optimize import linprog

def log(*a):
    print(*a, flush=True)

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
ths.block_until_ready()
t0 = time.perf_counter()
sol = e.solve_batch(ths)
sol.U.block_until_ready()
log(f"solve (compile+run) {time.perf_counter()-t0:.0f} s")
st = np.asarray(sol.status)
log(f"resolved {np.mean(st != -1):.5f} opt {np.mean(st==1):.4f} "
    f"infeas {np.mean(st==-3):.4f}; unresolved lanes: {np.where(st==-1)[0][:20]}")

E_n = ldp.HinvET.T @ ldp.H
hard = np.asarray(~ldp.is_immutable & ~ldp.is_soft)

def feasible(theta):
    du_t = np.asarray(ldp.du + ldp.Dth @ theta, np.float64)
    dl_t = np.asarray(ldp.dl + ldp.Dth @ theta, np.float64)
    A = np.vstack([E_n[hard], -E_n[hard]])
    b = np.concatenate([du_t[hard], -dl_t[hard]])
    keep = b < 1e19
    res = linprog(np.zeros(E_n.shape[1]), A_ub=A[keep], b_ub=b[keep],
                  bounds=[(None, None)] * E_n.shape[1], method="highs")
    return res.status == 0

N = 384
buckets = dict(FALSE_INFEAS=[], FALSE_OPT=[], ORACLE_STALL=[],
               UNRESOLVED=[], OK_OPT=0, OK_INFEAS=0, ORACLE_FEAS_ENG_INF=[])
err = 0.0
for i in range(N):
    U_ref, *_r, s_ref = solve_ldp_numpy(ldp, np.asarray(ths[i], np.float64))
    if s_ref == 1 and st[i] == 1:
        buckets["OK_OPT"] += 1
        err = max(err, float(np.max(np.abs(np.asarray(sol.U[i], np.float64) - U_ref))))
        continue
    if s_ref != 1 and st[i] == -3:
        buckets["OK_INFEAS"] += 1
        continue
    f = feasible(np.asarray(ths[i], np.float64))
    if st[i] == -3 and f:
        buckets["FALSE_INFEAS"].append(i)
    elif st[i] == -3:
        buckets["ORACLE_FEAS_ENG_INF"].append(i)  # oracle said 1, HiGHS infeasible?!
    elif st[i] == 1 and not f:
        buckets["FALSE_OPT"].append(i)
    elif st[i] == 1:
        buckets["ORACLE_STALL"].append(i)
    else:
        buckets["UNRESOLVED"].append((i, bool(f)))

log(f"checked {N}: OK_OPT {buckets['OK_OPT']} (err {err:.2e}) "
    f"OK_INFEAS {buckets['OK_INFEAS']}")
log(f"FALSE_INFEAS (engine -3, HiGHS feasible): {buckets['FALSE_INFEAS']}")
log(f"FALSE_OPT    (engine 1, HiGHS infeasible): {buckets['FALSE_OPT']}")
log(f"ORACLE_STALL (engine 1 certified, oracle stalled): {buckets['ORACLE_STALL']}")
log(f"oracle-1/HiGHS-infeas (engine -3): {buckets['ORACLE_FEAS_ENG_INF']}")
log(f"UNRESOLVED (engine -1, (i, HiGHS-feasible)): {buckets['UNRESOLVED']}")
