"""Observability: solve counters, timing stats, and XLA profiler traces.

The reference's observability surface is per-step wall time in
``Simulation.solve_times`` plus the solver's discarded info struct
(SURVEY.md section 5). Here the engine can be instrumented to accumulate
batched-solve statistics (solves, iterations, wall time), and
``trace`` wraps ``jax.profiler`` for kernel-level TPU traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class SolveStats:
    n_calls: int = 0
    n_solves: int = 0
    n_converged: int = 0
    total_iters: int = 0
    max_iters: int = 0
    total_time_s: float = 0.0
    batch_times_s: list = field(default_factory=list)

    @property
    def solves_per_s(self) -> float:
        return self.n_solves / self.total_time_s if self.total_time_s > 0 else 0.0

    @property
    def mean_iters(self) -> float:
        return self.total_iters / self.n_solves if self.n_solves else 0.0

    def p99_batch_latency(self) -> float:
        return float(np.percentile(self.batch_times_s, 99)) if self.batch_times_s else 0.0

    def summary(self) -> dict:
        return {
            "calls": self.n_calls,
            "solves": self.n_solves,
            "converged_frac": self.n_converged / self.n_solves if self.n_solves else 1.0,
            "mean_iters": round(self.mean_iters, 3),
            "max_iters": self.max_iters,
            "solves_per_s": round(self.solves_per_s, 1),
            "p99_batch_latency_s": self.p99_batch_latency(),
        }


def instrument(engine) -> SolveStats:
    """Wrap ``engine.solve_batch`` with counters; returns the live stats
    object (also stored as ``engine.stats``)."""
    stats = SolveStats()
    inner = engine.solve_batch

    def wrapped(thetas, warm=None):
        t0 = time.perf_counter()
        sol = inner(thetas, warm=warm)
        sol.U.block_until_ready()
        dt = time.perf_counter() - t0
        st = np.asarray(sol.status)
        it = np.asarray(sol.iters)
        stats.n_calls += 1
        stats.n_solves += len(st)
        stats.n_converged += int((st == 1).sum())
        stats.total_iters += int(it.sum())
        stats.max_iters = max(stats.max_iters, int(it.max()) if len(it) else 0)
        stats.total_time_s += dt
        stats.batch_times_s.append(dt)
        return sol

    engine.solve_batch = wrapped
    engine.stats = stats
    return stats


# -- roofline / MFU accounting ---------------------------------------------
#
# Model FLOP counts for the production Pallas kernels, so benchmarks can
# report achieved-vs-peak (MFU) instead of bare solves/s. All counts are
# per LANE per solver ITERATION; multiply by batch x mean iterations.
# Peaks are matmul peaks for the f32-accurate path: in-kernel dots run at
# HIGHEST precision, which on this stack decomposes each f32 matmul into
# ~6 bf16 MXU passes.

V5E_PEAK_BF16 = 197e12  # TPU v5e MXU peak, bf16 FLOP/s
V5E_PEAK_F32_HIGHEST = V5E_PEAK_BF16 / 6.0


def phase1_flops_per_lane_iter(m: int, n_subsets: int | None = None) -> float:
    """Small-m bulk kernel (ops/pallas_solver.py): the subset-inverse
    gather (m^2, 2^m) @ (2^m, B) dominates; plus G@lam, the one-hot
    expansion, and three first-hit cumsum matmuls."""
    n_subsets = 2**m if n_subsets is None else n_subsets
    gather = 2.0 * m * m * n_subsets   # inv_flat one-hot matmul
    onehot = 2.0 * n_subsets           # mask expansion row
    dense = 2.0 * m * m * 8            # G@lam, ltri first-hits, expands
    return gather + onehot + dense


def iu_flops_per_lane_iter(m: int) -> float:
    """Large-m GI inverse-update kernel (ops/pallas_iu.py): four R-matvecs
    (tile + group-sum one-hot matmuls, 4 m^3 each) and the rank-2 outer
    update (8 m^3), plus O(m^2) dense work."""
    return 24.0 * m**3 + 20.0 * m * m


def iu_bytes_per_lane_iter(m: int) -> float:
    """HBM traffic of the carried inverse per lane-iteration (read+write
    R in f32); the roofline's memory leg."""
    return 2.0 * 4.0 * m * m


def ds_polish_flops_per_lane(m: int, n: int) -> float:
    """Double-single polish kernel (ops/pallas_polish.py), once per solve:
    subset-inverse gather + double-single (Dekker/Veltkamp EFT, ~4x plain
    f32 ops) masked re-solve, primal recovery, and KKT residual."""
    gather = 2.0 * m * m * (2**m)
    eft = 4.0 * (2.0 * m * m + 4.0 * n * m + 2.0 * m * m)
    return gather + eft


def mfu_report(
    solves_per_s: float,
    mean_iters: float,
    flops_per_lane_iter: float,
    *,
    peak_flops: float = V5E_PEAK_F32_HIGHEST,
    bytes_per_lane_iter: float = 0.0,
    peak_bytes: float = 819e9,  # v5e HBM bandwidth
) -> dict:
    """Achieved FLOP/s and MFU for a measured throughput, with the memory
    leg when the kernel carries per-lane state through HBM."""
    fl = solves_per_s * mean_iters * flops_per_lane_iter
    out = {
        "achieved_flops": fl,
        "mfu": fl / peak_flops,
        "model_flops_per_solve": mean_iters * flops_per_lane_iter,
    }
    if bytes_per_lane_iter:
        bw = solves_per_s * mean_iters * bytes_per_lane_iter
        out["achieved_bytes_per_s"] = bw
        out["hbm_util"] = bw / peak_bytes
    return out


# -- why the headline sits near 13M solves/s/chip (roofline argument) -------
#
# The pendulum headline (m=5, n=5, B=32768) is NOT FLOP-limited: the
# phase-1 kernel's model work is ~8 kFLOP/solve, so 13M solves/s is
# ~0.3 TF against a ~33 TF f32-HIGHEST ceiling (MFU ~0.5-1%). The binding
# constraints, measured on v5e (BENCH_r02/r03 and the K-sweep probes in
# round 3):
#
#   1. VPU/issue-bound kernel iterations. A gridless phase-1 iteration at
#      m=5 is ~85% elementwise mask algebra on (m, B) registers -- VPU
#      work at 8x128/cycle, not MXU work. The measured per-iteration cost
#      (~8-11 us per 2048-lane chunk) matches the VPU leg, and the fixed
#      bulk scan runs 2m+20 = 30 iterations regardless of per-lane
#      convergence (no early exit in lockstep cold batches): ~1.2 ms.
#   2. The tiered finishers are a further ~1.3 ms of *dependent* work:
#      the double-single polish re-solves every lane (one more gridless
#      kernel pass over all chunks, ~1 ms) and the f64 straggler tier
#      re-solves the top-256 worst lanes in emulated f64 (~1 ms,
#      partially overlapped by XLA). They cannot start before phase 1
#      finishes (they consume its working sets), so the program's
#      critical path is ~2.5 ms/batch -> 12-13M solves/s.
#
# Paths not taken, with reasons:
#   * >= 2 iterations per kernel dispatch: in-kernel loops (fori/while
#     and even straight-line unrolls) hang or fail this Mosaic stack
#     (CLAUDE.md); the scan-outside-kernel structure is forced.
#   * batched 3D dot_general inside the kernel (would collapse the
#     movement-matrix FLOPs): compiles on this stack but lowers to a
#     serial per-lane loop -- measured 891 us for a (128,60,60)x(128,60)
#     batched matvec vs ~50 us for the whole movement-matrix iteration.
#   * skipping the polish for already-clean lanes: the KKT residual that
#     decides cleanliness is itself computed by the polish kernel.
#
# The honest ceiling statement: at m=5 the solver moves ~100 bytes of
# per-lane state through ~30 VPU-bound iterations plus two finishing
# passes; 12-13M solves/s/chip is within ~2x of the VPU-leg bound for
# this program shape, and 128x the 1e5 target. Larger problems (m >= 24)
# are where the MXU legs engage (see iu_flops_per_lane_iter; the m=48
# line runs at ~20-30% HBM utilization on the carried inverse).


@contextlib.contextmanager
def trace(logdir: str):
    """XLA profiler trace around a block (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
