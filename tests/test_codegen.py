"""Generated-C differential tests: compile with gcc, load via ctypes, and
compare against the Python path (reference test/runtests.jl:69-117,
627-733, 924-948). Skipped gracefully when gcc is unavailable."""

import ctypes
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

import linearmpc_tpu as lmpc
from linearmpc_tpu.codegen import codegen_c, export_compiled, load_compiled
from linearmpc_tpu.mpc import MPC

GOLDEN_U = 1.7612519326

needs_gcc = pytest.mark.skipif(shutil.which("gcc") is None, reason="gcc not available")


def _build(mpc, tmpdir, **kw):
    cpath = codegen_c(mpc, tmpdir, **kw)
    so = f"{tmpdir}/mpctest.so"
    subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so, cpath, "-lm"], check=True)
    return ctypes.CDLL(so)


def _cc(lib, x, r, d=None, np_=0, ct=ctypes.c_double):
    u = np.zeros(8)
    arr = lambda v: (ct * len(v))(*v) if v is not None and len(v) else None
    ubuf = (ct * 8)()
    args = [ubuf, arr(list(x)), arr(list(r)) if r is not None else None,
            arr(list(d)) if d is not None else None]
    lib.mpc_compute_control(*args)
    return np.array(ubuf[:])


@needs_gcc
def test_codegen_invpend_golden(tmp_path):
    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    lib = _build(mpc, str(tmp_path))
    u = _cc(lib, [5.0, 5.0, 0.0, 0.0], [0.0, 0.0])
    assert abs(u[0] - GOLDEN_U) < 1e-6


@needs_gcc
def test_codegen_matches_python_sampled(tmp_path):
    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    lib = _build(mpc, str(tmp_path))
    rng = np.random.default_rng(2)
    for _ in range(25):
        x = rng.uniform(-10, 10, 4)
        r = rng.uniform(-10, 10, 2)
        u_py = mpc.compute_control(x, r=r, uprev=[0.0])
        u_c = _cc(lib, x, r)
        assert abs(u_py[0] - u_c[0]) < 1e-8


@needs_gcc
def test_codegen_settings_passthrough(tmp_path):
    """Solver settings flow from ``settings.solver_opts`` into the emitted
    C defines and change embedded-solver behavior (reference passes
    opt_settings into DAQP.codegen, src/codegen.jl:25-28): a huge
    primal_tol makes the C solver accept the unconstrained iterate, so
    the returned control must differ from the tight-tolerance golden."""
    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.settings.solver_opts["primal_tol"] = 50.0
    mpc.settings.solver_opts["iter_limit"] = 7
    mpc.setup()
    cpath = codegen_c(mpc, str(tmp_path / "loose"))
    text = open(cpath.replace(".c", ".h")).read()
    assert "#define MPC_PRIMAL_TOL 50" in text
    assert "#define MPC_ITER_LIMIT 7" in text
    so = f"{tmp_path}/loose.so"
    subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so, cpath, "-lm"], check=True)
    u_loose = _cc(ctypes.CDLL(so), [5.0, 5.0, 0.0, 0.0], [0.0, 0.0])

    mpc2, _ = lmpc.mpc_examples("invpend")
    mpc2.setup()
    lib = _build(mpc2, str(tmp_path / "tight"))
    u_tight = _cc(lib, [5.0, 5.0, 0.0, 0.0], [0.0, 0.0])
    assert abs(u_tight[0] - GOLDEN_U) < 1e-6
    # the loose tolerance accepts the input-bound-violating iterate
    assert abs(u_loose[0] - u_tight[0]) > 1e-3


@needs_gcc
def test_codegen_single_precision(tmp_path):
    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    cpath = codegen_c(mpc, str(tmp_path), float_type="single")
    so = f"{tmp_path}/mpctest32.so"
    subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so, cpath, "-lm"], check=True)
    lib = ctypes.CDLL(so)
    u = _cc(lib, [5.0, 5.0, 0.0, 0.0], [0.0, 0.0], ct=ctypes.c_float)
    assert abs(u[0] - GOLDEN_U) < 1e-3  # single precision tolerance


@needs_gcc
def test_codegen_observer(tmp_path):
    """(reference test/runtests.jl:924-948)"""
    mpc, _ = lmpc.mpc_examples("invpend", 50, 5)
    mpc.set_state_observer(Q=1e2 * np.array([1e-3, 1, 1e-3, 1]), R=[1, 0.1])
    mpc.setup()
    lib = _build(mpc, str(tmp_path))

    rng = np.random.default_rng(4)
    x = rng.standard_normal(4)
    u = rng.standard_normal(1)
    y = np.zeros(2)

    mpc.set_state(x)
    xref1 = mpc.state_observer.predict(u).copy()
    xref2 = mpc.state_observer.correct(y).copy()

    ct = ctypes.c_double
    xc = (ct * 4)(*x)
    lib.mpc_predict_state(xc, (ct * 1)(*u), None)
    assert np.linalg.norm(np.array(xc[:]) - xref1) < 1e-9
    lib.mpc_correct_state(xc, (ct * 2)(*y), None)
    assert np.linalg.norm(np.array(xc[:]) - xref2) < 1e-9


@needs_gcc
def test_codegen_soft_constraints(tmp_path):
    mpc, _ = lmpc.mpc_examples("dcmotor")
    mpc.setup()
    lib = _build(mpc, str(tmp_path))
    rng = np.random.default_rng(7)
    for _ in range(10):
        x = rng.uniform(-2, 2, 4)
        r = rng.uniform(-1, 1, 2)
        u_py = mpc.compute_control(x, r=r, uprev=[0.0])
        u_c = _cc(lib, x, r)
        assert abs(u_py[0] - u_c[0]) < 1e-7


def test_export_compiled_roundtrip(tmp_path):
    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    path = str(tmp_path / "invpend.jaxexport")
    meta = export_compiled(mpc, path, batch=32)
    fn = load_compiled(path)
    theta = mpc.form_parameter([5.0, 5.0, 0.0, 0.0], uprev=[0.0])
    thetas = np.tile(theta, (32, 1))
    U, iters, status = fn(thetas)
    assert np.all(np.asarray(status) == 1)
    assert abs(np.asarray(U)[0, 0] - GOLDEN_U) < 1e-6


@needs_gcc
def test_codegen_explicit(tmp_path):
    """Explicit-MPC generated C matches the Python evaluator and the golden
    value (reference test/runtests.jl:184-196)."""
    from linearmpc_tpu.explicit import build_explicit
    from linearmpc_tpu.codegen import codegen_c_explicit

    mpc, rng_box = lmpc.mpc_examples("invpend")
    mpc.setup()
    empc = build_explicit(mpc, prange=rng_box)
    cpath = codegen_c_explicit(empc, str(tmp_path))
    so = f"{tmp_path}/empc.so"
    subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so, cpath, "-lm"], check=True)
    lib = ctypes.CDLL(so)
    u = _cc(lib, [5.0, 5.0, 0.0, 0.0], [0.0, 0.0])
    assert abs(u[0] - GOLDEN_U) < 1e-6

    rng = np.random.default_rng(12)
    for _ in range(20):
        x = rng.uniform(-10, 10, 4)
        r = rng.uniform(-10, 10, 2)
        theta = mpc.form_parameter(x, r=r, uprev=[0.0])
        u_py = empc.evaluate(theta)
        if u_py is None:
            continue
        u_c = _cc(lib, x, r)
        assert abs(u_py[0] - u_c[0]) < 1e-8


def test_checkpoint_roundtrip(tmp_path):
    from linearmpc_tpu.checkpoint import load_problem, save_problem

    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    path = str(tmp_path / "invpend_problem.npz")
    save_problem(mpc, path)
    qp, ldp, meta, K, engine = load_problem(path)
    theta = mpc.form_parameter([5.0, 5.0, 0.0, 0.0], uprev=[0.0])
    U, fval, flag, _ = engine.solve(theta)
    assert flag == 1
    assert abs(U[0] - K @ theta[:4] - GOLDEN_U) < 1e-6


def test_explicit_checkpoint_roundtrip(tmp_path):
    from linearmpc_tpu.checkpoint import load_explicit, save_explicit
    from linearmpc_tpu.explicit import build_explicit

    mpc, rng_box = lmpc.mpc_examples("invpend")
    mpc.setup()
    empc = build_explicit(mpc, prange=rng_box)
    path = str(tmp_path / "empc.npz")
    save_explicit(empc, path)
    empc2 = load_explicit(path)
    theta = mpc.form_parameter([5.0, 5.0, 0.0, 0.0], uprev=[0.0])
    u = empc2.evaluate(theta)
    assert u is not None and abs(u[0] - GOLDEN_U) < 1e-6


def test_profiling_instrument():
    from linearmpc_tpu.profiling import instrument

    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    stats = instrument(mpc.engine)
    rng = np.random.default_rng(0)
    thetas = np.hstack([
        rng.uniform(-10, 10, (64, 4)), rng.uniform(-10, 10, (64, 2)),
        rng.uniform(-2, 2, (64, 1)),
    ])
    mpc.engine.solve_batch(thetas)
    mpc.engine.solve_batch(thetas)
    assert stats.n_calls == 2 and stats.n_solves == 128
    s = stats.summary()
    assert s["converged_frac"] == 1.0 and s["solves_per_s"] > 0


@needs_gcc
def test_codegen_warm_start(tmp_path):
    """Warm-started generated C gives the identical control and converges in
    fewer iterations on the repeated call (reference DAQP_WARMSTART mode,
    src/codegen.jl:167-169 and cold-vs-warm test test/runtests.jl:85-117)."""
    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    lib = _build(mpc, str(tmp_path), warm_start=True)

    x = [5.0, 5.0, 0.0, 0.0]
    r = [0.0, 0.0]
    u_cold = _cc(lib, x, r)
    it_cold = lib.mpc_last_iterations()
    assert abs(u_cold[0] - GOLDEN_U) < 1e-6
    u_warm = _cc(lib, x, r)
    it_warm = lib.mpc_last_iterations()
    assert abs(u_warm[0] - u_cold[0]) < 1e-12
    assert it_warm < it_cold

    # nearby states keep the benefit; answers still match Python
    rng = np.random.default_rng(5)
    for _ in range(10):
        xk = np.asarray(x) + rng.uniform(-0.5, 0.5, 4)
        u_py = mpc.compute_control(xk, r=r, uprev=[0.0])
        u_c = _cc(lib, xk, r)
        assert abs(u_py[0] - u_c[0]) < 1e-8

    lib.mpc_reset_warmstart()
    u_reset = _cc(lib, x, r)
    assert abs(u_reset[0] - u_cold[0]) < 1e-12
    assert lib.mpc_last_iterations() == it_cold


@needs_gcc
def test_codegen_closed_loop_uprev(tmp_path):
    """Closed-loop C rollout with mpc_set_uprev between steps matches the
    Python loop that threads uprev (Rr makes uprev enter theta)."""
    import ctypes

    mpc, _ = lmpc.mpc_examples("invpend")
    mpc.setup()
    lib = _build(mpc, str(tmp_path), warm_start=True)

    ct = ctypes.c_double
    x = np.array([2.0, 1.0, 0.0, 0.0])
    x_py = x.copy()
    uprev = np.zeros(1)
    for _ in range(25):
        u_py = mpc.compute_control(x_py, r=[0.0, 0.0])  # threads mpc.uprev
        lib.mpc_set_uprev((ct * 1)(*uprev))
        u_c = _cc(lib, x, [0.0, 0.0])
        assert abs(u_py[0] - u_c[0]) < 1e-8
        uprev = np.array([u_c[0]])
        x = mpc.model.F @ x + mpc.model.G @ uprev
        x_py = mpc.model.F @ x_py + mpc.model.G @ np.atleast_1d(u_py)


@needs_gcc
def test_codegen_hybrid_bnb(tmp_path):
    """Hybrid (binary-control) generated C: the embedded branch-and-bound
    matches the Python B&B path and puts binaries on their bounds
    (reference test/runtests.jl:836-857, DAQP_BNB)."""
    mpc, _ = lmpc.mpc_examples("satellite", 10)
    mpc.setup()
    assert mpc.mpQP.has_binaries
    lib = _build(mpc, str(tmp_path))

    rng = np.random.default_rng(11)
    n_checked = 0
    for _ in range(12):
        x = rng.uniform(-0.3, 0.3, 3)
        r = rng.uniform(-0.4, 0.4, 3)
        u_py = mpc.compute_control(x, r=r, uprev=np.zeros(3))
        mpc.uprev = None
        u_c = _cc(lib, x, r)
        assert np.max(np.abs(u_py[:3] - u_c[:3])) < 1e-6, (u_py[:3], u_c[:3])
        for bin_id in mpc.binary_controls:
            assert (abs(u_c[bin_id] - mpc.umin[bin_id]) < 1e-6
                    or abs(u_c[bin_id] - mpc.umax[bin_id]) < 1e-6)
        n_checked += 1
    assert n_checked == 12


@needs_gcc
def test_codegen_reference_preview_full(tmp_path):
    """C codegen with full (uncondensed) reference preview matches Python
    (reference test/runtests.jl:627-668)."""
    from linearmpc_tpu.mpc import MPC as _MPC

    A = np.array([[1.0, 1], [0, 1]])
    B = np.array([[0.0], [1]])
    mpc = _MPC.from_discrete(A, B, C=np.eye(2), Np=5, Nc=3)
    mpc.set_bounds(umin=[-2.0], umax=[2.0])
    mpc.set_objective(Q=[1.0, 1.0], R=[0.1])
    mpc.settings.reference_preview = True
    mpc.setup()

    r_traj = np.array([[0.0, 0.5, 1.0, 1.0, 1.0], [0.0, 0.0, 0.0, 0.0, 0.0]])
    x = np.array([1.0, 0.0])
    u_py = mpc.compute_control(x, r=r_traj)

    cpath = lmpc.codegen_c(mpc, str(tmp_path))
    so = f"{tmp_path}/t.so"
    subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so, cpath, "-lm"], check=True)
    lib = ctypes.CDLL(so)
    ct = ctypes.c_double
    u = (ct * 1)()
    r_flat = np.asarray(r_traj.T.ravel(), dtype=np.float64)  # column-major trajectory
    lib.mpc_compute_control(u, (ct * 2)(*x), (ct * len(r_flat))(*r_flat), None)
    assert abs(u[0] - u_py[0]) < 1e-8


@needs_gcc
@pytest.mark.slow
def test_codegen_explicit_bst_large(tmp_path):
    """O(log R) BST evaluation in generated C, differential-tested on a
    >1000-region controller (reference parity: ParametricDAQP's generated
    tree, src/codegen.jl:62-137). The exact-split build guarantees the
    descent finds the containing region without the full-scan fallback."""
    from linearmpc_tpu.codegen import codegen_c_explicit
    from linearmpc_tpu.explicit import build_explicit

    mpc, rng_box = lmpc.mpc_examples("invpend", 50, 11)
    mpc.setup()
    empc = build_explicit(mpc, prange=rng_box, max_regions=20000)
    assert len(empc.regions) > 1000
    empc.build_tree()
    _A, bst_b, _k, leaf_off, _lr, depth, _root = empc.bst_arrays()
    # the tree must be worth the name: log-ish depth, bounded leaves
    assert depth <= 24 and len(bst_b) < 4 * len(empc.regions)

    cpath = codegen_c_explicit(empc, str(tmp_path))
    so = f"{tmp_path}/empc_big.so"
    subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so, cpath, "-lm"], check=True)
    lib = ctypes.CDLL(so)

    rng = np.random.default_rng(21)
    n_checked = 0
    for _ in range(300):
        x = rng.uniform(-12, 12, 4)
        r = rng.uniform(-12, 12, 2)
        theta = mpc.form_parameter(x, r=r, uprev=[0.0])
        u_py = empc.evaluate(theta)
        if u_py is None:
            continue
        u_c = _cc(lib, x, r)
        assert abs(u_py[0] - u_c[0]) < 1e-8
        n_checked += 1
    assert n_checked > 200
