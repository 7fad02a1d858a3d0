"""Plot-recipe coverage (reference test/runtests.jl:1430-1498)."""

import numpy as np

import linearmpc_tpu as lmpc
from linearmpc_tpu.explicit import build_explicit
from linearmpc_tpu.plotting import plot_explicit_partition, plot_simulation


def test_plot_simulation():
    mpc, _ = lmpc.mpc_examples("invpend")
    sim = lmpc.simulate_kw(mpc, x0=[0, 0, 0.15, 0], N=30, r=[0.0, 0.0])
    fig = plot_simulation(sim)
    assert len(fig.axes) == 3  # 2 outputs + 1 input
    fig = plot_simulation(sim, xids=[0, 2])
    assert len(fig.axes) == 5


def test_plot_explicit_partition():
    mpc, rng = lmpc.mpc_examples("invpend")
    mpc.setup()
    empc = build_explicit(mpc, prange=rng)
    fig = plot_explicit_partition(empc, parameters=(0, 1))
    assert fig is not None


def test_plot_explicit_feedback_surface():
    """PWA feedback surface (reference src/explicit.jl:97-133 plots both
    the partition and the feedback law)."""
    from linearmpc_tpu.plotting import plot_explicit_feedback

    mpc, rng = lmpc.mpc_examples("invpend")
    mpc.setup()
    empc = build_explicit(mpc, prange=rng)
    fig = plot_explicit_feedback(empc, parameters=(0, 1), control=0)
    assert fig is not None
    ax = fig.axes[0]
    assert ax.name == "3d"
