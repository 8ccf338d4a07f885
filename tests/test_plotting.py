"""Exercise utils/plotting.py (matplotlib-gated) — the figure types the
reference commits as golden images (qErrorVsStepSize.png,
LeapfrogSolarSystem.png; regenerator: docs/figures/make_figures.py)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from physicsbasedbayesianinference_tpu.utils import plotting  # noqa: E402


def test_plot_trajectories(tmp_path):
    x = np.cumsum(np.random.RandomState(0).randn(50, 3, 3), axis=0)
    out = tmp_path / "traj.png"
    fig = plotting.plot_trajectories(x, body_names=["a", "b", "c"],
                                     save_path=str(out))
    assert out.exists() and out.stat().st_size > 0
    fig.clf()


def test_plot_error_vs_stepsize(tmp_path):
    dts = np.geomspace(1e-3, 0.1, 5)
    out = tmp_path / "err.png"
    fig = plotting.plot_error_vs_stepsize(
        dts, {"leapfrog": dts**2, "yoshida4": dts**4}, save_path=str(out))
    assert out.exists() and out.stat().st_size > 0
    fig.clf()


def test_plot_samples_and_energy(tmp_path):
    rng = np.random.RandomState(1)
    fig = plotting.plot_samples(rng.randn(100, 2),
                                reference_samples=rng.randn(100, 2),
                                save_path=str(tmp_path / "s.png"))
    fig.clf()
    fig = plotting.plot_energy_drift(np.arange(10.0), 1.0 + 1e-4 *
                                     rng.randn(10),
                                     save_path=str(tmp_path / "e.png"))
    fig.clf()
    assert (tmp_path / "s.png").exists() and (tmp_path / "e.png").exists()


def test_lazy_plotting_attribute():
    """utils.plotting must be reachable through the lazy __getattr__
    without infinite recursion (regression: _handle_fromlist re-entry)."""
    import physicsbasedbayesianinference_tpu.utils as utils
    assert hasattr(utils.plotting, "plot_trajectories")
