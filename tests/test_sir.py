"""SIR comparison model sanity."""
import numpy as np

from reina_tpu.models.sir import simulate_sir, sweep_r0


def test_sir_conserves_population():
    ys = np.asarray(simulate_sir(1e6, 100.0, 2.5, 7.0, 200))
    np.testing.assert_allclose(ys.sum(axis=1), 1e6, rtol=1e-5)
    # epidemic happened and burned out
    assert ys[-1, 2] > 0.5e6     # most recovered
    assert ys[-1, 1] < 1000      # infections died down
    # final size below herd-immunity-free total
    assert ys[-1, 2] < 1e6


def test_sir_r0_below_one_no_epidemic():
    ys = np.asarray(simulate_sir(1e6, 100.0, 0.8, 7.0, 100))
    assert ys[:, 1].max() <= 100.0 + 1e-6
    assert ys[-1, 2] < 1000


def test_sweep_vmaps():
    grid = np.asarray(sweep_r0(1e6, 100.0, [0.8, 1.5, 2.5, 4.0], 7.0, 150))
    assert grid.shape == (4, 150, 3)
    finals = grid[:, -1, 2]
    assert (np.diff(finals) > 0).all()  # higher R0 → larger final size
