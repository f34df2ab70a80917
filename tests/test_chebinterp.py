import numpy as np

from autobzcore_tpu.utils.chebinterp import hchebinterp


def test_smooth_function():
    f = lambda x: np.sin(3 * x) + 0.1 * np.cos(17 * x)
    interp = hchebinterp(f, 0.0, 4.0, atol=1e-8)
    xs = np.linspace(0, 4, 1357)
    assert np.max(np.abs(interp(xs) - f(xs))) < 1e-7


def test_peaked_function_refines():
    eta = 1e-3
    f = lambda x: eta / ((x - 0.5377) ** 2 + eta**2)
    interp = hchebinterp(f, 0.0, 1.0, atol=1e-3 / eta * 1e-2)
    xs = np.linspace(0, 1, 20011)
    assert np.max(np.abs(interp(xs) - f(xs))) < 1e-2 / eta
    assert len(interp.panels) > 4  # adaptivity actually kicked in


def test_batched_calls_only():
    calls = []

    def f(xs):
        calls.append(len(xs))
        return np.cos(xs)

    interp = hchebinterp(f, -1.0, 1.0, atol=1e-10)
    assert interp.numevals == sum(calls)
    # frontier batching: few large calls, not many scalar calls
    assert all(c >= 33 for c in calls)
