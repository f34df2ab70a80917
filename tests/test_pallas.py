"""Pallas kernel correctness (interpreter mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from autobzcore_tpu.ops.pallas_kernels import _lorentzian_ref, lorentzian_dos


def test_lorentzian_kernel_matches_dense():
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=(700, 3)))
    wgt = jnp.asarray(rng.uniform(1, 3, size=700))
    om = jnp.asarray(np.linspace(-3, 3, 37))
    eta = 0.1
    ref = np.asarray(_lorentzian_ref(e, wgt, om, eta))
    out = np.asarray(lorentzian_dos(e, wgt, om, eta, block_w=16, block_k=128, interpret=True))
    assert np.allclose(out, ref, rtol=1e-12)
