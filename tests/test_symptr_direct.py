"""Closed-form cubic-group symmetry reduction vs the generic orbit sweep."""
import numpy as np
import pytest

from autobzcore_tpu.ops.symptr import (
    _canonicalize_numpy,
    as_integer_syms,
    cube_automorphism_syms,
    inversion_syms,
    symptr_rule,
)


@pytest.mark.parametrize("d", [1, 2, 3])
@pytest.mark.parametrize("npt", [7, 8, 16, 21])
def test_cubic_direct_matches_generic(d, npt):
    syms = cube_automorphism_syms(d)
    reps, w = symptr_rule(npt, d, syms)  # closed-form fast path
    # generic orbit canonicalization
    syms_int = as_integer_syms(syms)
    strides = npt ** np.arange(d - 1, -1, -1, dtype=np.int64)
    best = _canonicalize_numpy(npt, d, syms_int, strides, npt**d, 1 << 20)
    counts_all = np.bincount(best, minlength=npt**d)
    lin = np.nonzero(counts_all)[0]
    lin_fast = (reps.astype(np.int64) * strides).sum(axis=1)
    order = np.argsort(lin_fast)
    assert np.array_equal(np.sort(lin_fast), lin)
    assert np.allclose(w[order], counts_all[lin])
    assert w.sum() == npt**d


def test_inversion_group_not_misrouted():
    """The 2^d sign group is NOT the cubic group; it must take the generic
    path and still sum to npt^d."""
    npt, d = 12, 3
    reps, w = symptr_rule(npt, d, inversion_syms(d))
    assert w.sum() == npt**d
    # inversion reduction factor is ~2^d near the generic count
    assert len(reps) > npt**d / 2**d
