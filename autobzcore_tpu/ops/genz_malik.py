"""Genz-Malik h-adaptive cubature as a fixed-shape box pool.

Native equivalent of the HCubature.jl kernel the reference drives through
``HCubatureJL`` (``src/algorithms.jl:99-124``).  The degree-7 Genz-Malik rule
with embedded degree-5 error estimate [Genz & Malik, J. Comput. Appl. Math. 6
(1980) 295] is generated host-side per dimension; the adaptive refinement uses
the same worst-first fixed-capacity pool pattern as the GK driver, with each
box recording its preferred split axis from the rule's fourth differences.
"""
from __future__ import annotations

from functools import lru_cache
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.tree import tree_batched_norm, tree_norm
from ..wrappers import AuxValue


@lru_cache(maxsize=None)
def gm_rule(d: int):
    """Points and weights of the degree-7(5) Genz-Malik rule on [-1,1]^d.

    Returns (pts (P,d), w7 (P,), w5 (P,), diff_idx) where diff_idx gives, for
    each dimension i, the indices of (center, +l2 e_i, -l2 e_i, +l3 e_i,
    -l3 e_i) used for the fourth-difference split heuristic.
    """
    if d < 2:
        raise ValueError("Genz-Malik requires d >= 2")
    l2 = np.sqrt(9.0 / 70.0)
    l3 = np.sqrt(9.0 / 10.0)
    l4 = l3
    l5 = np.sqrt(9.0 / 19.0)
    two_d = 2.0**d
    w1 = two_d * (12824.0 - 9120.0 * d + 400.0 * d * d) / 19683.0
    w2 = two_d * 980.0 / 6561.0
    w3 = two_d * (1820.0 - 400.0 * d) / 19683.0
    w4 = two_d * 200.0 / 19683.0
    w5 = 6859.0 / 19683.0
    w1e = two_d * (729.0 - 950.0 * d + 50.0 * d * d) / 729.0
    w2e = two_d * 245.0 / 486.0
    w3e = two_d * (265.0 - 100.0 * d) / 1458.0
    w4e = two_d * 25.0 / 729.0

    pts = [np.zeros(d)]
    wk = [w1]
    we = [w1e]
    idx2 = {}
    idx3 = {}
    for i in range(d):
        for s, lam, store in ((+1, l2, idx2), (-1, l2, idx2), (+1, l3, idx3), (-1, l3, idx3)):
            x = np.zeros(d)
            x[i] = s * lam
            store[(i, s)] = len(pts)
            pts.append(x)
            wk.append(w2 if lam == l2 else w3)
            we.append(w2e if lam == l2 else w3e)
    for i in range(d):
        for j in range(i + 1, d):
            for si, sj in product((+1, -1), repeat=2):
                x = np.zeros(d)
                x[i] = si * l4
                x[j] = sj * l4
                pts.append(x)
                wk.append(w4)
                we.append(w4e)
    for signs in product((+1, -1), repeat=d):
        pts.append(l5 * np.array(signs, dtype=np.float64))
        wk.append(w5)
        we.append(0.0)

    pts = np.array(pts)
    wk = np.array(wk) / 2.0**d  # normalize so rule ~ mean * volume later
    we = np.array(we) / 2.0**d
    diff_idx = np.array(
        [[0, idx2[(i, +1)], idx2[(i, -1)], idx3[(i, +1)], idx3[(i, -1)]] for i in range(d)],
        dtype=np.int32,
    )
    return pts, wk, we, diff_idx


def _err_norm(tree, batch_ndim):
    if isinstance(tree, AuxValue):
        return jnp.maximum(
            tree_batched_norm(tree.val, batch_ndim), tree_batched_norm(tree.aux, batch_ndim)
        )
    return tree_batched_norm(tree, batch_ndim)


def gm_box_eval(batch_f, p, centers, halves, pts, wk, we, diff_idx):
    """Evaluate the GM rule on a batch of boxes.

    centers/halves: (K, d).  Returns (val7 pytree leading K, err (K,),
    splitdim (K,), nevals-per-box)."""
    K, d = centers.shape
    P = pts.shape[0]
    nodes = centers[:, None, :] + halves[:, None, :] * pts[None, :, :]  # (K,P,d)
    flat = nodes.reshape(K * P, d)
    fx = batch_f(flat, p)
    vol = jnp.prod(2.0 * halves, axis=1)  # (K,)

    def reduce_leaf(v, w):
        v = v.reshape((K, P) + v.shape[1:])
        wshape = (1, P) + (1,) * (v.ndim - 2)
        vshape = (K,) + (1,) * (v.ndim - 2)
        return jnp.sum(w.reshape(wshape) * v, axis=1) * vol.reshape(vshape)

    val7 = jax.tree_util.tree_map(lambda v: reduce_leaf(v, wk), fx)
    val5 = jax.tree_util.tree_map(lambda v: reduce_leaf(v, we), fx)
    diff = jax.tree_util.tree_map(lambda a, b: a - b, val7, val5)
    err = _err_norm(diff, 1)
    # zero-volume boxes are DEAD POOL SLOTS (top_k picks them while live
    # boxes < nbisect) whose nodes collapse onto one point, possibly outside
    # the integrand's domain: the evaluation happens (fixed shapes) but its
    # result must not reach the pool — vol=0 only zeroes finite values,
    # NaN * 0 = NaN.  Mask outputs to exactly 0.
    dead = vol == 0

    def mask_leaf(v):
        return jnp.where(dead.reshape((K,) + (1,) * (v.ndim - 1)),
                         jnp.zeros((), v.dtype), v)

    val7 = jax.tree_util.tree_map(mask_leaf, val7)
    err = jnp.where(dead, 0, err)

    # fourth differences per dim for the split heuristic (scalar proxy: norm
    # over result components)
    ratio = (np.sqrt(9.0 / 70.0) / np.sqrt(9.0 / 10.0)) ** 2

    def fourth_diff(v):
        v = v.reshape((K, P) + v.shape[1:])
        comp_axes = tuple(range(2, v.ndim))
        vc = v[:, diff_idx[:, 0]]  # (K,d,...)
        vp2 = v[:, diff_idx[:, 1]]
        vm2 = v[:, diff_idx[:, 2]]
        vp3 = v[:, diff_idx[:, 3]]
        vm3 = v[:, diff_idx[:, 4]]
        dd = (vp2 + vm2 - 2 * vc) - ratio * (vp3 + vm3 - 2 * vc)
        return jnp.sum(jnp.abs(dd) ** 2, axis=comp_axes) if comp_axes else jnp.abs(dd) ** 2

    dd_tot = None
    for leaf in jax.tree_util.tree_leaves(fx):
        t = fourth_diff(leaf)
        dd_tot = t if dd_tot is None else dd_tot + t
    splitdim = jnp.argmax(dd_tot, axis=1).astype(jnp.int32)  # (K,)
    return val7, err, splitdim


def gm_adaptive(
    batch_f, p, a, b, *, cap=2048, nbisect=4, abstol=0.0, reltol=0.0,
    maxiters=None, norm=tree_norm,
):
    """Adaptive Genz-Malik over the box [a, b] (host-static endpoints or traced
    (d,) arrays).  Returns (val, err, numevals, converged)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    d = a.shape[0]
    pts_np, wk_np, we_np, diff_idx = gm_rule(d)
    dt = a.dtype
    pts = jnp.asarray(pts_np, dt)
    wk = jnp.asarray(wk_np, dt)
    we = jnp.asarray(we_np, dt)
    P = pts.shape[0]

    atol = jnp.asarray(abstol, dt)
    rtol = jnp.asarray(reltol, dt)
    from .adaptive import _as_eval_budget

    max_evals = _as_eval_budget(maxiters)

    c0 = ((a + b) / 2)[None, :]
    h0 = ((b - a) / 2)[None, :]
    val0, err0, sd0 = gm_box_eval(batch_f, p, c0, h0, pts, wk, we, diff_idx)

    def pad_leaf(v):
        out = jnp.zeros((cap,) + v.shape[1:], v.dtype)
        return out.at[:1].set(v)

    pool_c = jnp.zeros((cap, d), dt).at[:1].set(c0)
    pool_h = jnp.zeros((cap, d), dt).at[:1].set(h0)
    pool_val = jax.tree_util.tree_map(pad_leaf, val0)
    pool_err = jnp.zeros((cap,), dt).at[:1].set(err0)
    pool_sd = jnp.zeros((cap,), jnp.int32).at[:1].set(sd0)
    from .adaptive import _count_dtype

    n0 = jnp.asarray(1, jnp.int32)
    evals0 = jnp.asarray(P, _count_dtype())

    def totals(pool_val, pool_err):
        tot_val = jax.tree_util.tree_map(lambda v: jnp.sum(v, axis=0), pool_val)
        return tot_val, jnp.sum(pool_err)

    def cond(state):
        _, _, pool_val, pool_err, _, _, evals = state
        tot_val, tot_err = totals(pool_val, pool_err)
        tol = jnp.maximum(atol, rtol * norm(tot_val))
        return (tot_err > tol) & (state[4] + nbisect <= cap) & (evals < max_evals)

    def body(state):
        pool_c, pool_h, pool_val, pool_err, n, pool_sd, evals = state
        _, idx = jax.lax.top_k(pool_err, nbisect)
        cc = pool_c[idx]
        hh = pool_h[idx]
        sd = pool_sd[idx]
        onehot = jax.nn.one_hot(sd, d, dtype=cc.dtype)  # (k,d)
        new_h = hh * (1 - onehot / 2)  # halved along split dim
        off = hh * onehot / 2
        c_left = cc - off
        c_right = cc + off
        ca = jnp.concatenate([c_left, c_right])
        ha = jnp.concatenate([new_h, new_h])
        cval, cerr, csd = gm_box_eval(batch_f, p, ca, ha, pts, wk, we, diff_idx)
        # two sequential scatters (fresh slots win) — a combined scatter has
        # duplicate indices while n < nbisect, with unspecified winner in XLA
        new_idx = n + jnp.arange(nbisect, dtype=n.dtype)
        li = idx.astype(n.dtype)

        def two_scatter(arr, children):
            return arr.at[li].set(children[:nbisect]).at[new_idx].set(children[nbisect:])

        pool_c = two_scatter(pool_c, ca)
        pool_h = two_scatter(pool_h, ha)
        pool_err = two_scatter(pool_err, cerr)
        pool_sd = two_scatter(pool_sd, csd)
        pool_val = jax.tree_util.tree_map(lambda pv, cv: two_scatter(pv, cv), pool_val, cval)
        return (pool_c, pool_h, pool_val, pool_err, n + nbisect, pool_sd,
                evals + 2 * nbisect * P)

    state = (pool_c, pool_h, pool_val, pool_err, n0, pool_sd, evals0)
    state = jax.lax.while_loop(cond, body, state)
    pool_val, pool_err, evals = state[2], state[3], state[6]
    tot_val, tot_err = totals(pool_val, pool_err)
    tol = jnp.maximum(atol, rtol * norm(tot_val))
    return tot_val, tot_err, evals, tot_err <= tol
