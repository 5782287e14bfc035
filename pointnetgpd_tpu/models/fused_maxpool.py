"""Fused linear -> BatchNorm(train) -> max-over-points without the (B, N, C)
activation ever existing.

The train step is HBM-bandwidth-bound on its two widest stages — the STN's
and the trunk's conv3 (128 -> 1024) followed by BatchNorm and the symmetric
max over the N point axis (reference: PointNetGPD/model/pointnet.py:27-45,
137-154). At batch 128 x 750 points the (B, N, 1024) activation is 393 MB in
fp32, written in the forward and re-read (twice, with its gradient) in the
backward: docs/SCALING.md measures ~12.8 ms of the 14.2 ms fp32 step as this
traffic, and shows plain rematerialization LOSES (the recomputed forward
costs more than it saves).

This module removes the tensor instead of recomputing it:

- FORWARD: a `lax.scan` over N-tiles computes h = x @ W^T + b one tile at a
  time, tracking per-channel running max/argmax AND min/argmin of h plus
  Welford/Chan statistics for the BatchNorm mean/variance. BN is a per-
  channel AFFINE map y = a*h + k with a = gamma * rsqrt(var + eps), so
  max_n(y) = a * max_n(h) + k when a >= 0 and a * min_n(h) + k when a < 0 —
  the max over the normalized activations is recovered exactly from the
  streamed extrema without a second pass.
- BACKWARD (custom VJP): the max routes each channel's cotangent to ONE
  point, so dL/dh is a sparse matrix (one nonzero per (batch, channel))
  plus the BatchNorm coupling through (mean, var). That coupling is rank-
  structured: with u1 = a*sum_b(g)/M and u2 = a*r*sum_b(g*hhat_sel)/M,

      dL/dh = a o G_sel  -  u1  -  u2 o (h - mu)

  and every downstream contraction collapses without materializing h:
      dL/dx = scatter(a*g -> argmax rows) @ W
              - (u1 + u2 o (b - mu)) @ W  -  x @ (W^T diag(u2) W)
      dL/dW = diag(a) (sum_b g x_sel) - (u1 + u2 o (b - mu)) (x) Sx
              - diag(u2) (W @ P),   P = sum_{b,n} x x^T  (F x F)
      dL/db = 0 exactly (BatchNorm absorbs the conv bias),
      dL/dgamma = sum_b g * hhat_sel,   dL/dbeta = sum_b g.

  W^T diag(u2) W and P are (128, 128): the whole backward touches x (the
  conv3 INPUT, 49 MB) and vectors, never a (B, N, 1024) value.

Numerics: statistics accumulate in fp32 via Chan's parallel-variance merge
(stable for bf16 compute inputs); the biased variance normalizes and the
unbiased one feeds the running stats, exactly like models/layers.batchnorm.
The running-stat outputs (mean, biased var) are NON-differentiable buffer
values (torch semantics) — their cotangents are ignored.

Used by `apply_pointnet_cls(..., fused_maxpool=True)` (train mode only);
equivalence with the unfused path is pinned by tests/test_fused_maxpool.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .layers import BN_EPS, BN_MOMENTUM

_TILE = 128
_BIG = 3.0e38  # finite -inf stand-in: -inf would NaN under 0*inf fusions


def _stream_extrema_stats(x, w, b):
    """One pass over N-tiles: per-(B, C) max/argmax/min/argmin of
    h = x @ w^T + b, and per-channel fp32 (count, mean, M2) via Chan merge.

    Returns (hmax, amax, hmin, amin, mean, var_biased)."""
    bsz, n, f = x.shape
    c = w.shape[0]
    nt = -(-n // _TILE)
    pad = nt * _TILE - n
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((bsz, pad, f), x.dtype)], axis=1)
    mask = (jnp.arange(nt * _TILE) < n).reshape(nt, _TILE)
    xt = x.reshape(bsz, nt, _TILE, f).transpose(1, 0, 2, 3)  # (nt, B, T, F)
    offs = jnp.arange(nt, dtype=jnp.int32) * _TILE

    init = (
        jnp.full((bsz, c), -_BIG, x.dtype), jnp.zeros((bsz, c), jnp.int32),
        jnp.full((bsz, c), _BIG, x.dtype), jnp.zeros((bsz, c), jnp.int32),
        jnp.zeros((), jnp.float32),            # count
        jnp.zeros((c,), jnp.float32),          # running mean
        jnp.zeros((c,), jnp.float32),          # running M2
    )

    def step(carry, inp):
        x_t, m_t, off = inp
        hmax, amax, hmin, amin, cnt, mean, m2 = carry
        h = jnp.matmul(x_t, w.T, preferred_element_type=x.dtype) + b
        mk = m_t[None, :, None]                       # (1, T, 1)
        h_mx = jnp.where(mk, h, -_BIG)
        h_mn = jnp.where(mk, h, _BIG)
        t_max = jnp.max(h_mx, axis=1)                 # (B, C)
        t_amax = jnp.argmax(h_mx, axis=1).astype(jnp.int32) + off
        t_min = jnp.min(h_mn, axis=1)
        t_amin = jnp.argmin(h_mn, axis=1).astype(jnp.int32) + off
        better = t_max > hmax
        hmax = jnp.where(better, t_max, hmax)
        amax = jnp.where(better, t_amax, amax)
        worse = t_min < hmin
        hmin = jnp.where(worse, t_min, hmin)
        amin = jnp.where(worse, t_amin, amin)
        # Chan parallel-variance merge, per channel over (B, T) elements
        hf = h.astype(jnp.float32)
        n_t = (jnp.sum(m_t) * bsz).astype(jnp.float32)
        mean_t = jnp.sum(jnp.where(mk, hf, 0.0), axis=(0, 1)) \
            / jnp.maximum(n_t, 1.0)
        m2_t = jnp.sum(
            jnp.where(mk, jnp.square(hf - mean_t), 0.0), axis=(0, 1))
        tot = cnt + n_t
        delta = mean_t - mean
        mean = mean + delta * (n_t / jnp.maximum(tot, 1.0))
        m2 = m2 + m2_t + jnp.square(delta) * (cnt * n_t
                                              / jnp.maximum(tot, 1.0))
        return (hmax, amax, hmin, amin, tot, mean, m2), None

    (hmax, amax, hmin, amin, cnt, mean, m2), _ = jax.lax.scan(
        step, init, (xt, mask, offs))
    var_biased = m2 / jnp.maximum(cnt, 1.0)
    return hmax, amax, hmin, amin, mean, var_biased


def _fused_forward(x, w, b, gamma, beta):
    hmax, amax, hmin, amin, mean, var = _stream_extrema_stats(x, w, b)
    r = jax.lax.rsqrt(var + BN_EPS)                    # (C,) fp32
    a = gamma.astype(jnp.float32) * r
    pos = a >= 0
    h_sel = jnp.where(pos, hmax.astype(jnp.float32), hmin.astype(jnp.float32))
    idx = jnp.where(pos, amax, amin)                    # (B, C) int32
    m = a * (h_sel - mean) + beta.astype(jnp.float32)
    return m.astype(x.dtype), mean, var, h_sel, idx


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def matmul_bn_max(x, w, b, gamma, beta):
    """max over axis 1 of BatchNorm_train(x @ w^T + b), plus the batch
    (mean, biased var) for the running-stat update.

    x: (B, N, F); w: (C, F); b, gamma, beta: (C,).
    Returns (m (B, C) in x.dtype, mean (C,) fp32, var_biased (C,) fp32).
    mean/var outputs are non-differentiable (BN buffer semantics)."""
    m, mean, var, _, _ = _fused_forward(x, w, b, gamma, beta)
    return m, mean, var


def _fwd(x, w, b, gamma, beta):
    m, mean, var, h_sel, idx = _fused_forward(x, w, b, gamma, beta)
    return (m, mean, var), (x, w, b, gamma, mean, var, h_sel, idx)


def _bwd(res, cots):
    g, _g_mean, _g_var = cots          # running-stat cotangents ignored
    x, w, b, gamma, mean, var, h_sel, idx = res
    bsz, n, f = x.shape
    c = w.shape[0]
    m_tot = jnp.asarray(bsz * n, jnp.float32)
    gf = g.astype(jnp.float32)
    r = jax.lax.rsqrt(var + BN_EPS)
    a = gamma.astype(jnp.float32) * r
    s_g = jnp.sum(gf, axis=0)                          # (C,)
    hhat_sel = (h_sel - mean) * r                      # (B, C)
    t_vec = jnp.sum(gf * hhat_sel, axis=0)             # (C,)
    u1 = a * s_g / m_tot
    u2 = a * r * t_vec / m_tot
    wf = w.astype(jnp.float32)
    bf = b.astype(jnp.float32)

    # dL/dx: sparse scatter + constant row + rank-structured quadratic term
    contrib = (a * gf)[..., None] * wf[None]           # (B, C, F)
    dx = jnp.zeros((bsz, n, f), jnp.float32)
    dx = dx.at[jnp.arange(bsz)[:, None], idx].add(contrib)
    const_row = (u1 + u2 * (bf - mean)) @ wf           # (F,)
    q = (wf * u2[:, None]).T @ wf                      # (F, F)
    dx = dx - const_row - jnp.matmul(
        x.astype(jnp.float32), q, preferred_element_type=jnp.float32)

    # dL/dw
    x_sel = jnp.take_along_axis(
        x, idx[..., None].astype(jnp.int32), axis=1)   # (B, C, F)
    dw = a[:, None] * jnp.einsum(
        "bc,bcf->cf", gf, x_sel.astype(jnp.float32))
    sx = jnp.sum(x.astype(jnp.float32), axis=(0, 1))   # (F,)
    p_mat = jnp.einsum("bnf,bng->fg", x.astype(jnp.float32),
                       x.astype(jnp.float32))          # (F, F)
    dw = dw - jnp.outer(u1 + u2 * (bf - mean), sx) - u2[:, None] * (wf @ p_mat)

    db = jnp.zeros((c,), jnp.float32)  # BN absorbs the conv bias exactly
    dgamma = t_vec
    dbeta = s_g
    return (dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype))


matmul_bn_max.defvjp(_fwd, _bwd)


def linear_bn_max(p, s, name: str, bn_name: str, x, *, train: bool,
                  new_state: dict, fused: bool):
    """linear -> batchnorm -> max over the point axis, with the fused
    no-(B,N,C) path when ``fused and train``; otherwise the reference-shaped
    unfused composition (models/layers.py). Threads BN state like
    linear_bn_relu. Returns (B, C)."""
    from .layers import batchnorm, linear

    if not (fused and train):
        h = linear(p[name], x)
        h, ns = batchnorm(p[bn_name], s[bn_name], h, train=train)
        new_state[bn_name] = ns
        return jnp.max(h, axis=1)
    m, mean, var_biased = matmul_bn_max(
        x, p[name]["w"], p[name]["b"],
        p[bn_name]["scale"], p[bn_name]["bias"])
    n_el = x.shape[0] * x.shape[1]
    unbiased = var_biased * (n_el / max(n_el - 1, 1))
    old = s[bn_name]
    new_state[bn_name] = {
        "mean": (1.0 - BN_MOMENTUM) * old["mean"]
        + BN_MOMENTUM * mean.astype(old["mean"].dtype),
        "var": (1.0 - BN_MOMENTUM) * old["var"]
        + BN_MOMENTUM * unbiased.astype(old["var"].dtype),
    }
    return m
