"""Full-covariance GMM colour models for GrabCut, fully vectorised.

The reference relies on cv2.grabCut's internal C++ GMMs (2 classes x 5
full-covariance components over colour; reference src/gcn_grabcut/
grabcut.py:66-67 keeps the 65-float opaque state buffers).  Here the GMMs
are an explicit pytree and every step — k-means++ initialisation, component
assignment, moment re-estimation — is a masked dense reduction over the
pixel grid (no per-pixel loops, no dynamic shapes).

Numerical conventions follow OpenCV's grabCut implementation: covariance
regularisation adds 0.01 to the diagonal when the determinant collapses,
component assignment maximises the weighted component density, and the class
likelihood is the weighted mixture sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

COV_REG = 0.01
DET_EPS = 1e-6
LOG_FLOOR = -80.0


def kmeans(pixels: jnp.ndarray, weight: jnp.ndarray, k: int,
           n_iter: int = 10, seed: int = 0) -> jnp.ndarray:
    """Weighted Lloyd k-means over (H, W, 3) pixels; returns (H, W) labels.

    Initialisation is k-means++ with a fixed key (deterministic), with the
    sampling done by weighted distance argmax over a quasi-random pick —
    fully on-device, static shapes.
    """
    H, W, C = pixels.shape
    flat = pixels.reshape(-1, C).astype(jnp.float32)
    w = weight.reshape(-1).astype(jnp.float32)

    key = jax.random.PRNGKey(seed)
    # First centre: the weighted "median-ish" pixel (max weight wins ties).
    first = jnp.argmax(w)
    centers = jnp.zeros((k, C), jnp.float32).at[0].set(flat[first])

    def pp_step(i, carry):
        centers, key = carry
        # Distance to the nearest of the first (i+1) centres; the others
        # are masked out with +inf.
        d2 = jnp.min(
            jnp.sum((flat[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            + jnp.where(jnp.arange(k)[None, :] <= i, 0.0, jnp.inf), axis=1)
        key, sub = jax.random.split(key)
        # Gumbel-max sampling proportional to w * d2.
        logits = jnp.log(jnp.maximum(w * d2, 1e-30))
        g = jax.random.gumbel(sub, logits.shape)
        nxt = jnp.argmax(logits + g)
        return centers.at[i + 1].set(flat[nxt]), key

    centers, _ = jax.lax.fori_loop(0, k - 1, pp_step, (centers, key))

    def lloyd(_, centers):
        d2 = jnp.sum((flat[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        lab = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(lab, k, dtype=jnp.float32) * w[:, None]
        tot = onehot.T @ flat                       # (k, C)
        cnt = jnp.sum(onehot, axis=0)[:, None]
        new = tot / jnp.maximum(cnt, 1e-6)
        # Empty clusters keep their previous centre.
        return jnp.where(cnt > 0, new, centers)

    centers = jax.lax.fori_loop(0, n_iter, lloyd, centers)
    d2 = jnp.sum((flat[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    return jnp.argmin(d2, axis=1).reshape(H, W)


def _inv3(m: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form inverse + determinant of batched 3x3 matrices."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
    ], -2)
    inv = adj / jnp.maximum(det, DET_EPS)[..., None, None]
    return inv, det


@functools.partial(jax.jit, static_argnames=("k",))
def fit_gmm(pixels: jnp.ndarray, sel: jnp.ndarray, comp: jnp.ndarray,
            k: int) -> dict:
    """Estimate a k-component full-covariance GMM from assigned pixels.

    pixels : (H, W, 3); sel : (H, W) class membership {0,1};
    comp : (H, W) component index in [0, k).
    Returns dict(weights (k,), means (k,3), inv_cov (k,3,3),
                 log_norm (k,) = log w_c - 0.5 log det).
    """
    H, W, C = pixels.shape
    flat = pixels.reshape(-1, C).astype(jnp.float32)
    m = sel.reshape(-1).astype(jnp.float32)
    onehot = jax.nn.one_hot(comp.reshape(-1), k, dtype=jnp.float32) * m[:, None]

    cnt = jnp.sum(onehot, axis=0)                    # (k,)
    total = jnp.maximum(jnp.sum(m), 1.0)
    means = (onehot.T @ flat) / jnp.maximum(cnt, 1.0)[:, None]
    # Second moments → covariance.
    xxT = jnp.einsum("nc,nd,nk->kcd", flat, flat, onehot)
    cov = xxT / jnp.maximum(cnt, 1.0)[:, None, None] \
        - jnp.einsum("kc,kd->kcd", means, means)

    # OpenCV-style regularisation: noisy/degenerate components get extra
    # diagonal variance until the determinant is healthy.
    eye = jnp.eye(C)
    for _ in range(2):
        _, det = _inv3(cov)
        cov = cov + eye * COV_REG * (det < DET_EPS)[:, None, None]

    inv_cov, det = _inv3(cov)
    weights = cnt / total
    log_norm = jnp.where(
        cnt > 0,
        jnp.log(jnp.maximum(weights, 1e-30))
        - 0.5 * jnp.log(jnp.maximum(det, DET_EPS)),
        LOG_FLOOR)
    return dict(weights=weights, means=means, inv_cov=inv_cov,
                log_norm=log_norm, counts=cnt)


def component_scores(pixels: jnp.ndarray, gmm: dict) -> jnp.ndarray:
    """(H, W, k) weighted log component densities (up to a shared const)."""
    d = pixels[..., None, :] - gmm["means"]            # (H, W, k, 3)
    maha = jnp.einsum("...ki,kij,...kj->...k", d, gmm["inv_cov"], d)
    return gmm["log_norm"] - 0.5 * maha


def assign_components(pixels: jnp.ndarray, gmm: dict) -> jnp.ndarray:
    """(H, W) argmax component per pixel (cv2 assignGMMsComponents)."""
    return jnp.argmax(component_scores(pixels, gmm), axis=-1)


def gmm_log_prob(pixels: jnp.ndarray, gmm: dict) -> jnp.ndarray:
    """(H, W) log of the weighted mixture density (up to a shared const).

    The shared (2π)^(3/2) factor cancels between the FG and BG models in
    the graph construction, exactly as in cv2.
    """
    scores = component_scores(pixels, gmm)
    peak = jnp.max(scores, axis=-1)
    lse = peak + jnp.log(jnp.sum(jnp.exp(scores - peak[..., None]), axis=-1))
    return jnp.maximum(lse, LOG_FLOOR)
