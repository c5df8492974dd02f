"""Radau IIA tableaux derived numerically for any stage count s ∈ {1,3,5,7}.

Follows the derive-don't-hardcode pattern (cf. the reference's
odesolvers/radau.py:105-135 which derives stage matrices from abscissae): nodes
from the right-Radau polynomial, A from collocation conditions, the real/complex
eigen-structure of A⁻¹ for the transformed Newton systems, the embedded-error
weights E from quadrature order conditions, and the dense-output matrix P from
the collocation polynomial. Everything is computed once at trace time in float64
numpy; a unit test pins the s=3 results to the published RADAU5 constants.

Orders: s stages → order 2s−1 (s=1 implicit Euler, s=3 Radau5, s=5 order 9,
s=7 order 13 — the reference's variable-order ladder, radaute.hpp:263).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np


class RadauTableau(NamedTuple):
    s: int                    # number of stages
    order: int                # 2s - 1
    c: np.ndarray             # [s] abscissae, c[-1] == 1
    a: np.ndarray             # [s, s] Runge-Kutta matrix
    b: np.ndarray             # [s] weights (== a[-1], stiffly accurate)
    mu_real: float            # the real eigenvalue of A⁻¹
    mu_complex: np.ndarray    # [(s-1)//2] complex (conjugate taken, Im < 0)
    t_mat: np.ndarray         # [s, s] W→Z transform (Z = T W)
    ti_mat: np.ndarray        # [s, s] Z→W transform (W = TI Z)
    e: np.ndarray             # [s] embedded-error weights: err ≈ LU⁻¹(f0 + Z·E/h)
    p: np.ndarray             # [s, s] dense-output: Q = Zᵀ·P, y(θ)=y0+Q·[θ,…,θˢ]


def _radau_nodes(s: int) -> np.ndarray:
    """Right-Radau abscissae on (0, 1]: roots of P̃_s − P̃_{s−1} (shifted
    Legendre), which include the endpoint 1."""
    # shifted Legendre on [0,1]: P̃_k(x) = P_k(2x−1)
    from numpy.polynomial import legendre as L

    ck = np.zeros(s + 1)
    ck[s] = 1.0
    ck[s - 1] = -1.0
    # series in Legendre basis of (P_s − P_{s−1})(t), t = 2x−1
    roots_t = L.legroots(ck)
    x = (roots_t + 1.0) / 2.0
    x = np.sort(np.real_if_close(x))
    # force the endpoint exactly
    x[-1] = 1.0
    return x


@lru_cache(maxsize=None)
def radau_tableau(s: int) -> RadauTableau:
    if s == 1:
        # implicit Euler (Radau IIA with one stage)
        c = np.array([1.0])
        a = np.array([[1.0]])
        return RadauTableau(
            s=1, order=1, c=c, a=a, b=a[-1],
            mu_real=1.0, mu_complex=np.zeros(0, complex),
            t_mat=np.array([[1.0]]), ti_mat=np.array([[1.0]]),
            e=np.array([-1.0]),
            p=np.array([[1.0]]),
        )
    if s % 2 == 0:
        raise ValueError("Radau IIA stage count must be odd (1,3,5,7)")

    c = _radau_nodes(s)
    # collocation: Σ_j a_ij c_j^{k-1} = c_i^k / k, k = 1..s
    # ⇒ A·V = R with V[j,k] = c_j^{k-1}, R[i,k] = c_i^k/k ⇒ A = R·V⁻¹
    vand = np.vander(c, s, increasing=True)            # V[j, k] = c_j^k
    rhs = np.stack([c ** k / k for k in range(1, s + 1)], axis=-1)  # [i, k-1]
    a = rhs @ np.linalg.inv(vand)
    b = a[-1]

    ainv = np.linalg.inv(a)
    lam, v = np.linalg.eig(ainv)
    # deterministic ordering: the single real eigenvalue first, then complex
    # pairs by ascending |Im|, keeping the +Im member
    real_idx = int(np.argmin(np.abs(lam.imag)))
    mu_real = float(lam[real_idx].real)
    pos = [i for i in range(s) if i != real_idx and lam[i].imag > 0]
    pos.sort(key=lambda i: abs(lam[i].imag))
    cols = [np.real(v[:, real_idx])]
    mus = []
    for i in pos:
        vec = v[:, i]
        vec = vec / vec[-1] if abs(vec[-1]) > 1e-8 else vec / vec[np.argmax(np.abs(vec))]
        cols.append(np.real(vec))
        cols.append(np.imag(vec))
        # left-row combination TI[2k-1]+i·TI[2k] has eigenvalue conj(λ)
        mus.append(np.conj(lam[i]))
    vr = cols[0]
    vr = vr / vr[-1] if abs(vr[-1]) > 1e-8 else vr / vr[np.argmax(np.abs(vr))]
    cols[0] = vr
    t_mat = np.stack(cols, axis=1)
    ti_mat = np.linalg.inv(t_mat)

    # embedded error: ŷ uses the extra node 0 with weight b̂0 = 1/mu_real
    # (stiff damping); order conditions b̂0·0^{k-1} + Σ b̂_j c_j^{k-1} = 1/k.
    gamma0 = 1.0 / mu_real
    vm = np.vander(c, s, increasing=True).T            # [k-1, j] = c_j^(k-1)
    rhs_b = np.array([1.0 / k for k in range(1, s + 1)])
    rhs_b[0] -= gamma0
    bhat = np.linalg.solve(vm, rhs_b)
    # err_unsmoothed = γ0·h·f0 + (b̂−b)ᵀA⁻¹·Z ; smoothing solve uses
    # (mu_real/h·I − J), so E = mu_real·(b̂−b)ᵀA⁻¹  (then err = LU⁻¹(f0+Z·E/h))
    e = mu_real * (bhat - b) @ ainv

    # dense output: p_i(θ) with p_i(0)=0, p_i(c_j)=δ_ij, degree s ⇒
    # P = (W⁻¹)ᵀ with W[j,q] = c_j^{q+1}
    w = np.stack([c ** (q + 1) for q in range(s)], axis=1)
    p = np.linalg.inv(w).T

    return RadauTableau(
        s=s, order=2 * s - 1, c=c, a=a, b=b,
        mu_real=mu_real, mu_complex=np.asarray(mus),
        t_mat=t_mat, ti_mat=ti_mat, e=e, p=p,
    )
