"""SE(3)-equivariant basis: real spherical harmonics + Clebsch-Gordan.

TPU-native equivalent of the reference SE3Transformer's basis stack
(``DGLPyTorch/DrugDiscovery/SE3Transformer/se3_transformer/model/
basis.py`` — which outsources the math to e3nn ``o3.spherical_harmonics``
/ ``o3.wigner_3j``). Everything is derived from first principles here:

- complex spherical harmonics via associated-Legendre recursion
  (Condon-Shortley), evaluated in real arithmetic as the standard real SH
  (m>0 -> cos, m<0 -> sin branches);
- Clebsch-Gordan coefficients from Racah's closed form (exact factorial
  arithmetic via python ints, computed once in numpy at trace time);
- the real-basis intertwiners Q^{J}_{(d_in,d_out)} by conjugating the
  complex CG with the complex->real change-of-basis U_l. The conjugated
  matrix is purely real or purely imaginary depending on the parity of
  (J + d_in + d_out); either part spans the same 1-D intertwiner space,
  so the non-vanishing one is taken and the other asserted ~0.

``se3_basis`` then matches the reference ``get_basis_script`` contract:
basis['{d_in},{d_out}'] of shape (..., 2*d_in+1, n_freq, 2*d_out+1) with
n_freq = d_in + d_out - |d_in - d_out| + 1, built as
einsum(Y_J, Q_J) stacked over J — equation (8) of the SE(3)-Transformer
paper. Correctness is pinned by rotation-equivariance golden tests
(``tests/test_se3.py``), which any convention error breaks.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["real_spherical_harmonics", "clebsch_gordan_real", "se3_basis",
           "degree_to_dim"]


def degree_to_dim(d: int) -> int:
    return 2 * d + 1


# ---------------------------------------------------------------------------
# real spherical harmonics (jnp, differentiable, jit-safe)
# ---------------------------------------------------------------------------


def _assoc_legendre(l_max: int, z, one_minus_z2):
    """P_l^m(z) for 0 <= m <= l <= l_max with Condon-Shortley phase.
    Returns dict (l, m) -> array. ``one_minus_z2`` = 1 - z^2 (= sin^2)."""
    p = {(0, 0): jnp.ones_like(z)}
    # clamp: sqrt has an infinite derivative at 0, which turns pole-aligned
    # (or zero) relative positions into NaN gradients
    sin_t = jnp.sqrt(jnp.clip(one_minus_z2, 1e-12, None))
    for m in range(1, l_max + 1):
        # P_m^m = (-1)^m (2m-1)!! sin^m
        p[(m, m)] = (-1) ** m * math.prod(range(1, 2 * m, 2)) * sin_t ** m
    for m in range(0, l_max):
        p[(m + 1, m)] = (2 * m + 1) * z * p[(m, m)]
    for m in range(0, l_max + 1):
        for l in range(m + 2, l_max + 1):
            p[(l, m)] = ((2 * l - 1) * z * p[(l - 1, m)]
                         - (l + m - 1) * p[(l - 2, m)]) / (l - m)
    return p


def real_spherical_harmonics(vec, l_max: int) -> list:
    """Real SH of unit(vec) for l = 0..l_max.

    vec (..., 3). Returns [ (..., 2l+1) ] ordered m = -l..l:
      m < 0: (-1)^m sqrt(2) N_{l|m|} P_l^{|m|}(cos t) sin(|m| phi)
      m = 0: N_{l0} P_l^0(cos t)
      m > 0: (-1)^m sqrt(2) N_{lm} P_l^m(cos t) cos(m phi)
    with N_lm = sqrt((2l+1)/(4 pi) (l-m)!/(l+m)!).
    Zero vectors produce finite (unnormalized-z) values, mask externally.
    """
    r = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    unit = vec / jnp.maximum(r, 1e-12)
    x, y, z = unit[..., 0], unit[..., 1], unit[..., 2]
    phi = jnp.arctan2(y, x)
    p = _assoc_legendre(l_max, z, x * x + y * y)
    out = []
    for l in range(l_max + 1):
        cols = []
        for m in range(-l, l + 1):
            am = abs(m)
            n = math.sqrt((2 * l + 1) / (4 * math.pi)
                          * math.factorial(l - am) / math.factorial(l + am))
            if m == 0:
                cols.append(n * p[(l, 0)])
            elif m > 0:
                cols.append((-1) ** m * math.sqrt(2) * n * p[(l, m)]
                            * jnp.cos(m * phi))
            else:
                cols.append((-1) ** am * math.sqrt(2) * n * p[(l, am)]
                            * jnp.sin(am * phi))
        out.append(jnp.stack(cols, axis=-1))
    return out


# ---------------------------------------------------------------------------
# Clebsch-Gordan (numpy, exact, cached)
# ---------------------------------------------------------------------------


def _cg_complex(l1: int, l2: int, l3: int) -> np.ndarray:
    """<l1 m1 l2 m2 | l3 m3> via Racah's formula (exact integer factorials).
    Returns (2*l3+1, 2*l1+1, 2*l2+1) indexed [m3, m1, m2]."""
    f = math.factorial
    out = np.zeros((2 * l3 + 1, 2 * l1 + 1, 2 * l2 + 1))
    pref_sq = (2 * l3 + 1) * f(l3 + l1 - l2) * f(l3 - l1 + l2) \
        * f(l1 + l2 - l3) / f(l1 + l2 + l3 + 1)
    for m1 in range(-l1, l1 + 1):
        for m2 in range(-l2, l2 + 1):
            m3 = m1 + m2
            if abs(m3) > l3:
                continue
            s_sq = f(l3 + m3) * f(l3 - m3) * f(l1 - m1) * f(l1 + m1) \
                * f(l2 - m2) * f(l2 + m2)
            total = 0.0
            for k in range(0, l1 + l2 - l3 + 1):
                denoms = (k, l1 + l2 - l3 - k, l1 - m1 - k, l2 + m2 - k,
                          l3 - l2 + m1 + k, l3 - l1 - m2 + k)
                if any(d < 0 for d in denoms):
                    continue
                total += (-1) ** k / math.prod(f(d) for d in denoms)
            out[m3 + l3, m1 + l1, m2 + l2] = \
                math.sqrt(pref_sq * s_sq) * total
    return out


def _real_basis_u(l: int) -> np.ndarray:
    """Unitary U_l with v_real = U_l v_complex (rows real m, cols complex
    m', both ordered -l..l)."""
    u = np.zeros((2 * l + 1, 2 * l + 1), complex)
    u[l, l] = 1.0
    s2 = 1.0 / math.sqrt(2)
    for m in range(1, l + 1):
        u[l + m, l + m] = (-1) ** m * s2  # real cos row
        u[l + m, l - m] = s2
        u[l - m, l - m] = 1j * s2  # real sin row
        u[l - m, l + m] = -1j * (-1) ** m * s2
    return u


@lru_cache(maxsize=None)
def clebsch_gordan_real(j: int, d_in: int, d_out: int) -> np.ndarray:
    """Real-basis intertwiner Q: (2j+1, 2*d_in+1, 2*d_out+1) such that
    out[m_out] = sum Q[m_j, m_in, m_out] * Y_j[m_j] * feat_in[m_in] is
    equivariant (the reference's permuted ``o3.wigner_3j`` role)."""
    c = _cg_complex(j, d_in, d_out)  # [m_out, m_j, m_in]
    u_out = _real_basis_u(d_out)
    u_j = np.conj(_real_basis_u(j))
    u_in = np.conj(_real_basis_u(d_in))
    cr = np.einsum("Mm,mjk,Jj,Kk->MJK", u_out, c, u_j, u_in)
    re, im = np.real(cr), np.imag(cr)
    if np.abs(im).max() > np.abs(re).max():
        assert np.abs(re).max() < 1e-10, (j, d_in, d_out)
        q = im
    else:
        assert np.abs(im).max() < 1e-10, (j, d_in, d_out)
        q = re
    return np.ascontiguousarray(q.transpose(1, 2, 0))  # [m_j, m_in, m_out]


def se3_basis(rel_pos, max_degree: int) -> dict:
    """Pairwise equivariant bases (reference ``get_basis``).

    rel_pos (..., 3). Returns {'{d_in},{d_out}':
    (..., 2*d_in+1, n_freq, 2*d_out+1)} where freq J runs over
    |d_in - d_out| .. d_in + d_out.
    """
    sh = real_spherical_harmonics(rel_pos, 2 * max_degree)
    basis = {}
    for d_in in range(max_degree + 1):
        for d_out in range(max_degree + 1):
            ks = []
            for j in range(abs(d_in - d_out), d_in + d_out + 1):
                q = jnp.asarray(clebsch_gordan_real(j, d_in, d_out),
                                sh[0].dtype)
                ks.append(jnp.einsum("...j,jik->...ik", sh[j], q))
            basis[f"{d_in},{d_out}"] = jnp.stack(ks, axis=-2)
    return basis
