"""Exact CCSDT residual projections in determinant space (tiny systems).

The ground truth for the triples machinery: with T = T1 + T2 + T3 built as
a nilpotent matrix on the N-electron determinant basis, the full CCSDT
residuals are exact projections

    R_mu = <mu| e^{-T} H e^{T} |0>,   mu in {singles, doubles, triples}

with no factorization assumptions.  Any factorized T3 implementation
(cc/gccsdt_slow.py, the spin-traced production path) is validated against
these numbers term group by term group.  Exponential-in-determinant-space
trick as in cc/eom_slow.py, extended to triple excitations.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

from pyscf_mpcc_tpu.ci.fci_slow import FCI, _excite


def _t_matrix_t3(dets, index, t1, t2, t3, nocc):
    """Matrix of T = T1 + T2 + T3 on the determinant list."""
    nvir = t1.shape[1]
    n = len(dets)
    T = np.zeros((n, n))
    for col, det in enumerate(dets):
        occ_in = [p for p in det if p < nocc]
        vir_free = [a for a in range(nocc, nocc + nvir) if a not in det]
        for i in occ_in:
            for a in vir_free:
                amp = t1[i, a - nocc]
                if amp != 0.0:
                    nd, sgn = _excite(det, (i,), (a,))
                    T[index[nd], col] += sgn * amp
        for (i, j) in combinations(occ_in, 2):
            for (a, b) in combinations(vir_free, 2):
                amp = t2[i, j, a - nocc, b - nocc]
                if amp != 0.0:
                    nd, sgn = _excite(det, (i, j), (a, b))
                    T[index[nd], col] += sgn * amp
        if t3 is None:
            continue
        for (i, j, k) in combinations(occ_in, 3):
            for (a, b, c) in combinations(vir_free, 3):
                amp = t3[i, j, k, a - nocc, b - nocc, c - nocc]
                if amp != 0.0:
                    nd, sgn = _excite(det, (i, j, k), (a, b, c))
                    T[index[nd], col] += sgn * amp
    return T


def _expm_nilpotent(T):
    n = T.shape[0]
    acc = np.eye(n)
    x = np.eye(n)
    for k in range(1, 60):
        x = (x @ T) / k
        acc += x
        if np.abs(x).max() < 1e-16:
            break
    return acc


def residuals(h_so, g_so, t1, t2, t3, nocc, nso):
    """(R1, R2, R3, E_corr_elec_total) exact projections of Hbar.

    R2/R3 are returned as full antisymmetric arrays (value at any index
    ordering, from the i<j<k / a<b<c determinant projections)."""
    nelec = nocc
    f = FCI(h_so, g_so, nelec, nso)
    H = f.hamiltonian(hermitian=False)
    T = _t_matrix_t3(f.dets, f.index, t1, t2, t3, nocc)
    eT = _expm_nilpotent(T)
    emT = _expm_nilpotent(-T)
    Hb = emT @ H @ eT
    hf = tuple(range(nocc))
    col = f.index[hf]
    nvir = nso - nocc
    R1 = np.zeros((nocc, nvir))
    R2 = np.zeros((nocc, nocc, nvir, nvir))
    R3 = np.zeros((nocc, nocc, nocc, nvir, nvir, nvir))
    for i in range(nocc):
        for a in range(nvir):
            det, sgn = _excite(hf, (i,), (nocc + a,))
            R1[i, a] = sgn * Hb[f.index[det], col]
    for (i, j) in combinations(range(nocc), 2):
        for (a, b) in combinations(range(nvir), 2):
            det, sgn = _excite(hf, (i, j), (nocc + a, nocc + b))
            v = sgn * Hb[f.index[det], col]
            for (p, q, sp) in (((i, j), (a, b), 1.0), ((j, i), (a, b), -1.0),
                               ((i, j), (b, a), -1.0), ((j, i), (b, a), 1.0)):
                R2[p[0], p[1], q[0], q[1]] = sp * v
    for (i, j, k) in combinations(range(nocc), 3):
        for (a, b, c) in combinations(range(nvir), 3):
            det, sgn = _excite(hf, (i, j, k),
                               (nocc + a, nocc + b, nocc + c))
            v = sgn * Hb[f.index[det], col]
            from itertools import permutations
            for ph in permutations(range(3)):
                for pp in permutations(range(3)):
                    sh = _parity(ph) * _parity(pp)
                    hidx = tuple((i, j, k)[x] for x in ph)
                    pidx = tuple((a, b, c)[x] for x in pp)
                    R3[hidx + pidx] = sh * v
    e = Hb[col, col]
    return R1, R2, R3, e


def _parity(perm):
    p = 1
    perm = list(perm)
    for x in range(len(perm)):
        for y in range(x + 1, len(perm)):
            if perm[x] > perm[y]:
                p = -p
    return p
