"""Textbook spin-orbital CCSD(T), NumPy reference code.

Perturbative triples in the spin-orbital formulation (Raghavachari et al.,
Chem. Phys. Lett. 157, 479 (1989)): connected and disconnected T3 built
blockwise over occupied triples (i, j, k).  In-repo oracle for the fast
closed-shell (T) kernels (role of pyscf/cc/gccsd_t.py + lib/cc/ccsd_t.c).
"""

from __future__ import annotations

import numpy as np


def kernel(t1, t2, eris, act_hole=None, act_particle=None,
           mode="exclude_active", v_fac=1.0):
    """E(T).  With act_hole/act_particle given, the triples whose six
    indices are all active are excluded ('exclude_active': the fork's
    inactive/environment correction, uccsd_t_inactive_iterative.py:45-51)
    or exclusively kept ('only_active').

    v_fac scales the disconnected (T1) part of V: 1.0 gives CCSD(T),
    2.0 gives QCISD(T) (reference lib/cc/ccsd_t.c QCIsd_t_contract
    passes fac=2.0 into add_and_permute)."""
    nocc = eris.nocc
    f = eris.fock
    eo = np.diag(f)[:nocc]
    ev = np.diag(f)[nocc:]

    oovv = eris.block("oovv")
    ooov = eris.block("ooov")
    ovvv = eris.block("ovvv")

    # <ei||bc> appearing in the particle contraction: use vvov = <ab||ic>?
    # We need W_ijkabc = P(i/jk) P(a/bc) [ sum_e t2_jkae <ei||bc>
    #                                     - sum_m t2_imbc <ma||jk> ]
    # <ei||bc> = <ie||cb> ... express via ovvv: <ei||bc> = <ie||cb>
    # (swap both bra and ket slots: <pq||rs> = <qp||sr>)
    # <ma||jk> = -<am||jk> = ... express via ooov: <ma||jk> = <jk||ma>^*
    # For real integrals <pq||rs> = <rs||pq>.
    dv = ev[:, None, None] + ev[None, :, None] + ev[None, None, :]

    nvir = t1.shape[1]
    if act_hole is not None:
        ao = np.zeros(nocc, dtype=bool)
        ao[np.asarray(act_hole, dtype=int)] = True
        av = np.zeros(nvir, dtype=bool)
        av[np.asarray(act_particle, dtype=int)] = True
        act_abc = (av[:, None, None] & av[None, :, None] & av[None, None, :])
    et = 0.0
    for i in range(nocc):
        for j in range(nocc):
            for k in range(nocc):
                d3 = (eo[i] + eo[j] + eo[k]) - dv  # (a,b,c)

                def w_one(ii, jj, kk):
                    # sum_e t2[jj,kk,a,e] <e ii || b c> - sum_m t2[ii,m,b,c] <m a || jj kk>
                    # <e i||b c> = <i e||c b> = ovvv[i, e, c, b]
                    # <e ii||b c> = <ii e||c b> = ovvv[ii] read with axes (e, c, b)
                    w = np.einsum("ae,ecb->abc", t2[jj, kk], ovvv[ii])
                    # <m a||j k> = <j k||m a> (real) = ooov[jj, kk, m, a]
                    w -= np.einsum("mbc,ma->abc", t2[ii, :], ooov[jj, kk])
                    return w

                # P(i/jk): (ijk) - (jik) - (kji)
                w = (w_one(i, j, k) - w_one(j, i, k) - w_one(k, j, i))
                # now apply P(a/bc) on the abc axes: f(abc) - f(bac) - f(cba)
                w = (w - w.transpose(1, 0, 2) - w.transpose(2, 1, 0))

                def v_one(ii, jj, kk):
                    return np.einsum("a,bc->abc", t1[ii], oovv[jj, kk])

                v = (v_one(i, j, k) - v_one(j, i, k) - v_one(k, j, i))
                v = (v - v.transpose(1, 0, 2) - v.transpose(2, 1, 0))

                t3c = w / d3
                integrand = t3c * (w + v_fac * v) / 36.0
                if act_hole is not None:
                    all_act = bool(ao[i] and ao[j] and ao[k])
                    if mode == "exclude_active":
                        sel = ~act_abc if all_act else np.ones_like(act_abc)
                    else:
                        sel = act_abc if all_act else np.zeros_like(act_abc)
                    integrand = np.where(sel, integrand, 0.0)
                et += integrand.sum()
    return float(et)
