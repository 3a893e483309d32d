"""Device-resident active-space iterative T3 from DF factors.

Production-scale counterpart of the NumPy oracle cc/gccsdt_slow.py — the
role of the fork's iterative active-space triples machinery
(pyscf/cc/umpcc_t_slow.py:448 make_intermediates, :699 get_vvvv_to_imds,
:1831 iterative_update_amps_t3; t1-dressed 3-center intermediates of
uccsd_t_inactive_iterative.py:1683-1702 get_X/get_J/get_F) — designed
TPU-first instead of transcribing the fork's ~2000 lines of hand-expanded
spin blocks:

*   t1 enters ONLY through the exact similarity transform of the
    3-center DF factors:  Bt = Uc @ B @ Ua^T per spin (Uc/Ua the
    creation/annihilation frames of gccsdt_slow.dress).  Every dressed
    antisymmetrized integral block <pq||rs>~ is then two MXU dot_generals
    over Bt slices, generated ON DEMAND for exactly the index ranges a
    term needs — nothing four-index over the full space is ever
    materialized.

*   The T3 equations are the SAME t1-free spin-orbital einsum strings as
    the oracle (gccsdt_slow.t3_residual / feedback, locked there against
    the determinant-space projection), evaluated through spinsum.seinsum
    over spin-blocked tensors: the spin expansion the fork hand-maintains
    is traced mechanically at jit-trace time.

*   Because every t3-bound index is ACTIVE, all tensors carrying bound
    indices are sliced to the active ranges before contracting: the t3
    store is O((2 na_o)^3 (2 na_v)^3) and the largest integral slice is
    O(nocc nvir^2 na) — active-space iterative triples at DF scale, the
    capability the oracle (full t3, nso^4 dressed integrals) cannot
    reach.  Big arrays travel through jit as ARGUMENTS (pytree), never as
    closure constants.

models: 'ccsdt', 'ccsdt-3', 'ccsdt-1' as in the oracle.
"""

from __future__ import annotations

from itertools import permutations

import jax
import jax.numpy as jnp
import numpy as np

from pyscf_mpcc_tpu.cc.spinsum import ST, seinsum, t2_st

MODELS = ("ccsdt", "ccsdt-3", "ccsdt-1")

T3_CANONICAL = ("aaaaaa", "aabaab", "abbabb", "bbbbbb")


def _parity(perm):
    p = 1
    perm = list(perm)
    for x in range(len(perm)):
        for y in range(x + 1, len(perm)):
            if perm[x] > perm[y]:
                p = -p
    return p


# ---------------------------------------------------------------------------
# spin-blocked 6-index amplitudes
# ---------------------------------------------------------------------------

def expand_t3(blocks):
    """Canonical t3 block dict -> ST carrying every conserving signature
    (the permuted signatures follow from the (ijk)x(abc) antisymmetry of
    the underlying spin-orbital amplitude)."""
    out = {}
    for sig, arr in blocks.items():
        if arr is None:
            continue
        for ph in permutations(range(3)):
            for pp in permutations(range(3)):
                nsig = ("".join(sig[i] for i in ph)
                        + "".join(sig[3 + i] for i in pp))
                if nsig in out:
                    continue
                s = _parity(ph) * _parity(pp)
                perm = tuple(ph) + tuple(3 + i for i in pp)
                out[nsig] = s * arr.transpose(perm)
    return ST(out)


def reduce_t3(x: ST):
    return {k: x.get(k) for k in T3_CANONICAL if x.get(k) is not None}


def _st_perm(x: ST, perm, sign=1.0):
    return ST({("".join(k[p] for p in perm)): sign * v.transpose(perm)
               for k, v in x.b.items()})


def st_a36(x: ST):
    """Full antisymmetrizer over (ijk) x (abc) for 6-index STs."""
    out = None
    for ph in permutations(range(3)):
        for pp in permutations(range(3)):
            s = _parity(ph) * _parity(pp)
            perm = tuple(ph) + tuple(3 + i for i in pp)
            t = _st_perm(x, perm, s)
            out = t if out is None else out + t
    return out


def st_p_hole(x: ST):
    return (x + _st_perm(x, (1, 0, 2, 3, 4, 5), -1.0)
            + _st_perm(x, (2, 1, 0, 3, 4, 5), -1.0))


def st_p_part(x: ST):
    return (x + _st_perm(x, (0, 1, 2, 4, 3, 5), -1.0)
            + _st_perm(x, (0, 1, 2, 5, 4, 3), -1.0))


# ---------------------------------------------------------------------------
# dressed DF integral factory (metadata static; arrays passed per call)
# ---------------------------------------------------------------------------

class DressedDF:
    """Static metadata for the dressed-DF integral factory.

    nocc: (nocca, noccb); nmo: (nmoa, nmob); act_hole/act_particle:
    per-spin active index arrays (occupied / virtual counting).  The
    ARRAYS (dressed 3-center factors + dressed Fock) are built by
    :func:`dress_df` and passed through jit as a pytree dict."""

    def __init__(self, nocc, nmo, act_hole, act_particle):
        self.nocc = tuple(int(x) for x in nocc)
        self.nmo = tuple(int(x) for x in nmo)
        self.act_hole = tuple(np.asarray(x, int) for x in act_hole)
        self.act_particle = tuple(np.asarray(x, int) for x in act_particle)

    # -- index selections (static numpy) ------------------------------------
    def sel(self, kind, s):
        """'h' full hole, 'H' active hole, 'p' full particle, 'P' active
        particle — as an index array into the MO dimension."""
        no, nmo = self.nocc[s], self.nmo[s]
        if kind == "h":
            return np.arange(no)
        if kind == "H":
            return self.act_hole[s]
        if kind == "p":
            return np.arange(no, nmo)
        if kind == "P":
            return no + self.act_particle[s]
        raise KeyError(kind)

    def _b(self, arrs, s, k1, k2):
        Bt = arrs["Bta" if s == 0 else "Btb"]
        return Bt[:, self.sel(k1, s)][:, :, self.sel(k2, s)]

    def g(self, arrs, spec):
        """Antisymmetrized dressed block <pq||rs>~ as an ST over all
        conserving spin signatures.  spec: 4 chars of h/H/p/P (physicists'
        order: p,q creation; r,s annihilation).
        <pq||rs>~ = (pr|qs)~ - (ps|qr)~ with (xy|zw)~ = Bt[L,x,y]Bt[L,z,w].
        """
        blocks = {}
        for sp in "ab":
            for sq in "ab":
                for sr in "ab":
                    for ss in "ab":
                        direct = (sp == sr) and (sq == ss)
                        exch = (sp == ss) and (sq == sr)
                        if not (direct or exch):
                            continue
                        val = None
                        if direct:
                            val = jnp.einsum(
                                "Lpr,Lqs->pqrs",
                                self._b(arrs, "ab".index(sp), spec[0],
                                        spec[2]),
                                self._b(arrs, "ab".index(sq), spec[1],
                                        spec[3]))
                        if exch:
                            e = jnp.einsum(
                                "Lps,Lqr->pqrs",
                                self._b(arrs, "ab".index(sp), spec[0],
                                        spec[3]),
                                self._b(arrs, "ab".index(sq), spec[1],
                                        spec[2]))
                            val = -e if val is None else val - e
                        blocks[sp + sq + sr + ss] = val
        return ST(blocks)

    def f(self, arrs, spec):
        """Dressed-Fock block ST ('aa'/'bb') for a 2-char range spec."""
        out = {}
        for s, sig in ((0, "aa"), (1, "bb")):
            fk = arrs["fa" if s == 0 else "fb"]
            out[sig] = fk[self.sel(spec[0], s)][:, self.sel(spec[1], s)]
        return ST(out)

    def take(self, x: ST, kinds):
        """Slice an ST's axes: '.' keep, 'H'/'P' slice to active."""
        out = {}
        for sig, arr in x.b.items():
            a = arr
            for ax, k in enumerate(kinds):
                if k == ".":
                    continue
                s = "ab".index(sig[ax])
                idx = (self.act_hole[s] if k == "H"
                       else self.act_particle[s])
                a = jnp.take(a, jnp.asarray(idx), axis=ax)
            out[sig] = a
        return ST(out)


def dress_df(B, h, t1, nocc):
    """t1-dressed arrays: {'Bta','Btb','fa','fb'}.

    B: per-spin 3-center MO factors (naux, nmo, nmo) in chemists'
    (creation, annihilation) axis order; h: per-spin one-electron MO
    integrals; t1: (t1a, t1b).  Bt = Uc B Ua^T exactly eliminates t1
    (gccsdt_slow.dress over DF factors); the dressed Fock adds the
    Coulomb/exchange closure over BOTH spins' occupied blocks."""
    out = {}
    Bt = []
    ht = []
    for s in (0, 1):
        no = nocc[s]
        nmo = B[s].shape[1]
        t1s = jnp.asarray(t1[s])
        Uc = jnp.eye(nmo).at[no:, :no].add(-t1s.T)
        Ua = jnp.eye(nmo).at[:no, no:].add(t1s)
        Bt.append(jnp.einsum("pm,Lmn,qn->Lpq", Uc, jnp.asarray(B[s]), Ua))
        ht.append(Uc @ jnp.asarray(h[s]) @ Ua.T)
    j = [jnp.einsum("Ljj->L", Bt[s][:, :nocc[s], :nocc[s]]) for s in (0, 1)]
    jtot = j[0] + j[1]
    for s in (0, 1):
        no = nocc[s]
        f = ht[s] + jnp.einsum("Lpq,L->pq", Bt[s], jtot)
        f = f - jnp.einsum("Lpj,Ljq->pq", Bt[s][:, :, :no], Bt[s][:, :no, :])
        out["fa" if s == 0 else "fb"] = f
    out["Bta"], out["Btb"] = Bt
    return out


# ---------------------------------------------------------------------------
# the T3 residual over active blocks (oracle einsum strings, sliced)
# ---------------------------------------------------------------------------

def t3_residual_act(t2: ST, t3, dd: DressedDF, arrs, model="ccsdt",
                    driving="full"):
    """Active-block T3 residual; the einsum strings are EXACTLY those of
    gccsdt_slow.t3_residual (oracle-locked), each operand sliced to the
    ranges its indices take when the output (ijkabc) is all-active.

    driving: 'full' (linear + quadratic t2 terms), 'linear', or 'none'
    (only the [H, T3] couplings — the per-sweep varying part)."""
    if model not in MODELS:
        raise ValueError(f"unknown model {model!r}; one of {MODELS}")
    r3 = None
    if driving != "none":
        t2_HHPp = dd.take(t2, "HHP.")
        t2_HhPP = dd.take(t2, "H.PP")
        # x = t2[jkae] <bc||ei>~  -  t2[imbc] <ma||jk>~
        x = seinsum("jkae,bcei->ijkabc", t2_HHPp, dd.g(arrs, "PPpH"))
        x = x - seinsum("imbc,majk->ijkabc", t2_HhPP, dd.g(arrs, "hPHH"))
        r3 = st_p_hole(st_p_part(x))
        if driving == "full":
            t2_HhPp = dd.take(t2, "H.P.")
            t2_hHPP = dd.take(t2, ".HPP")
            q = -0.125 * seinsum("mnab,mnie,jkce->ijkabc",
                                 dd.take(t2, "..PP"), dd.g(arrs, "hhHp"),
                                 t2_HHPp)
            q = q + -0.5 * seinsum("jmae,mnie,nkbc->ijkabc",
                                   t2_HhPp, dd.g(arrs, "hhHp"), t2_hHPP)
            q = q + 0.125 * seinsum("jkef,maef,mibc->ijkabc",
                                    dd.take(t2, "HH.."), dd.g(arrs, "hPpp"),
                                    t2_hHPP)
            q = q + 0.5 * seinsum("imbe,maef,jkcf->ijkabc",
                                  t2_HhPp, dd.g(arrs, "hPpp"), t2_HHPp)
            q = q + 0.25 * seinsum("imbc,me,jkae->ijkabc",
                                   t2_HhPP, dd.f(arrs, "hp"), t2_HHPp)
            r3 = r3 + st_a36(q)

    if t3 is None:
        return r3

    # ---- [H, T3] couplings (all bound indices active) ----------------------
    y = (1.0 / 12.0) * seinsum("ijkabe,ce->ijkabc", t3, dd.f(arrs, "PP"))
    y = y - (1.0 / 12.0) * seinsum("mjkabc,mi->ijkabc", t3,
                                   dd.f(arrs, "HH"))
    if model in ("ccsdt", "ccsdt-3"):
        y = y + (1.0 / 24.0) * seinsum("mnkabc,mnij->ijkabc", t3,
                                       dd.g(arrs, "HHHH"))
        y = y + (1.0 / 24.0) * seinsum("ijkaef,bcef->ijkabc", t3,
                                       dd.g(arrs, "PPPP"))
        y = y + 0.25 * seinsum("mjkebc,maei->ijkabc", t3,
                               dd.g(arrs, "HPPH"))
    if model == "ccsdt":
        y = y + (1.0 / 48.0) * seinsum("mnab,mnef,ijkcef->ijkabc",
                                       dd.take(t2, "..PP"),
                                       dd.g(arrs, "hhPP"), t3)
        y = y + (1.0 / 48.0) * seinsum("ijef,mnef,mnkabc->ijkabc",
                                       dd.take(t2, "HH.."),
                                       dd.g(arrs, "HHpp"), t3)
        y = y + 0.25 * seinsum("jmae,mnef,nikbcf->ijkabc",
                               dd.take(t2, "H.P."),
                               dd.g(arrs, "hHpP"), t3)
    ya = st_a36(y)
    return ya if r3 is None else r3 + ya


def feedback_act(t3: ST, dd: DressedDF, arrs):
    """T3 -> (R1, R2) additions in the DRESSED (t1-free) frame, scattered
    into FULL-shaped per-spin arrays (the active t3 feeds t2 elements with
    up to one inactive index).  Same einsum strings as
    gccsdt_slow.feedback; returns ((r1a, r1b), (r2aa, r2ab, r2bb))."""
    r1_act = 0.25 * seinsum("mnef,imnaef->ia", dd.g(arrs, "HHPP"), t3)
    y = seinsum("me,ijmabe->ijab", dd.f(arrs, "HP"), t3)
    # <bm||ef>~ with b free over the full particle range
    yb = seinsum("bmef,ijmaef->ijab", dd.g(arrs, "pHPP"), t3)
    # <mn||ej>~ with j free over the full hole range
    yj = seinsum("mnej,imnabe->ijab", dd.g(arrs, "HHPh"), t3)

    nocc, nmo = dd.nocc, dd.nmo
    r1 = []
    for s, sig in ((0, "aa"), (1, "bb")):
        no, nv = nocc[s], nmo[s] - nocc[s]
        base = jnp.zeros((no, nv))
        if r1_act.get(sig) is not None:
            base = base.at[jnp.ix_(jnp.asarray(dd.act_hole[s]),
                                   jnp.asarray(dd.act_particle[s]))].add(
                r1_act[sig])
        r1.append(base)

    full = {}

    def scatter(st, acts):
        for sig, arr in st.b.items():
            sp = ["ab".index(c) for c in sig]
            shape = (nocc[sp[0]], nocc[sp[1]],
                     nmo[sp[2]] - nocc[sp[2]], nmo[sp[3]] - nocc[sp[3]])
            idx = []
            for ax in range(4):
                if acts[ax] == "H":
                    idx.append(jnp.asarray(dd.act_hole[sp[ax]]))
                elif acts[ax] == "P":
                    idx.append(jnp.asarray(dd.act_particle[sp[ax]]))
                else:
                    idx.append(jnp.arange(shape[ax]))
            base = full.get(sig, jnp.zeros(shape))
            full[sig] = base.at[jnp.ix_(*idx)].add(arr)

    scatter(y, "HHPP")
    scatter(yb, "HHP.")   # b free: full particle range
    scatter(yj, "H.PP")   # j free: full hole range
    yf = ST(full)
    yf = yf + _st_perm4(yf, (1, 0, 2, 3), -1.0)
    yf = yf + _st_perm4(yf, (0, 1, 3, 2), -1.0)
    r2 = ST({k: 0.25 * v for k, v in yf.b.items()})
    return ((r1[0], r1[1]),
            (r2.get("aaaa"), r2.get("abab"), r2.get("bbbb")))


def _st_perm4(x: ST, perm, sign=1.0):
    return ST({("".join(k[p] for p in perm)): sign * v.transpose(perm)
               for k, v in x.b.items()})


# ---------------------------------------------------------------------------
# iterative active-T3 solver at fixed (t1, t2)
# ---------------------------------------------------------------------------

def d3_blocks(dd: DressedDF, mo_energy):
    """Bare-Fock active denominators per canonical signature."""
    eo = [np.asarray(mo_energy[s])[:dd.nocc[s]][dd.act_hole[s]]
          for s in (0, 1)]
    ev = [np.asarray(mo_energy[s])[dd.nocc[s]:][dd.act_particle[s]]
          for s in (0, 1)]
    out = {}
    for sig in T3_CANONICAL:
        sh = ["ab".index(c) for c in sig[:3]]
        sv = ["ab".index(c) for c in sig[3:]]
        d = (eo[sh[0]][:, None, None, None, None, None]
             + eo[sh[1]][None, :, None, None, None, None]
             + eo[sh[2]][None, None, :, None, None, None]
             - ev[sv[0]][None, None, None, :, None, None]
             - ev[sv[1]][None, None, None, None, :, None]
             - ev[sv[2]][None, None, None, None, None, :])
        out[sig] = jnp.asarray(d)
    return out


def solve_t3_act(t2_blocks, dd: DressedDF, arrs, mo_energy,
                 model="ccsdt-3", max_cycle=60, conv_tol=1e-8, verbose=0,
                 t3_init=None, diis_space=6):
    """Iteratively solve the active-block T3 at fixed (t1, t2).

    t2_blocks: (t2aa, t2ab, t2bb) in the frame matching arrs' dressing
    (i.e. the UCCSD amplitudes whose t1 built them).  Returns
    (t3_canonical dict, converged)."""
    from pyscf_mpcc_tpu.lib.diis import DIIS
    from pyscf_mpcc_tpu.lib import logger as lg
    log = lg.Logger(verbose=verbose)
    t2b = tuple(jnp.asarray(x) for x in t2_blocks)
    d3 = d3_blocks(dd, mo_energy)

    @jax.jit
    def _drive(arrs_, t2b_):
        r = t3_residual_act(t2_st(t2b_), None, dd, arrs_, model=model)
        return reduce_t3(r)

    @jax.jit
    def _couple(arrs_, t2b_, canon):
        t3 = expand_t3(canon)
        r = t3_residual_act(t2_st(t2b_), t3, dd, arrs_, model=model,
                            driving="none")
        return reduce_t3(r)

    drive = _drive(arrs, t2b)
    canon = (dict(t3_init) if t3_init is not None
             else {k: jnp.zeros_like(v) for k, v in drive.items()})
    keys = sorted(canon.keys())
    diis = DIIS(space=diis_space)
    converged = False
    for it in range(max_cycle):
        coup = _couple(arrs, t2b, canon)
        new = {}
        dn = 0.0
        for k in keys:
            r = drive[k]
            if coup.get(k) is not None:
                r = r + coup[k]
            nk = canon[k] + r / d3[k]
            dn += float(jnp.linalg.norm(nk - canon[k]))
            new[k] = nk
        vec = np.concatenate([np.asarray(new[k]).ravel() for k in keys])
        vec = diis.update(vec)
        p = 0
        for k in keys:
            n = new[k].size
            canon[k] = jnp.asarray(vec[p:p + n].reshape(new[k].shape))
            p += n
        log.info("t3-act cycle %2d  |dt3| = %9.3e", it, dn)
        if dn < conv_tol:
            converged = True
            break
    return canon, converged
