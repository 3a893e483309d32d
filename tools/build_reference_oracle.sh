#!/bin/bash
# Build a runnable "oracle" instance of the reference PySCF fork for
# parity pinning, WITHOUT libcint (no network; libcint is an external
# download).  Only the C kernels that the mp/cc/ao2mo layers need and
# that depend solely on BLAS are compiled (np_helper, mp, cc minus
# ccsd_grad, ao2mo); integral-engine libraries (libcgto/libcvhf) are
# created as EMPTY stubs so `import pyscf` succeeds -- AO integrals,
# SCF vectors and Fock matrices must be injected from our own engine
# (see tests/oracle.py).  The reference tree at /root/reference is
# never modified: a symlink shim tree is assembled under
# .scratch/oracle/ and the .so files are placed only there.
#
# Usage: bash tools/build_reference_oracle.sh
# Then:  PYTHONPATH=.scratch/oracle python -c "import pyscf"
set -e
REF=/root/reference/pyscf
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/.scratch/oracle"
BUILD="$OUT/build"
SHIM="$OUT/pyscf"
mkdir -p "$BUILD" "$OUT"

# ---------------------------------------------------------------- shim tree
rm -rf "$SHIM"
mkdir -p "$SHIM"
for f in "$REF"/*; do
  base=$(basename "$f")
  [ "$base" = lib ] && continue
  ln -s "$f" "$SHIM/$base"
done
mkdir -p "$SHIM/lib"
for f in "$REF"/lib/*; do
  ln -s "$f" "$SHIM/lib/$(basename "$f")"
done

# ---------------------------------------------------------------- headers
cat > "$BUILD/config.h" <<'EOF'
#if defined _OPENMP
#include <omp.h>
#else
#define omp_get_thread_num() 0
#define omp_get_num_threads() 1
#endif
#define XCFUN_MAX_DERIV_ORDER 3
EOF
# opaque-type stub for libcint's header: the BLAS-only kernels touch
# CINTOpt/CVHFOpt exclusively through pointers
cat > "$BUILD/cint.h" <<'EOF'
#ifndef ORACLE_STUB_CINT_H
#define ORACLE_STUB_CINT_H
#include <stdint.h>
typedef struct CINTOpt_t CINTOpt;
#define FINT int
#endif
EOF
# CVHFnoscreen is referenced (as a default prescreen fn ptr) by nr_ao2mo
cat > "$BUILD/stub_syms.c" <<'EOF'
#include <stdlib.h>
int CVHFnoscreen(int *shls, void *opt, int *atm, int *bas, double *env)
{ return 1; }
EOF

CFLAGS="-O2 -fPIC -fopenmp -I$BUILD -I$REF/lib -shared"
# no BLAS dev package in this image: prefer the OpenBLAS bundled with
# opencv (standard dgemm_/dsyev_ exports, ~5-10x netlib single-core),
# fall back to the system netlib runtime .so.3
OPENBLAS=$(ls /opt/venv/lib/python3*/site-packages/opencv_python.libs/libopenblasp-*.so 2>/dev/null | head -1)
if [ -n "$OPENBLAS" ]; then
  BLAS="$OPENBLAS -Wl,-rpath,$(dirname "$OPENBLAS")"
else
  BLAS="-l:libblas.so.3 -l:liblapack.so.3 -L/lib/x86_64-linux-gnu"
fi

# ---------------------------------------------------------------- libraries
gcc $CFLAGS -o "$SHIM/lib/libnp_helper.so" \
  "$REF"/lib/np_helper/{transpose,pack_tril,npdot,condense,omp_reduce,np_helper,imatcopy}.c \
  $BLAS

gcc $CFLAGS -o "$SHIM/lib/libmp.so" "$REF"/lib/mp/mp2.c \
  -L"$SHIM/lib" -lnp_helper $BLAS -Wl,-rpath,'$ORIGIN'

gcc $CFLAGS -o "$SHIM/lib/libao2mo.so" \
  "$REF"/lib/ao2mo/{nr_ao2mo,nr_incore,restore_eri}.c "$BUILD/stub_syms.c" \
  -L"$SHIM/lib" -lnp_helper $BLAS -Wl,-rpath,'$ORIGIN'

# ccsd_grad.c needs CVHF integral kernels -- excluded (gradient C path
# unused by the oracle); everything else in libcc is BLAS-only
gcc $CFLAGS -o "$SHIM/lib/libcc.so" \
  "$REF"/lib/cc/{ccsd_pack,ccsd_t,uccsd_t}.c \
  -L"$SHIM/lib" -lnp_helper -lao2mo $BLAS -Wl,-rpath,'$ORIGIN'

# empty stubs: these are dlopened at import time but their symbols are
# only resolved at call time; any call into them means the test is
# using an integral path it must not use.  A few symbols ARE resolved
# at import time (ctypes prototype setup) -- provide aborting stubs.
cat > "$BUILD/empty.c" <<'EOF'
#include <stdlib.h>
#include <stdio.h>
#define ORACLE_ABORT(name) \
  int name(void) { \
    fprintf(stderr, "oracle stub called: " #name "\n"); abort(); }
ORACLE_ABORT(ECPscalar_cache_size)
ORACLE_ABORT(ECPscalar_c2s_factory)
ORACLE_ABORT(ECPscalar)
ORACLE_ABORT(GTOmax_cache_size)
/* dft/libxc.py sets ctypes prototypes AND enumerates functionals at
   import time: report an empty libxc (DFT is out of oracle scope) */
const char *LIBXC_version(void) { return "0.0-oracle-stub"; }
const char *LIBXC_reference(void) { return "oracle stub"; }
const char *LIBXC_reference_doi(void) { return "oracle stub"; }
int LIBXC_number_of_functionals(void) { return 0; }
void LIBXC_functional_numbers(int *nums) { (void)nums; }
const char *LIBXC_functional_name(int n) { (void)n; return ""; }
ORACLE_ABORT(LIBXC_eval_xc)
ORACLE_ABORT(LIBXC_hybrid_coeff)
ORACLE_ABORT(LIBXC_is_cam_rsh)
ORACLE_ABORT(LIBXC_is_gga)
ORACLE_ABORT(LIBXC_is_hybrid)
ORACLE_ABORT(LIBXC_is_lda)
ORACLE_ABORT(LIBXC_is_meta_gga)
ORACLE_ABORT(LIBXC_is_nlc)
ORACLE_ABORT(LIBXC_max_deriv_order)
ORACLE_ABORT(LIBXC_needs_laplacian)
ORACLE_ABORT(LIBXC_nlc_coeff)
ORACLE_ABORT(LIBXC_rsh_coeff)
ORACLE_ABORT(LIBXC_xc_reference)
ORACLE_ABORT(xc_functional_get_number)
EOF
for name in cgto ri dft xc_itrf fci mcscf pbc agf2; do
  gcc -O0 -fPIC -shared -o "$SHIM/lib/lib$name.so" "$BUILD/empty.c"
done

# libcvhf: the incore J/K contraction (CVHFics8_* etc.) is BLAS-only and
# lets reference SCF/CCSD run from an injected mf._eri; everything
# integral-direct stays unavailable by construction
gcc $CFLAGS -o "$SHIM/lib/libcvhf.so" \
  "$REF"/lib/vhf/nr_incore.c "$BUILD/empty.c" \
  -L"$SHIM/lib" -lnp_helper $BLAS -Wl,-rpath,'$ORIGIN'

echo "oracle built: PYTHONPATH=$OUT"
