"""Root conftest: pin BLAS threading BEFORE numpy first loads.

LAPACK's divide-and-conquer SVD (dgesdd) is not bit-stable across OpenBLAS
thread counts: the same 50x50 Hankel SVD differs by 1 ulp at 3 of 900
positions between single- and multi-threaded execution (observed round 5 on
the sst_naive_w50_r2_step3x300 golden).  Spark python workers already run
single-threaded BLAS (changepoynt_spark/session.py sets OMP_NUM_THREADS=1
etc. so task parallelism comes from Spark, not BLAS) — pinning the test
process the same way makes `pytest` results invocation-invariant AND
apples-to-apples with the Spark side.  setdefault (not hard set) mirrors the
session factory's contract: an explicit user override propagates to both.

Must run before `import numpy` anywhere in the test session: OpenBLAS reads
the env only at library load time.

BLAS-BUILD ASSUMPTION (part of the golden contract): the frozen goldens and
the Spark==oracle bit-equality tests are defined under THIS host's BLAS
(numpy's bundled OpenBLAS, single-threaded).  The round-5 kernel rewrite
routes hot loops through BLAS ddot/dgemv (math.sqrt(np.dot(x,x)),
np.dot(mat, vec)); those primitives can differ in the last ulp across BLAS
builds/architectures (dgemv vs dgemm kernels, pairwise vs sequential ufunc
reduction).  On a different OpenBLAS/MKL build a golden mismatch is
therefore a re-freeze event, not a code bug — the detecting tests are
tests/test_goldens.py and
tests/test_kernels_sst.py::test_batched_paths_bitmatch_the_sequential_loop.
Record the build (`numpy.show_config()`) when re-freezing.
"""
import os

for _var in ('OMP_NUM_THREADS', 'OPENBLAS_NUM_THREADS', 'MKL_NUM_THREADS',
             'VECLIB_MAXIMUM_THREADS', 'NUMEXPR_NUM_THREADS'):
    os.environ.setdefault(_var, '1')
