"""Drop-in import-path compatibility with the reference ``changepoynt``
package: a user switching to this engine changes

    from changepoynt.algorithms.sst import SST

to

    from changepoynt_spark.compat.algorithms.sst import SST

(or aliases ``changepoynt_spark.compat`` as ``changepoynt``) and every
class/constructor/transform call keeps working — the classes ARE the
engine's kernels, which reproduce the reference's scores bit-for-bit under
the frozen-golden tests.  Reference layout mirrored:
/root/reference/changepoynt/{algorithms,utils}/*.py."""
