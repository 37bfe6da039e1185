"""Planning helpers Catalyst cannot derive: cost-aware salting and
chunk-with-halo for UDF-side skew."""
