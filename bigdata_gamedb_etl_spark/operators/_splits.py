"""Shared hash-split constants: the 90/5/5 md5-bucket assignment used
by the pipeline split family and every operator that audits a split
(embedding drift, cross-split LM entropy).  A leaf module so that
textops/similarity can compose the split without importing pipeline
(which imports textops — circular)."""

SPLIT_SEED = 1913
SPLIT_TRAIN_PCT = 90  # buckets [0,90) train, [90,95) val, [95,100) test
SPLIT_VAL_PCT = 95
