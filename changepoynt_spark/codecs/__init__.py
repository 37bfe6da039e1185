"""Lossless time-series block codecs: Gorilla XOR for float64 values and
delta-of-delta for int64 timestamps (Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015)."""
from changepoynt_spark.codecs.delta import decode_timestamps, encode_timestamps
from changepoynt_spark.codecs.gorilla import decode_values, encode_values
from changepoynt_spark.codecs.scaled import (decode_values_scaled,
                                             encode_values_scaled)

__all__ = ['encode_values', 'decode_values', 'encode_timestamps',
           'decode_timestamps', 'encode_values_scaled', 'decode_values_scaled']
