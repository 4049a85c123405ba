"""Scalar / array / text / audio kernels.

Preference order (SURVEY §7.1): Catalyst built-ins and higher-order
functions first (JVM-side, codegen'd); Arrow-batched pandas_udf only
for genuinely numerical kernels (WADA SNR); row-at-a-time Python UDFs
never.
"""
