"""Pure-Python deterministic kernels (no Spark imports here).

These are the byte-identity-critical functions; everything is unit-tested
against golden fixtures (see ``tests/``).  They run inside Arrow-batched
``mapInPandas`` stages on executors.
"""
