"""Operators: Spark DataFrame transformations of the extraction engine."""
