"""Relational + pipeline operators built on Spark DataFrame primitives."""
