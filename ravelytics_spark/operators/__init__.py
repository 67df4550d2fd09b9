"""Relational + extension operators built on DataFrame primitives."""
