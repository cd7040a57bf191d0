"""Relational + spatial + training-data operators built on DataFrame ops."""
