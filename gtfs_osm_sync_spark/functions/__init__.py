"""Scalar function layer: geodesics, cell indexes, tag algebra, codecs, text."""
