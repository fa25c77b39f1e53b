"""Dataflow operators of the CDC engine (SURVEY.md §2 inventory).

Each module cites the reference file:line it re-creates. All hot-path
transforms are JVM-side column expressions or Arrow-vectorized pandas UDFs —
never per-row Python.
"""
