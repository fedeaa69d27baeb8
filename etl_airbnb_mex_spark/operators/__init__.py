"""Relational / dataflow operators (SURVEY.md §2.1–2.8, §2.11).

Each operator is a small composable function ``(DataFrame, params) ->
DataFrame`` returning a *lazy* plan — callers compose and Catalyst
optimizes the whole graph (predicate pushdown, column pruning, partial
aggregation, broadcast selection) across operator boundaries.
"""
