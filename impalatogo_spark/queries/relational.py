"""Relational operator coverage queries (SURVEY.md §2.4-§2.10): joins of all
flavors, window functions, set ops, subqueries, scalar-function batteries.
Populated incrementally; every entry has a DuckDB oracle unless inherently
approximate.
"""

from __future__ import annotations
