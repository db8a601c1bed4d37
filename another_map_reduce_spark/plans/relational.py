"""Relational query suite — [extension] operators (SURVEY.md §2b).

All Catalyst built-ins; each query is paired with a DuckDB oracle.
Populated incrementally (M3).
"""

from __future__ import annotations
