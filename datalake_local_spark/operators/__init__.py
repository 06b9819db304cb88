"""Relational operator library.

The reference implements no relational operators itself — it delegates the
full ANSI surface to Trino 406 (SURVEY.md §2.3-2.5). Here each capability is
a small named DataFrame function, exercised against the driver's TPC-H-ish
tables and oracle-checked against DuckDB.
"""
