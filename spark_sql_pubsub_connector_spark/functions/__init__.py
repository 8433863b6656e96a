"""Reusable column-expression helpers (JVM built-ins only — no UDFs)."""

from .exact import eavg, esum, sql_eavg, sql_esum  # noqa: F401
