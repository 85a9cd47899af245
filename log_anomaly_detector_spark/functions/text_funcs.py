"""Text scalar helpers: stopword lists, normalization, fingerprints.

All built-in-expression based (JVM-side, codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny pinned stopword list (quality scoring + langid heuristic)
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def words(text: Column) -> Column:
    """Whitespace tokenization (reference: ' '.join/split round-trips,
    logparser/Drain.py:301,451)."""
    return F.split(F.trim(text), " +")


def normalized(text: Column) -> Column:
    """Normalization for fingerprinting: lowercase, collapse whitespace."""
    return F.lower(F.regexp_replace(F.trim(text), " +", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint = md5 of normalized text
    (reference: md5(template)[:8] EventId, logparser/Drain.py:209,236)."""
    return F.md5(normalized(text))


def stopword_count(ws: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """# of stopword tokens — array higher-order filter, JVM-side."""
    return F.size(F.filter(ws, lambda w: w.isin(*stopwords)))
