"""Field cleaners (reference semantics F10–F13, SURVEY.md §2.6).

The engine deliberately FIXES two verified reference bugs and documents
the divergence (SURVEY §7.4.2):

- ``clean_box_office``: the reference passes the literal string "N/A"
  through into an INT-affinity column (reference ``etl.py:225-228``);
  here "N/A" → NULL and the output is a real LONG.
- ``clean_runtime``: the reference's replace-order bug turns
  "90 mins" → "90 s" (``.replace("min","")`` runs first); here the
  first integer is extracted, robust to "N min"/"N mins".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_box_office(c: Column) -> Column:
    """F10: '$57,300,000' → 57300000L; ''/'N/A'/NULL → NULL."""
    stripped = F.trim(F.regexp_replace(c, r"[$,]", ""))
    return (
        F.when(c.isNull() | (stripped == "") | (stripped == "N/A"), F.lit(None))
        .otherwise(stripped)
        .cast("long")
    )


def clean_runtime(c: Column) -> Column:
    """F11: '81 min' → 81; 'N/A'/''/NULL → NULL (first integer wins)."""
    digits = F.regexp_extract(c, r"(\d+)", 1)
    return F.nullif(digits, F.lit("")).cast("int")


def null_if_na(c: Column) -> Column:
    """F12 helper: the OMDb 'N/A' sentinel → NULL."""
    return F.when(c == "N/A", F.lit(None)).otherwise(c)
