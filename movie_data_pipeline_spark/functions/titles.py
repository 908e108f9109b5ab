"""Title normalization (reference semantics F1–F8, SURVEY.md §2.6).

Everything except diacritic stripping compiles to native Column
expressions (Catalyst-optimizable, whole-stage-codegen'd). Diacritic
stripping (Unicode NFKD + drop combining marks; reference
``etl.py:49-54``) has no native Spark SQL equivalent and is the one
Arrow-vectorized pandas UDF in the engine.

⚠ Composition-order quirk reproduced deliberately (SURVEY §2.6): in
``full_title_clean`` the trailing-article move runs BEFORE
parenthetical removal (reference ``etl.py:216-221``), so a title like
``"City of Lost Children, The (Cité des enfants perdus, La) (1995)"``
keeps its trailing article — the article regex is ``$``-anchored and
cannot match while the parenthetical is attached. Tests pin this.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Regexes (Java dialect — semantics verified against the edge corpus in
# tests/test_titles.py rather than assumed; SURVEY §7.4.5).
_YEAR_SUFFIX = r"\s*\(\d{4}\)\s*$"
_OUTER_JUNK = "^[\\s\"']+|[\\s\"']+$"  # .strip() then .strip(' "\'')
_ARTICLE = r"(?i)^(.*),\s*(The|A|An)$"
# (?iu): Java needs UNICODE_CASE for 'cité' to match case-insensitively.
_ALTERNATE_KEYWORDS = (
    r"(?iu)\s*\(.*?(a\.k\.a\.|aka|original|original title|la|le|der|el|"
    r"cite|cité|versión|version).*?\)\s*"
)
_ANY_PARENTHETICAL = r"\s*\([^)]*\)\s*"
_FIRST_PARENTHETICAL = r"\(([^)]+)\)"
_YEAR_CAPTURE = r"\((\d{4})\)"


def tidy_whitespace(c: Column) -> Column:
    """F6: collapse runs of whitespace to one space, strip ends."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def base_clean(c: Column) -> Column:
    """F1: drop trailing " (YYYY)", strip outer quotes/space, tidy."""
    t = F.regexp_replace(c, _YEAR_SUFFIX, "")
    t = F.regexp_replace(t, _OUTER_JUNK, "")
    return tidy_whitespace(t)


def move_trailing_article(c: Column) -> Column:
    """F2: 'Name, The' → 'The Name' (case-insensitive, $-anchored)."""
    return F.trim(F.regexp_replace(c, _ARTICLE, "$2 $1"))


def remove_parenthetical_alternates(c: Column) -> Column:
    """F3: drop keyword'd parentheticals, then ALL parentheticals."""
    t = F.regexp_replace(c, _ALTERNATE_KEYWORDS, " ")
    t = F.regexp_replace(t, _ANY_PARENTHETICAL, " ")
    return tidy_whitespace(t)


def extract_parenthetical_alternate(c: Column) -> Column:
    """F4: first '(...)' content if ≤30 chars (trimmed) and comma-free.

    NULL when there is no parenthetical or it fails the checks; may be
    the empty string when the parenthetical is all-whitespace (the
    reference returns '' there too — falsy, filtered later).
    """
    raw = F.regexp_extract(c, _FIRST_PARENTHETICAL, 1)
    inside = F.trim(raw)
    ok = (raw != "") & (F.length(inside) <= 30) & (~inside.contains(","))
    return F.when(ok, inside)


def extract_release_year(c: Column) -> Column:
    """F9: first '(YYYY)' → int, NULL on miss.

    ``regexp_extract`` returns '' (not NULL) on miss — ``nullif`` keeps
    the reference's None-year semantics (SURVEY §7.4.3).
    """
    return F.nullif(F.regexp_extract(c, _YEAR_CAPTURE, 1), F.lit("")).cast("int")


def strip_diacritics_py(text: str | None) -> str | None:
    """NFKD-normalize and drop combining marks ('Cité' → 'Cite')."""
    if text is None:
        return None
    nfkd = unicodedata.normalize("NFKD", text)
    return "".join(ch for ch in nfkd if not unicodedata.combining(ch))


@F.pandas_udf(T.StringType())
def remove_diacritics(s: pd.Series) -> pd.Series:
    """F5: the one necessary Python UDF (Arrow-vectorized).

    Opaque to Catalyst — apply AFTER filters so pushdown isn't blocked
    (SURVEY §4.3.1).
    """
    return s.map(strip_diacritics_py)


def full_title_clean(c: Column) -> Column:
    """F8: load-time canonical title (reference composition order).

    base_clean → move_trailing_article → remove_parenthetical_alternates
    → remove_diacritics → tidy_whitespace. The article move MUST precede
    parenthetical removal (⚠ quirk, module docstring).
    """
    t = base_clean(c)
    t = move_trailing_article(t)
    t = remove_parenthetical_alternates(t)
    t = remove_diacritics(t)
    return tidy_whitespace(t)


def _candidates_py(title: str | None) -> list[str]:
    """F7 reference semantics, driven by the SAME regex pipeline.

    Used only inside the vectorized UDF below. Order matters:
    [article-moved, paren-removed, paren-alternate, base], first-
    occurrence dedup, then diacritic-stripped variants of each, then a
    final per-element tidy WITHOUT re-dedup (the reference doesn't)."""
    import re

    if title is None:
        return []

    def _tidy(s: str) -> str:
        return re.sub(r"\s+", " ", s).strip()

    base = re.sub(r"\s*\(\d{4}\)\s*$", "", title).strip().strip(" \"'")
    base = _tidy(base)
    if not base:
        return []

    m = re.match(r"^(.*),\s*(The|A|An)$", base, flags=re.IGNORECASE)
    moved = f"{m.group(2)} {m.group(1)}".strip() if m else base

    t2 = re.sub(
        r"\s*\(.*?(a\.k\.a\.|aka|original|original title|la|le|der|el|"
        r"cite|cité|versión|version).*?\)\s*",
        " ",
        base,
        flags=re.IGNORECASE,
    )
    t2 = re.sub(r"\s*\([^)]*\)\s*", " ", t2)
    removed = _tidy(t2)

    alt = None
    pm = re.search(r"\(([^)]+)\)", base)
    if pm:
        inside = pm.group(1).strip()
        if len(inside) <= 30 and "," not in inside:
            alt = inside

    candidates: list[str] = []
    for t in [moved, removed, alt, base]:
        if t and t not in candidates:
            candidates.append(t)
    for cand in list(candidates):
        translit = strip_diacritics_py(cand)
        if translit != cand and translit not in candidates:
            candidates.append(translit)
    return [_tidy(cand) for cand in candidates if cand]


@F.pandas_udf(T.ArrayType(T.StringType()))
def generate_title_candidates(titles: pd.Series) -> pd.Series:
    """F7: ordered, deduped candidate array for enrichment lookup.

    A single Arrow-vectorized UDF: the candidate list interleaves a
    Python-only step (diacritic variants) with order-sensitive dedup,
    which cannot be expressed with native array functions without
    losing the reference's exact ordering semantics.
    """
    return titles.map(_candidates_py)
