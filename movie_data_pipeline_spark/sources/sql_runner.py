"""SQL script runner (reference S9, ``etl.py:295-321``) — quote-aware.

The reference splits scripts on ';' naively (breaks on semicolons
inside string literals — SURVEY §2.1 S9 ⚠). This splitter tracks
single/double-quote state and '--' line comments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def split_statements(script: str) -> list[str]:
    """Split a SQL script into statements on ';' outside quotes/comments."""
    statements: list[str] = []
    buf: list[str] = []
    in_single = in_double = in_comment = False
    i = 0
    while i < len(script):
        ch = script[i]
        if in_comment:
            buf.append(ch)
            if ch == "\n":
                in_comment = False
        elif in_single:
            buf.append(ch)
            if ch == "'":
                # '' is an escaped quote inside a literal
                if i + 1 < len(script) and script[i + 1] == "'":
                    buf.append("'")
                    i += 1
                else:
                    in_single = False
        elif in_double:
            buf.append(ch)
            if ch == '"':
                in_double = False
        elif ch == "'":
            in_single = True
            buf.append(ch)
        elif ch == '"':
            in_double = True
            buf.append(ch)
        elif ch == "-" and i + 1 < len(script) and script[i + 1] == "-":
            in_comment = True
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                statements.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        statements.append(tail)
    return statements


def run_script(
    spark: SparkSession,
    script: str,
    print_results: bool = False,
    max_rows: int | None = None,
) -> list[DataFrame]:
    """Execute each statement via spark.sql; optionally print TSV with
    the reference's NULL rendering (``etl.py:313``).

    Display streams through ``toLocalIterator()`` — driver memory is
    bounded by one partition, not the full result, so an accidental
    full-table SELECT in an analyst script doesn't OOM the driver the
    way the reference's ``fetchall`` would. ``max_rows`` optionally
    caps the printed rows per statement (a trailing marker notes the
    truncation); ``None`` preserves the reference's print-everything
    contract."""
    results = []
    for stmt in split_statements(script):
        df = spark.sql(stmt)
        results.append(df)
        if print_results:
            print("\t".join(df.columns))
            shown = 0
            for row in df.toLocalIterator():
                if max_rows is not None and shown >= max_rows:
                    print(f"-- truncated at {max_rows} rows")
                    break
                print("\t".join("NULL" if v is None else str(v) for v in row))
                shown += 1
    return results
