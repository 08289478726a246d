"""SQL statement classification as a pure column expression.

Reference X1 (query.go:125, 276-289): ``sqlparser.Preview`` (xwb1989/
sqlparser) strips leading comments/whitespace, takes the first word, strips
leading non-letters, lowercases, and switches on it; ``getStmtType`` then
collapses to labels. Note the reference maps ONLY select/insert/update/
delete to labels — ``replace`` previews as StmtReplace and therefore labels
as ``other`` (query.go:276-289), and ``union``/parenthesized selects label
as ``other`` too. We reproduce exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Strip leading whitespace, /* ... */ block comments, and -- line comments,
# repeated in any order (sqlparser.StripLeadingComments behavior).
_LEADING_JUNK = r"^(?s:(?:\s|--[^\n]*(?:\n|$)|/\*.*?\*/)*)"


def classify_statement(col: Column) -> Column:
    """Raw SQL text → label in {select, insert, update, delete, other}."""
    trimmed = F.regexp_replace(col, _LEADING_JUNK, "")
    first_word = F.regexp_extract(trimmed, r"^(\S+)", 1)
    # sqlparser strips leading non-letter runes from the first word.
    word = F.lower(F.regexp_replace(first_word, r"^[^A-Za-z]+", ""))
    return (
        F.when(word.isin("select", "insert", "update", "delete"), word)
        .otherwise(F.lit("other"))
    )
