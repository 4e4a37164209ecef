"""String/scalar function parity (SURVEY.md §2.8) — the reference's ad-hoc Go
helpers as Column expressions.

| ref | here |
|---|---|
| whitespace normalize (crawler/main.go:108)            | normalize_ws |
| trim (crawler/main.go:110,220)                        | F.trim (direct) |
| strip ?query + trailing / (crawler/main.go:180-188)   | normalize_url |
| findNthSymbol/findCharPos (crawler/helper_funcs.go:96-110,166-190) | nth_occurrence |
| domain extraction                                     | domain_of |
| JSON encode/decode at API edges (C8)                  | F.to_json/from_json (direct) |
| timestamp stamping (functs_with_elastic.go:311)       | F.current_timestamp (direct) |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_ws(col: Column | str) -> Column:
    """C1: collapse whitespace runs to single spaces + trim."""
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


def normalize_url(col: Column | str) -> Column:
    """S6/C3: strip the query string at '?' and any trailing '/'."""
    return F.regexp_replace(F.substring_index(_c(col), "?", 1), "/+$", "")


def domain_of(col: Column | str) -> Column:
    """C4: host part of a URL."""
    return F.parse_url(_c(col), F.lit("HOST"))


def nth_occurrence(col: Column | str, sub: str, n: int) -> Column:
    """C4: 1-based char position of the n-th occurrence of `sub` (0 if fewer).

    split → rejoin the first n parts: their length + 1 is where the n-th
    separator starts. Pure codegen'd array/string ops."""
    parts = F.split(_c(col), "\\Q" + sub + "\\E")
    prefix = F.concat_ws(sub, F.slice(parts, 1, n))
    return F.when(F.size(parts) > n, F.length(prefix) + 1).otherwise(F.lit(0))
