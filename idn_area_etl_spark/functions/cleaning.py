"""Cleansing function library — reference ``utils.py`` semantics as
**native Catalyst column expressions**.

The reference implements these as row-at-a-time Python ``str -> str``
functions (``/root/reference/src/idn_area_etl/utils.py``):

- ``clean_name``            (utils.py:36-38, pipeline :23-33)
- ``fix_wrapped_name``      (utils.py:41-65)
- ``normalize_words``       (utils.py:68-79)
- ``format_coordinate``     (utils.py:189-225, helpers :121-186)

Here every one of them — including the multi-line stateful
``fix_wrapped_name`` and the multi-match ``format_coordinate`` — is a
pure Column expression built from ``regexp_replace`` chains and
higher-order array functions (``aggregate`` / ``filter`` /
``transform``).  That keeps the whole cleansing stage inside Spark's
whole-stage codegen: no Python serde, no UDF boundary, and it scales
linearly with executors at 100 TB.

All builders are null-preserving: NULL in → NULL out (callers coalesce
to '' where the reference guarantees str input).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Python-string semantics helpers.  Spark's trim() removes only ASCII
# spaces; Python's str.strip() removes all whitespace (\t \n \r \f \v).
# ---------------------------------------------------------------------------


def py_strip(col: Column) -> Column:
    """``str.strip()`` semantics as a column expression."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def _py_rstrip(col: Column) -> Column:
    """``str.rstrip()`` semantics."""
    return F.regexp_replace(col, r"\s+$", "")


# ---------------------------------------------------------------------------
# clean_name — order-sensitive regex pipeline (utils.py:23-38).
# ---------------------------------------------------------------------------


def clean_name(col: Column) -> Column:
    """Reference ``clean_name`` (utils.py:36-38).

    strip → drop ``\\r`` → tab→space → kill leading ``^\\d+\\n`` → kill
    trailing ``\\n\\d+$`` → collapse ``\\n+``→space → kill leading
    row-number prefix ``^\\d+\\s+`` → collapse 2+ whitespace → final
    strip.  The order matches utils.py:24-30 exactly (it matters: the
    row-number-prefix rule must run *after* newlines collapse).
    """
    c = py_strip(col)
    c = F.replace(c, F.lit("\r"), F.lit(""))
    c = F.replace(c, F.lit("\t"), F.lit(" "))
    c = F.regexp_replace(c, r"^\d+\n", "")
    c = F.regexp_replace(c, r"\n\d+$", "")
    c = F.regexp_replace(c, r"\n+", " ")
    c = F.regexp_replace(c, r"^\d+\s+", "")
    c = F.regexp_replace(c, r"\s{2,}", " ")
    return py_strip(c)


# ---------------------------------------------------------------------------
# fix_wrapped_name — repair PDF line-wrap artifacts (utils.py:41-65).
#
# The reference walks lines carrying the previously-accepted line as
# state.  That fold is expressed natively with aggregate() over the
# split lines: the accumulator is the array of accepted lines; a short
# lowercase fragment merges into the tail when the tail is long enough
# and doesn't end in '-'.
# ---------------------------------------------------------------------------


def fix_wrapped_name(col: Column, max_line_length: int = 16) -> Column:
    """Reference ``fix_wrapped_name`` (utils.py:41-65) as a native fold.

    Merge a trailing fragment line into the previous line iff: previous
    ≥ ``max_line_length`` chars, fragment ≤ 3 chars, fragment starts
    with a lowercase letter, and previous doesn't end in space/'-'.
    Blank lines are dropped; legitimate multi-word breaks are kept.
    """
    lines = F.filter(
        F.transform(F.split(col, "\n"), _py_rstrip),
        lambda l: l != F.lit(""),
    )

    def step(acc: Column, x: Column) -> Column:
        prev = F.element_at(acc, -1)
        appended = F.concat(acc, F.array(x))
        merged = F.concat(
            F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
            F.array(F.concat(prev, x)),
        )
        mergeable = (
            (F.length(prev) >= F.lit(max_line_length))
            & (F.length(x) <= F.lit(3))
            & ~F.substring(prev, -1, 1).isin(" ", "-")
            & F.substring(x, 1, 1).rlike(r"^\p{Ll}$")
        )
        # Nested CASE keeps element_at(acc, -1) unevaluated on empty
        # accumulators (ANSI mode throws on out-of-bounds element_at).
        return F.when(F.size(acc) == 0, appended).otherwise(
            F.when(mergeable, merged).otherwise(appended)
        )

    return F.aggregate(
        lines,
        F.array().cast("array<string>"),
        step,
        lambda acc: F.array_join(acc, "\n"),
    )


# ---------------------------------------------------------------------------
# normalize_words — de-space headers parsed as single chars
# (utils.py:68-79): "K o d e" -> "Kode"; no-op if any multi-char token.
# ---------------------------------------------------------------------------


def normalize_words(col: Column) -> Column:
    """Reference ``normalize_words`` (utils.py:68-79).

    If every whitespace-separated token is a single char (or '/', '-'),
    join tokens with no separator; otherwise return the stripped input.
    """
    stripped = py_strip(col)
    tokens = F.filter(F.split(stripped, r"\s+"), lambda t: t != F.lit(""))
    has_real_word = F.exists(
        tokens, lambda t: (F.length(t) > 1) & ~t.isin("/", "-")
    )
    return F.when(has_real_word, stripped).otherwise(F.array_join(tokens, ""))


# ---------------------------------------------------------------------------
# format_coordinate — canonicalize DMS coordinates
# (utils.py:189-225; helpers :121-186).
#
# Output: 'DD°MM'SS.ss" N DDD°MM'SS.ss" E' (lat first), else the
# normalized input string as fallback.
# ---------------------------------------------------------------------------

# One flexible pattern (mirrors utils.py:177-186): optional leading OR
# trailing hemisphere around a DMS block.  Group numbers:
#   1=leading hemi, 2=deg, 3=min, 4=sec, 5=trailing hemi
_COORD_PATTERN = (
    r"(?:([NSEW])\s*)?"
    r"(\d{1,3})\s*°\s*"
    r"(\d{1,2})\s*'\s*"
    r"(\d{1,2}(?:\.\d+)?)\s*\"?\s*"
    r"([NSEW])?"
)

# Indonesian hemisphere tokens → N/S/E/W (utils.py:121-134).  Two-letter
# tokens must be replaced before single letters; the final four entries
# just upper-case bare n/s/e/w.
_HEMI_REPLACEMENTS = [
    ("LU", "N"),
    ("LS", "S"),
    ("BT", "E"),
    ("BB", "W"),
    ("U", "N"),
    ("T", "E"),
    ("B", "W"),
    ("N", "N"),
    ("S", "S"),
    ("E", "E"),
    ("W", "W"),
]

_QUOTE_REPLACEMENTS = [
    ("’", "'"),
    ("‘", "'"),
    ("′", "'"),
    ("“", '"'),
    ("”", '"'),
    ("″", '"'),
]


def _normalize_quotes(c: Column) -> Column:
    """Smart quotes/primes → ASCII; collapse duplicated quotes
    (utils.py:137-150)."""
    for a, b in _QUOTE_REPLACEMENTS:
        c = F.replace(c, F.lit(a), F.lit(b))
    c = F.regexp_replace(c, r'"{2,}', '"')
    c = F.regexp_replace(c, r"'{2,}", "'")
    return c


def _map_hemispheres(c: Column) -> Column:
    """Word-bounded, case-insensitive hemisphere token mapping
    (utils.py:121-134, 158-163)."""
    for tok, rep in _HEMI_REPLACEMENTS:
        c = F.regexp_replace(c, r"(?i)\b" + tok + r"\b", rep)
    return c


def _fmt_seconds(sec: Column) -> Column:
    """Pad/truncate seconds to exactly 2 decimals (utils.py:166-173):
    '3' -> '3.00', '3.4' -> '3.40', '3.444' -> '3.44'."""
    whole = F.regexp_extract(sec, r"^(\d+)", 1)
    frac = F.regexp_extract(sec, r"\.(\d+)$", 1)
    return F.concat(whole, F.lit("."), F.substring(F.concat(frac, F.lit("00")), 1, 2))


def _match_hemi(m: Column) -> Column:
    """Leading hemisphere wins over trailing (utils.py:208)."""
    return F.coalesce(
        F.nullif(F.regexp_extract(m, _COORD_PATTERN, 1), F.lit("")),
        F.nullif(F.regexp_extract(m, _COORD_PATTERN, 5), F.lit("")),
    )


def _canonical(m: Column) -> Column:
    """'DD°MM'SS.ss" H' for one regex match string."""
    deg = F.regexp_extract(m, _COORD_PATTERN, 2)
    minutes = F.regexp_extract(m, _COORD_PATTERN, 3)
    secs = _fmt_seconds(F.regexp_extract(m, _COORD_PATTERN, 4))
    return F.concat(
        deg, F.lit("°"), minutes, F.lit("'"), secs, F.lit('" '), _match_hemi(m)
    )


def format_coordinate(col: Column) -> Column:
    """Reference ``format_coordinate`` (utils.py:189-225), fully native.

    Normalize quotes/hemispheres/spaces, scan all DMS matches, pick the
    first latitude (N/S) and first longitude (E/W), emit
    ``lat lon`` canonical form; if either is missing, fall back to the
    normalized string (which preserves e.g. 'U T' -> 'N E').
    """
    s = py_strip(
        F.regexp_replace(_map_hemispheres(_normalize_quotes(col)), r"\s+", " ")
    )
    matches = F.regexp_extract_all(s, F.lit(_COORD_PATTERN), 0)
    lat_m = F.get(F.filter(matches, lambda m: _match_hemi(m).isin("N", "S")), 0)
    lon_m = F.get(F.filter(matches, lambda m: _match_hemi(m).isin("E", "W")), 0)
    return F.when(
        lat_m.isNotNull() & lon_m.isNotNull(),
        F.concat(_canonical(lat_m), F.lit(" "), _canonical(lon_m)),
    ).otherwise(s)
