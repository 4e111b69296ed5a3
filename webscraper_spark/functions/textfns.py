"""Scalar coercion/parsing kernels (SURVEY §2.8 F1–F15).

Each reference kernel is re-expressed twice:
  * a pure-Python function (used by the simulator + pandas-UDF wrappers),
  * where possible, a JVM-side Column expression (preferred in plans —
    whole-stage codegen, no Arrow hop).

Reference behaviors (file:line cited per function; code NOT copied).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- F1: normalize_string (crunchbase_matching.py:18-27) -------------------
# Behavior: transliterate accents → ASCII, drop non-alphanumerics, collapse
# then remove spaces, cut at first '.', lowercase. (unidecode is not in the
# sandbox; NFKD-fold covers the Latin accent cases the reference handles.)

_NON_ALNUM_RE = re.compile(r"[^a-zA-Z0-9 .]")
_WS_RE = re.compile(r"\s+")


def normalize_string(s: str | None) -> str | None:
    if s is None:
        return None
    folded = unicodedata.normalize("NFKD", s)
    folded = "".join(c for c in folded if not unicodedata.combining(c))
    folded = _NON_ALNUM_RE.sub("", folded)
    folded = _WS_RE.sub(" ", folded).strip()
    folded = folded.replace(" ", "")
    folded = folded.split(".", 1)[0]
    return folded.lower()


@F.pandas_udf(T.StringType())
def normalize_string_udf(s: pd.Series) -> pd.Series:
    return s.map(normalize_string)


# --- F6: convalue — human-suffixed counts (Linkedin-Main.py:371-380) -------

def convalue(v: str | None) -> int:
    if v is None:
        return 0
    s = str(v).strip().lower().replace(",", "")
    mult = 1
    if s.endswith("k"):
        mult, s = 1_000, s[:-1]
    elif s.endswith("m"):
        mult, s = 1_000_000, s[:-1]
    try:
        return int(float(s) * mult)
    except ValueError:
        return 0


def convalue_col(c: Column) -> Column:
    """JVM-side twin of :func:`convalue` (codegen'd; no UDF)."""
    s = F.lower(F.trim(c.cast("string")))
    s = F.regexp_replace(s, ",", "")
    num = F.regexp_replace(s, "[km]$", "")
    mult = (
        F.when(s.endswith("k"), F.lit(1000.0))
        .when(s.endswith("m"), F.lit(1000000.0))
        .otherwise(F.lit(1.0))
    )
    parsed = num.try_cast("double")
    return F.coalesce((parsed * mult).cast("long"), F.lit(0).cast("long"))


# --- F7: clean_rating_value (Glassdoor_Scraper_New.py:480-500) -------------

_RATING_KEEP_RE = re.compile(r"[^0-9.]")


def clean_rating_value(v: str | float | None) -> float | None:
    if v is None:
        return None
    s = str(v).strip()
    if not s or s.upper() == "N/A":
        return None
    s = _RATING_KEEP_RE.sub("", s)
    try:
        f = float(s)
    except ValueError:
        return None
    return f if 0.0 <= f <= 5.0 else None


def clean_rating_col(c: Column) -> Column:
    """JVM-side twin: strip non-numerics, parse, null outside [0, 5]."""
    s = F.regexp_replace(F.trim(c.cast("string")), "[^0-9.]", "")
    f = s.try_cast("double")
    return F.when((f >= 0.0) & (f <= 5.0), f)


# --- F2/F3: host extraction & website normalization ------------------------

def filter_domain_col(url: Column) -> Column:
    """Hostname sans leading ``www.`` (glassdoor-script.js:32-39)."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def site_root_col(url: Column) -> Column:
    """scheme://host (Linkedin-Main.py:593-595 website normalization)."""
    return F.concat(
        F.lower(F.parse_url(url, F.lit("PROTOCOL"))),
        F.lit("://"),
        F.lower(F.parse_url(url, F.lit("HOST"))),
    )


# --- F5/F8: ID + count regex extraction ------------------------------------

def extract_id_col(url: Column, pattern: str = r"EI_IE(\d+)") -> Column:
    """Glassdoor-style embedded ID (Glassdoor_url_finder.py:142-147)."""
    return F.regexp_extract(url, pattern, 1)


def parse_count_col(text: Column, pattern: str) -> Column:
    """Comma-tolerant count regex → long (Glassdoor_Scraper_New.py:249-268)."""
    raw = F.regexp_extract(text, pattern, 1)
    return F.when(raw != "", F.regexp_replace(raw, ",", "").try_cast("long"))


# --- F9: filename sanitization (Glassdoor_Scraper_New.py:156-157) ----------

def sanitize_name_col(c: Column) -> Column:
    return F.regexp_replace(c, r"[^\w\-_\.]", "_")


# --- F12: tagged-pair encode/decode (Linkedin-Main.py:145-165) -------------

def encode_tagged_col(record_id: Column, tag: Column) -> Column:
    return F.concat_ws(";", record_id, tag)


def decode_tagged_col(c: Column) -> tuple[Column, Column]:
    parts = F.split(c, ";", 2)
    return parts.getItem(0), parts.getItem(1)


# --- F13: comma-strip int cast (LinkedIn-Updated-Script.py:1132-1136) ------

def int_with_commas_col(c: Column) -> Column:
    return F.regexp_replace(c.cast("string"), ",", "").try_cast("long")


# --- F14: truncate long text (LinkedIn-Updated-Script.py:906-910) ----------

def truncate_text_col(c: Column, limit: int = 100_000) -> Column:
    return F.when(
        F.length(c) > limit, F.concat(F.substring(c, 1, limit), F.lit("..."))
    ).otherwise(c)
