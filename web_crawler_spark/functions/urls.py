"""URL link-extraction / normalization / DNS-candidate functions.

Each function exists twice, with tested parity:

* a **Spark column expression** (JVM-side, whole-stage-codegen friendly —
  the hot path; zero Python in the executor),
* a **pure-Python twin** (used by the sequential reference oracle in
  ``tests/oracle.py`` and by driver-side seed handling).

Reference semantics re-expressed (cited for parity checking, not copied):

* link extraction regex ``https?://[\\w\\-.]+(?::\\d+)?`` — scheme + host
  (+ optional port), paths deliberately stripped, in-page order and
  duplicates preserved  [reference: shared/src/crawler.rs:8-9,55-60]
* normalization: uppercase, strip one scheme prefix (default HTTP://),
  strip one leading ``WWW.``  [reference: shared/src/url_normalize.rs:8-22]
* DNS candidate generation: for ``A.B.C.COM`` try ``C.COM``, ``B.C.COM``,
  ``A.B.C.COM`` up to max_depth suffix labels  [reference: shared/src/dns.rs:15-48]
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java regex equivalent of the reference's Rust regex `https?://[\w\-.]+(?::\d+)?`.
# Rust's \w == [0-9A-Za-z_] (no unicode classes relevant for our corpus); Java's
# \w matches the same ASCII set by default.
URL_REGEX_JAVA = r"https?://[\w\-.]+(?::\d+)?"
_URL_REGEX_PY = re.compile(r"https?://[\w\-.]+(?::\d+)?")

HTTP = "HTTP://"
HTTPS = "HTTPS://"


# ---------------------------------------------------------------------------
# link extraction (reference operator P1)
# ---------------------------------------------------------------------------

def extract_links_col(text: Column) -> Column:
    """All link matches in ``text``, in-page order, duplicates preserved.

    Returns ``array<string>``. JVM-side ``regexp_extract_all`` — no UDF.
    """
    return F.regexp_extract_all(text, F.lit(URL_REGEX_JAVA), 0)


def extract_links_py(text: str) -> list[str]:
    """Python twin of :func:`extract_links_col`."""
    return _URL_REGEX_PY.findall(text)


# ---------------------------------------------------------------------------
# normalization (reference operator P2)
# ---------------------------------------------------------------------------

def normalize_cols(url: Column) -> tuple[Column, Column]:
    """(name, http_type) of a raw URL — uppercased, scheme + one WWW. stripped.

    Pure column expressions (upper / when / regexp_replace), codegen-friendly.
    """
    upper = F.upper(url)
    http_type = F.when(upper.startswith(HTTPS), F.lit(HTTPS)).otherwise(F.lit(HTTP))
    no_scheme = F.regexp_replace(upper, r"^HTTPS?://", "")
    name = F.regexp_replace(no_scheme, r"^WWW\.", "")
    return name, http_type


def full_key_col(url: Column) -> Column:
    """Canonical full key ``http_type + name`` of a raw URL (operator P4)."""
    name, http_type = normalize_cols(url)
    return F.concat(http_type, name)


def normalize_url_py(url: str) -> tuple[str, str]:
    """Python twin of :func:`normalize_cols` -> (name, http_type)."""
    upper = url.upper()
    if upper.startswith(HTTPS):
        rest, proto = upper[len(HTTPS):], HTTPS
    elif upper.startswith(HTTP):
        rest, proto = upper[len(HTTP):], HTTP
    else:
        rest, proto = upper, HTTP
    if rest.startswith("WWW."):
        rest = rest[4:]
    return rest, proto


def full_key_py(url: str) -> str:
    name, proto = normalize_url_py(url)
    return proto + name


# ---------------------------------------------------------------------------
# DNS candidate generation (reference source S2)
# ---------------------------------------------------------------------------

def dns_candidates_col(name: Column, max_depth: int) -> Column:
    """array<string> of candidate domains, shortest suffix first.

    ``A.B.C.COM`` -> [``C.COM``, ``B.C.COM``, ``A.B.C.COM``] capped at
    ``max_depth`` labels; single-label names yield an empty array.
    Built from split/slice/array_join — fully JVM-side.
    """
    parts = F.split(name, r"\.")
    n = F.size(parts)
    # suffix_len ranges over 2..min(max_depth, n); F.slice is 1-based.
    idx = F.sequence(F.lit(2), F.least(F.lit(max_depth), n))
    cands = F.transform(
        idx, lambda k: F.array_join(F.slice(parts, n - k + 1, k), ".")
    )
    return F.when(n >= 2, cands).otherwise(F.array().cast("array<string>"))


def dns_candidates_py(name: str, max_depth: int) -> list[str]:
    """Python twin of :func:`dns_candidates_col`."""
    parts = name.split(".")
    out = []
    for suffix_len in range(2, min(max_depth, len(parts)) + 1):
        out.append(".".join(parts[len(parts) - suffix_len:]))
    return out
