"""PII redaction for web-text training corpora.

Emails, IPv4 addresses, and phone numbers are masked with typed
placeholder tokens before text reaches a training set — the standard
compliance pass of a crawl pipeline. Everything is `regexp_replace` /
`regexp_count` over one column: map-only, whole-stage codegen, zero
shuffles — redacting 100 TB is a scan.

Pattern dialect is the Java-regex ∩ RE2 subset (no backreferences, no
lookaround), so the DuckDB gate oracle runs the IDENTICAL pattern
strings; replacement ORDER is fixed (email → ipv4 → phone) and
load-bearing: the ipv4 mask removes dotted digit runs the looser phone
pattern would otherwise swallow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: email first (contains digits/dots), then ipv4, then the loose
# phone pattern over whatever digit runs remain
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}


def redact_pii(
    text: Column, kinds: "tuple[str, ...]" = ("email", "ipv4", "phone")
) -> Column:
    """``text`` with every PII match replaced by ``[<kind>]``.

    ``kinds`` subsets/reorders the pass list, but the default order is the
    safe one (see module docstring)."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind}]")
    return out


def pii_count(text: Column, kind: str) -> Column:
    """Number of matches of one PII kind in ``text`` (pre-redaction).

    Counts use the same sequential-mask semantics as redact_pii: count
    AFTER masking the earlier kinds, so an email's digits are never also
    counted as a phone."""
    out = text
    for earlier in PII_PATTERNS:
        if earlier == kind:
            return F.regexp_count(out, F.lit(PII_PATTERNS[kind]))
        out = F.regexp_replace(out, PII_PATTERNS[earlier], f"[{earlier}]")
    raise KeyError(kind)
