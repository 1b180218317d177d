"""URL column functions for web-crawl corpora.

Canonical URLs are the identity key of a crawl: host extraction feeds the
per-host diversity cap (``curate.cap_per_group``), and URL normalization
(lowercase scheme+host, fragment removal, tracking-parameter stripping)
collapses the aliases a crawler sees of one page BEFORE content dedup has
to pay for them. Everything here is closed-form JVM string expressions —
map-only at 100 TB — and every regex stays in the Java-regex ∩ RE2 subset
so the DuckDB gate oracle runs the identical patterns.

Scope note: registered-domain extraction (public-suffix-list aware) is
deliberately absent — the PSL is an external artifact; ``url_host`` plus
``cap_per_group`` covers the pipeline need without it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://[userinfo@]host[:port] — group 1 = host without port/userinfo
_HOST_RE = r"^[^:/?#]+://(?:[^/@?#]*@)?([^/:?#]+)"
# the whole scheme://authority prefix (to be lowercased as a unit)
_PREFIX_RE = r"^([^:/?#]+://[^/?#]*)"
# query params that track, not address: utm_* and the big click ids
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid)(=.*)?$"


def url_host(url: Column) -> Column:
    """Lowercased host of ``url`` ('' for unparseable strings) — the
    per-host cap / grouping key."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def strip_fragment(url: Column) -> Column:
    """``url`` without its ``#fragment`` (fragments are client-side only —
    never part of page identity)."""
    return F.regexp_replace(url, r"#.*$", "")


def strip_tracking_params(url: Column) -> Column:
    """``url`` with tracking query parameters removed; the ``?`` itself
    goes when nothing survives. Non-tracking params are PRESERVED IN
    ORDER — reordering would merge genuinely different cache keys."""
    base = F.regexp_extract(url, r"^([^?#]*)", 1)
    tail = F.regexp_extract(url, r"(#.*)$", 1)  # keep any fragment intact
    # anchored so the matched '?' must precede any '#' — an unanchored
    # \?([^#]*) would match a '?' INSIDE the fragment and fabricate a
    # top-level query from fragment content
    query = F.regexp_extract(url, r"^[^?#]*\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(TRACKING_PARAM_RE),
    )
    new_query = F.array_join(kept, "&")
    return F.concat(
        base,
        F.when(
            (query == "") | (new_query == ""), F.lit("")
        ).otherwise(F.concat(F.lit("?"), new_query)),
        tail,
    )


def normalize_url(url: Column) -> Column:
    """Canonical form: fragment dropped, scheme+authority lowercased,
    tracking params stripped. Path/query case and order are preserved —
    they are server-significant."""
    defragged = strip_fragment(url)
    prefix = F.regexp_extract(defragged, _PREFIX_RE, 1)
    rest = F.substr(
        defragged, F.length(prefix) + 1, F.length(defragged)
    )
    return strip_tracking_params(F.concat(F.lower(prefix), rest))
