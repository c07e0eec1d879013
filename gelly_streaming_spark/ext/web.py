"""URL / domain curation — the web-provenance half of a pre-training
corpus pipeline (C4/RefinedWeb-style): canonicalize crawl URLs, extract
the registered domain, and filter against a domain blocklist.

North-star extension (BASELINE.json): no reference counterpart
(gelly-streaming has no document surface).

Everything here is pure column expressions in the Java∩RE2 regex
dialect (the same discipline as ``ext/text.PII_PATTERNS``), so the
operators fuse into the scan with zero shuffles/UDFs AND the DuckDB
oracle can apply the identical transformations (q49).

Canonical form (documented contract, applied in order):
  1. scheme and host lowercased (path/query case preserved)
  2. fragment dropped (``#...``)
  3. tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``),
     with a dangling ``?``/``&`` cleaned up
  4. default ports stripped (``:80`` for http, ``:443`` for https)
  5. trailing slash dropped from a bare host path

Registered domain: the last TWO host labels, or the last THREE when the
suffix is a known multi-part public suffix (co.uk-style). The in-repo
list covers the dominant multi-part suffixes; production swaps in the
full Public Suffix List through the same ``multi_suffixes`` parameter —
the plan shape (one regexp per row, no join) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Dominant multi-part public suffixes (PSL excerpt). Production passes
# the full list; the operator only builds a bigger alternation.
MULTI_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)

_SCHEME_HOST = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
_TRACKING = r"(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*"


def canonicalize_url(url: Column) -> Column:
    """Apply the module's canonical form (see module docstring). Every
    pattern is lookaround-free (RE2-compatible) so the oracle replays
    the identical pipeline — default-port stripping captures the
    following delimiter instead of looking ahead at it."""
    # 1. lowercase scheme+host only: rebuild as lower(prefix) + rest
    prefix = F.regexp_extract(url, _SCHEME_HOST, 1)
    u = F.concat(F.lower(prefix), url.substr(F.length(prefix) + 1, F.length(url)))
    # 2. drop fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. drop tracking params, then clean a dangling '?'/'&' and '?&'
    u = F.regexp_replace(u, _TRACKING, "")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 4. strip default ports (delimiter captured, not looked-ahead)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80($|[/?#])", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443($|[/?#])", "$1$2")
    # 5. trailing slash on a bare host
    u = F.regexp_replace(u, r"^([A-Za-z0-9+.-]+://[^/?#]+)/$", "$1")
    return u


def url_host(url: Column) -> Column:
    """Lowercased host (no port) of a URL."""
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))


def registered_domain(
    host: Column, multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES
) -> Column:
    """Registered (pay-level) domain of a lowercased host: last two
    labels, or last three over a multi-part public suffix."""
    alt = "|".join(s.replace(".", r"\.") for s in multi_suffixes)
    three = F.regexp_extract(host, rf"([^.]+\.({alt}))$", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(three != "", three).otherwise(two)


def domain_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES,
    pin_derived: bool = False,
) -> DataFrame:
    """Append ``url_canon``, ``domain``, and ``blocked`` to ``docs``.

    ``blocklist`` is a one-column (``domain``) table of registered
    domains to flag. Scale shape: the projection fuses into the scan;
    the blocklist (small by nature — even industry lists are ~10⁵ rows)
    joins as an AQE broadcast LEFT SEMI probe marked via a left join on
    the derived domain, so the corpus never shuffles.

    ``pin_derived=True`` barriers the derived columns with a lazy
    localCheckpoint BEFORE the join. Default off — at corpus scale the
    fused one-pass projection is the right shape and a checkpoint would
    materialize the corpus. It exists for BOUNDED certification/test
    runs: without the barrier Catalyst inlines the full regex trees
    (canonical URL + domain, plus whatever expression built ``url_col``)
    into the join key and every output column, and the one-time janino
    compile of that stage measured ~4–10 s — 10x the query's actual
    work at small scale."""
    u = canonicalize_url(F.col(url_col))
    dom = registered_domain(url_host(F.col(url_col)), multi_suffixes)
    out = docs.withColumn("url_canon", u).withColumn("domain", dom)
    if pin_derived:
        out = out.localCheckpoint(eager=False)
    bl = blocklist.select(F.col("domain").alias("domain"), F.lit(True).alias("blocked"))
    return (
        out.join(F.broadcast(bl), "domain", "left")
        .withColumn("blocked", F.coalesce(F.col("blocked"), F.lit(False)))
    )
