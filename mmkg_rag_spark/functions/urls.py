"""URL canonicalization column functions for web-scale crawl pipelines.

Step 0 of every Common-Crawl-style corpus build (and of the north-rule's
page table keyed by ``url``): the same page arrives under many raw URL
spellings — scheme/host case, ``www.`` prefixes, default ports, trailing
slashes, tracking parameters, shuffled query-parameter order, fragments.
Canonicalizing BEFORE the url-keyed dedup/groupBy is what makes "latest
version per url" (sources/pages.py) and crawl-frontier dedup correct.

Everything here is a *native Catalyst expression builder* — regexp/array
expressions only, no Python UDFs — so canonicalization is a map-only
projection fused into the page scan at any scale. Each builder has an
exact SQL twin used by the DuckDB oracle (``__spark_entry__.py``).

Scope (documented, deliberate): scheme://host[:port]/path[?query][#frag]
URLs without userinfo or IPv6 literals — the shape crawl frontiers emit.

Canonical form:
- scheme and host lower-cased; one leading ``www.`` stripped
- default ports dropped (``:80`` for http, ``:443`` for https); other
  ports kept
- trailing ``/`` runs stripped from the path; empty path becomes ``/``
- query parameters: ``utm_``-prefixed tracking params dropped, the rest
  byte-order sorted and re-joined (order-insensitive identity); an empty
  result drops the ``?``
- fragment dropped (client-side only, never part of page identity)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC-3986-ish split, RE2-safe (no lookaround): scheme :// authority
# [path] [?query] [#fragment].  Groups: 1=scheme 2=authority 3=path
# 4=query 5=fragment.  Non-participating optional groups extract as ''.
URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

# multi-label public suffixes recognized by registered_domain(); a real
# deployment ships the full public-suffix list as a broadcast lookup —
# the expression shape is identical, only the CASE arms grow.
TWO_LEVEL_SUFFIXES = ("co.uk", "ac.uk", "com.au", "co.jp")

DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme ('' when the value is not a scheme://... URL)."""
    return F.lower(F.regexp_extract(url, URL_RE, 1))


def url_host(url: Column) -> Column:
    """Lower-cased host (authority minus any :port)."""
    auth = F.regexp_extract(url, URL_RE, 2)
    return F.lower(F.regexp_extract(auth, r"^([^:]*)", 1))


def url_port(url: Column) -> Column:
    """Explicit port digits ('' when absent)."""
    auth = F.regexp_extract(url, URL_RE, 2)
    return F.regexp_extract(auth, r":([0-9]+)$", 1)


def url_path(url: Column) -> Column:
    """Raw path ('' when absent)."""
    return F.regexp_extract(url, URL_RE, 3)


def url_query(url: Column) -> Column:
    """Raw query string without the '?' ('' when absent)."""
    return F.regexp_extract(url, URL_RE, 4)


def canonical_host(url: Column) -> Column:
    """Lower-cased host with one leading ``www.`` stripped."""
    return F.regexp_replace(url_host(url), r"^www\.", "")


def canonical_query(url: Column) -> Column:
    """Tracking params dropped, survivors byte-order sorted, '&'-joined."""
    params = F.filter(
        F.split(url_query(url), "&"),
        lambda p: (p != F.lit("")) & (~p.startswith("utm_")),
    )
    return F.array_join(F.array_sort(params), "&")


def canonicalize_url(url: Column) -> Column:
    """Full canonical URL string (see module docstring for the rules)."""
    scheme = url_scheme(url)
    host = canonical_host(url)
    port = url_port(url)
    default_port = F.when(scheme == "http", F.lit("80")).otherwise(
        F.when(scheme == "https", F.lit("443")).otherwise(F.lit(""))
    )
    port_part = F.when(
        (port == F.lit("")) | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(url_path(url), r"/+$", "")
    path_part = F.when(path == F.lit(""), F.lit("/")).otherwise(path)
    q = canonical_query(url)
    q_part = F.when(q == F.lit(""), F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, q_part)


def registered_domain(
    host: Column, two_level_suffixes: tuple[str, ...] = TWO_LEVEL_SUFFIXES
) -> Column:
    """Registrable domain of a canonical host (label + public suffix).

    ``cdn.d7.co.uk`` → ``d7.co.uk``; ``cdn.d7.io`` → ``d7.io``; a bare
    single-label host maps to itself. Chained CASE over the (small,
    static) multi-label suffix list — at full public-suffix-list size this
    becomes a broadcast suffix join, same semantics.
    """
    expr = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    for suf in two_level_suffixes:
        lit_suf = suf.replace(".", r"\.")
        expr = F.when(
            host.rlike(r"(^|\.)" + lit_suf + "$"),
            F.regexp_extract(host, r"([^.]+\." + lit_suf + ")$", 1),
        ).otherwise(expr)
    # single-label host (no dot): identity
    return F.when(~host.contains("."), host).otherwise(expr)
