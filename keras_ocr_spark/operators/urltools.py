"""URL canonicalization — the web-curation dedup key.

Common-crawl-scale corpora dedup at URL level before any content
fingerprint: the same page arrives as ``HTTP://WWW.Site.COM:80/a/?b=2&
utm_source=feed&a=1#frag`` and ``http://www.site.com/a?a=1&b=2``. This
canonicalizer makes both render identically so an exact groupBy on the
canonical string collapses them:

1. scheme and host lowercased;
2. default port dropped (``:80`` for http, ``:443`` for https) — any
   other explicit port kept;
3. ONE trailing ``/`` stripped from the path, so the root path renders
   as the bare authority (``http://h/`` == ``http://h`` per RFC 3986
   equivalence); path CASE is kept — many servers are case-sensitive,
   only the authority is case-insensitive;
4. tracking parameters removed (name prefixes like ``utm_`` and exact
   names like ``fbclid``), remaining params sorted bytewise and
   rejoined — parameter ORDER never distinguishes two URLs;
5. fragment dropped (never sent to the server).

Everything is built-in Column algebra (regexp_extract, filter/
array_sort/array_join higher-order functions) — a zero-shuffle
whole-stage-codegen projection that rides the scan at 100 TB; the
DuckDB oracle re-expresses the same spec with its own regexp/list
functions, so the driver hash checks two independent implementations.

Reference analog: the reference's URL-keyed dataset download map
(/root/reference/keras_ocr/datasets.py:25-40) keys assets by exact
URL string; canonicalization is what that key needs at web scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Query-parameter name prefixes / exact names that identify tracking
#: params (the C4/CCNet-era cleanup set; extend per corpus).
TRACKING_PREFIXES = ("utm_",)
TRACKING_NAMES = ("fbclid", "gclid", "msclkid", "ref")


def _clean_query(query: Column) -> Column:
    """Filter tracking params out of a raw query string, sort the rest
    bytewise, rejoin with '&'. Empty result -> empty string."""
    params = F.split(query, "&")
    name = lambda p: F.split(p, "=").getItem(0)  # noqa: E731
    keep = F.filter(
        params,
        lambda p: (p != F.lit(""))
        & ~name(p).isin(*TRACKING_NAMES)
        & ~F.exists(
            F.array(*[F.lit(x) for x in TRACKING_PREFIXES]),
            lambda pre: name(p).startswith(pre),
        ),
    )
    return F.array_join(F.array_sort(keep), "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module spec. URLs without a
    ``scheme://`` prefix canonicalize to NULL (not silently passed
    through — an un-parseable key must not collide with a real one)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    authority = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    host = F.regexp_extract(authority, r"^([^:]*)", 1)
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    default = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    netloc = F.when(default, host).otherwise(F.concat(host, F.lit(":"), port))
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    query = _clean_query(F.regexp_extract(url, r"\?([^#]*)", 1))
    canon = F.concat(
        scheme,
        F.lit("://"),
        netloc,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(canon)


def url_host(url: Column) -> Column:
    """Lowercased host (no port) of ``url``; NULL when un-parseable."""
    authority = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    host = F.regexp_extract(authority, r"^([^:]*)", 1)
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)
