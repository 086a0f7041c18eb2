"""URL canonicalization — pure Catalyst expressions (whole-stage
codegen, no Python) for the web-crawl dedup/grouping axis.

Crawl pipelines dedup and join on CANONICAL urls: the same document is
fetched as ``http://Example.com/a?utm_source=x#frag`` and
``https://example.com:443/a``, and a byte-level key treats those as
distinct. Each helper returns a Column built from Spark built-ins
(``parse_url``, ``lower``, ``split``/``array_sort``/``array_join``,
regex), so the canonicalization runs inside codegen and composes with
``exact_dedup`` / ``hash_sample`` / ``split_by_hash`` keys directly.

``url_registered_domain`` is the documented last-two-labels heuristic:
correct for generic TLDs (example.com), one label short for ccTLD
registries (bbc.co.uk -> co.uk). Exact registrable domains need the
Public Suffix List — a ~15k-row table; join it broadcast if that
precision matters. The heuristic is deliberate: no bundled data files,
no network.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "url_host",
    "url_path",
    "url_registered_domain",
    "url_normalize",
]

# query params that never identify content (tracking/session noise)
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "ref", "mc_cid", "mc_eid",
)


def _col(url) -> Column:
    return F.col(url) if isinstance(url, str) else url


def url_host(url) -> Column:
    """Lower-cased host, without any ``user:pass@`` prefix, port, or
    trailing root-dot (``example.com.`` is the same FQDN as
    ``example.com``)."""
    host = F.lower(F.parse_url(_col(url), F.lit("HOST")))
    # parse_url keeps userinfo for some inputs; strip defensively
    return F.regexp_replace(F.regexp_replace(host, r"^.*@", ""), r"\.+$", "")


def _url_port(url) -> Column:
    """Explicit port string ('' when absent) — parse_url's HOST part
    never carries it, so it comes from AUTHORITY."""
    auth = F.parse_url(_col(url), F.lit("AUTHORITY"))
    no_user = F.regexp_replace(auth, r"^.*@", "")
    return F.regexp_extract(no_user, r":(\d+)$", 1)


def url_path(url) -> Column:
    """Path with a trailing slash collapsed (``/a/`` == ``/a``; the
    bare root stays ``/``). Empty path becomes ``/``."""
    p = F.parse_url(_col(url), F.lit("PATH"))
    p = F.when(p.isNull() | (p == ""), F.lit("/")).otherwise(p)
    return F.when(p != "/", F.regexp_replace(p, r"/$", "")).otherwise(p)


def url_registered_domain(url) -> Column:
    """Last two host labels (``news.example.com -> example.com``) —
    the grouping key for per-site statistics / per-domain caps. See
    the module docstring for the ccTLD caveat."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


def url_normalize(url, drop_params: tuple = TRACKING_PARAMS) -> Column:
    """Canonical form for dedup keys:

    - scheme: http/https collapse to ``https`` (same document either
      way in a crawl), lower-cased
    - host: lower-cased, trailing root-dot stripped; DEFAULT ports
      (``:80`` on http / ``:443`` on https) dropped, non-default ports
      KEPT — a different explicit port is a different origin
    - path: trailing slash collapsed, empty -> ``/``
    - query: split on ``&``, ``drop_params`` (tracking noise) and empty
      fragments removed, remaining params SORTED (param order never
      identifies content) and rejoined; empty query dropped
    - fragment: dropped (never sent to the server)

    Everything is Spark built-ins — the whole expression inlines into
    the scan's codegen stage.
    """
    c = _col(url)
    orig_scheme = F.lower(F.parse_url(c, F.lit("PROTOCOL")))
    scheme = F.when(orig_scheme.isin("http", "https"), F.lit("https")).otherwise(
        orig_scheme
    )
    host = url_host(c)
    # a NON-default explicit port is a different origin — keep it
    # (default ports, judged against the ORIGINAL scheme, drop)
    port = _url_port(c)
    default_port = (
        (port == "")
        | ((orig_scheme == "http") & (port == "80"))
        | ((orig_scheme == "https") & (port == "443"))
    )
    port_part = F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = url_path(c)
    query = F.parse_url(c, F.lit("QUERY"))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).isin(*drop_params),
        )
    )
    qpart = F.when(
        query.isNotNull() & (F.size(params) > 0),
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, qpart)
