"""URL canonicalization — the crawl-frontier dedup primitive.

The reference's crawler dedups pages by raw URL string equality
(/root/reference/src/coldata/crawler/crawler.py:39-50 keeps a seen-set of
links); at web scale the same page is reached through case-variant hosts,
default ports, fragments, tracking parameters and trailing slashes, so a
canonical form is required before any equality-based dedup.

Everything here is a pure JVM column expression (regexp + array ops inside
whole-stage codegen) — no UDFs, no shuffle.  At 100 TB this runs map-side
during the scan; the subsequent groupBy(canonical_url) is the only shuffle
and benefits from map-side combine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters that never affect page identity.
TRACKING_PARAM_RE = "^(utm_|fbclid=|gclid=|ref=)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    * scheme and host lowercased (path case is preserved — it is significant)
    * the scheme's OWN default port stripped (``:80`` for http, ``:443``
      for https — stripping either from either scheme conflated
      genuinely different origins like ``http://host:443``)
    * fragment dropped
    * tracking query parameters (utm_*, fbclid, gclid, ref) dropped
    * remaining query parameters sorted byte-wise
    * trailing slashes collapsed (``/a/`` == ``/a``; bare host keeps ``/``)
    """
    scheme = F.lower(F.regexp_extract(url, "^([A-Za-z]+)://", 1))
    host_raw = F.lower(F.regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host_raw, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host_raw, ":443$", ""))
        .otherwise(host_raw)
    )
    raw_path = F.regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    stripped = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)

    qs = F.regexp_extract(url, r"[?]([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))

    return F.concat(scheme, F.lit("://"), host, path, query)


# The same canonicalization as DuckDB SQL, for oracle parity.  ``{u}`` is the
# raw-URL SQL expression; every step mirrors canonicalize_url() byte-for-byte.
def canonicalize_url_sql(u: str) -> str:
    return f"""
        concat(
            lower(regexp_extract({u}, '^([A-Za-z]+)://', 1)), '://',
            CASE lower(regexp_extract({u}, '^([A-Za-z]+)://', 1))
                 WHEN 'http' THEN regexp_replace(
                     lower(regexp_extract({u}, '^[A-Za-z]+://([^/?#]+)', 1)),
                     ':80$', '')
                 WHEN 'https' THEN regexp_replace(
                     lower(regexp_extract({u}, '^[A-Za-z]+://([^/?#]+)', 1)),
                     ':443$', '')
                 ELSE lower(regexp_extract({u}, '^[A-Za-z]+://([^/?#]+)', 1))
            END,
            CASE WHEN regexp_replace(
                     regexp_extract({u}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                     '/+$', '') = ''
                 THEN '/'
                 ELSE regexp_replace(
                     regexp_extract({u}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                     '/+$', '') END,
            CASE WHEN len(list_filter(string_split(
                        regexp_extract({u}, '[?]([^#]*)', 1), '&'),
                        p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))) > 0
                 THEN concat('?', array_to_string(list_sort(list_filter(
                        string_split(regexp_extract({u}, '[?]([^#]*)', 1), '&'),
                        p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))), '&'))
                 ELSE '' END
        )
    """
