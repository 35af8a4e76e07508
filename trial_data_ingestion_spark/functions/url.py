"""URL normalization and domain extraction — native Column
expressions for web-corpus curation (dedup by canonical URL,
per-domain caps, domain blocklists).

Everything here is regexp/string expressions inside whole-stage
codegen: no Python, no UDF, fully pushdown-friendly.  The domain
logic is registrable-domain-approximate: without a public-suffix
table the last two labels are taken, except for a built-in set of
common two-level public suffixes (co.uk, com.au, ...) where three
labels are kept.  That approximation is documented-by-design — swap
``TWO_LEVEL_SUFFIXES`` for a full public-suffix snapshot when
exactness matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: common two-level public suffixes (extend freely; a full snapshot
#: of publicsuffix.org slots in without code changes)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "ac.jp", "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "net.br", "org.br", "co.in", "net.in", "org.in",
    "com.cn", "net.cn", "org.cn", "co.kr", "or.kr", "com.mx",
    "com.ar", "com.tr", "co.za", "com.sg", "com.hk", "co.nz",
)


def normalize_url(url: Column) -> Column:
    """Canonical form for exact-URL dedup: lowercase scheme+host,
    scheme defaulted, fragment dropped, default ports stripped,
    trailing slash on a bare path removed, tracking query params
    (utm_*, fbclid, gclid) removed (query order otherwise kept —
    reordering keys can change semantics on some sites)."""
    u = F.trim(url)
    # drop fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # default scheme, lowercase scheme+authority
    u = F.when(~u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"),
               F.concat(F.lit("http://"), u)).otherwise(u)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    tail = F.regexp_replace(rest, r"^[^/?]*", "")
    # strip default ports
    authority = F.when(scheme == "http",
                       F.regexp_replace(authority, r":80$", "")) \
                 .when(scheme == "https",
                       F.regexp_replace(authority, r":443$", "")) \
                 .otherwise(authority)
    # drop tracking params, then a dangling '?' or '&'
    tail = F.regexp_replace(
        tail, r"(?i)[?&](?:utm_[a-z]+|fbclid|gclid)=[^&#]*", "")
    # if the '?' itself was stripped, promote the first remaining '&'
    tail = F.regexp_replace(tail, r"^([^?&]*)&", "$1?")
    tail = F.regexp_replace(tail, r"\?$", "")
    out = F.concat(scheme, F.lit("://"), authority, tail)
    # bare trailing slash: http://x.com/ == http://x.com
    return F.regexp_replace(out, r"^([a-z0-9+.-]+://[^/?]+)/$", "$1")


def host_of(url: Column) -> Column:
    """Lowercased hostname (port and userinfo stripped)."""
    u = F.trim(url)
    u = F.when(~u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"),
               F.concat(F.lit("http://"), u)).otherwise(u)
    auth = F.lower(F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    auth = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.regexp_replace(auth, r":\d+$", "")


def registered_domain(url: Column) -> Column:
    """Approximate registrable domain of ``url`` (see module
    docstring): 'a.b.co.uk' -> 'b.co.uk', 'x.y.example.com' ->
    'example.com', bare hosts/IPs pass through."""
    host = host_of(url)
    two = "|".join(s.replace(".", r"\.") for s in TWO_LEVEL_SUFFIXES)
    three_label = F.regexp_extract(
        host, r"([^.]+\.(?:" + two + r"))$", 1)
    two_label = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return (F.when(is_ip, host)
             .when(three_label != "", three_label)
             .when(two_label != "", two_label)
             .otherwise(host))
