"""URL cleaning, completion and canonicalization kernels.

Two modes:
  * **reference-compat** (`clean_link`, `complete_link`): byte-exact
    reproduction of the reference's link handling
    (reference: src/crawler.py:77-88,117-136) — fragment strip only,
    query string KEPT (the '?' split is commented out at crawler.py:87),
    scheme-completion quirks preserved.  Used wherever crawl-order /
    seen-set parity is asserted.
  * **canonical** (`canonicalize_url`): the engine's production
    canonicalizer — lowercase scheme+host, strip fragment, sort query
    params, drop default ports, collapse duplicate slashes in the path.
"""

from __future__ import annotations

import re

_URL_PARTS_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*):\/\/(?P<host>[^\/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$"
)
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def clean_link(link: str) -> str:
    """Strip the fragment, keep the query (reference: src/crawler.py:77-88)."""
    return link.split("#", 1)[0]


def complete_link(full_url: str, href: str) -> str:
    """Resolve an href against the page URL with the reference's rules
    (reference: src/crawler.py:123-136) and clean it.

    Note the quirks: "absolute" means the substring ``http`` appears
    anywhere; relative links are joined with a bare '/', not RFC 3986
    resolution; protocol-relative '//' hosts are forced to http.
    """
    if "http" in href:
        return clean_link(href)
    if not href.startswith("/"):
        href = full_url + "/" + href
    elif href[:2] == "//":
        href = "http://" + href[2:]
    else:
        href = full_url + href
    return clean_link(href)


def ensure_scheme(domain: str) -> str:
    """reference: src/crawler.py:154 — prefix http:// unless the
    substring ``http`` already appears anywhere in the domain."""
    return domain if "http" in domain else "http://" + domain


def host_of(url: str) -> str:
    """Lowercased authority (host[:port]) of a URL; '' when unparseable."""
    m = _URL_PARTS_RE.match(url)
    if not m:
        # scheme-less: take up to first / ? #
        return url.split("/", 1)[0].split("?", 1)[0].lower()
    return m.group("host").lower()


def canonicalize_url(url: str) -> str:
    """Production canonical form (north-rule superset):
    lowercase scheme+host, strip fragment, sort query params by
    (key, value), drop default ports, collapse '//' runs in the path,
    strip a single trailing '/' from a non-root path."""
    m = _URL_PARTS_RE.match(url)
    if not m:
        return clean_link(url)
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    default = _DEFAULT_PORTS.get(scheme)
    if default and host.endswith(default):
        host = host[: -len(default)]
    path = re.sub(r"/{2,}", "/", m.group("path") or "")
    if path.endswith("/") and len(path) > 1:
        path = path[:-1]
    query = m.group("query")
    if query:
        params = sorted(p for p in query.split("&") if p != "")
        query = "&".join(params)
    out = f"{scheme}://{host}{path}"
    if query:
        out += "?" + query
    return out
