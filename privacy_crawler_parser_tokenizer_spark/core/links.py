"""Candidate policy-link extraction from a page.

Reproduces the reference's ``find_policy_links`` scan
(reference: src/crawler.py:90-138) *except* the global seen-set probe,
which is a frontier concern: the kernel returns every keyword-matching
raw href in document order, and the caller (oracle or Spark frontier)
applies seen-set / junk / completion / in-page-dedupe steps in the
reference's exact order:

    keyword match -> seen probe on RAW href (insert-or-bump,
    crawler.py:110-115) -> junk filters (:117-120) -> completion +
    fragment strip (:123-136) -> ordered in-page dedupe (:137).

The seen probe intentionally precedes the junk filters: junk hrefs DO
enter the seen set in the reference, so both implementations replicate
that.
"""

from __future__ import annotations

from .htmldom import parse_html
from .urls import complete_link

PRIVACY_POLICY_KEYWORDS = ["privacy"]  # reference: src/crawler.py:20


def _hrefs_from_root(root, keywords=None) -> list[str]:
    keywords = keywords or PRIVACY_POLICY_KEYWORDS
    out: list[str] = []
    for kw in keywords:
        for link in root.find_all("a"):
            s = link.string
            if s is None or "href" not in link.attrs:
                continue
            href = link.attrs["href"] or ""
            if kw in s.lower() or kw in href.lower():
                out.append(href)
    return out


def extract_candidate_hrefs(html: str | bytes, keywords=None) -> list[str]:
    """Raw hrefs of <a> tags whose single-string text or href contains a
    keyword (case-insensitive), in document order.  Duplicates retained
    (the caller's seen-set bumps counts on them, crawler.py:111)."""
    if not html:
        return []
    return _hrefs_from_root(parse_html(html), keywords)


def strip_and_candidate_hrefs(html: str | bytes,
                              want_links: bool = True) -> tuple[str, list[str]]:
    """Single-parse (stripped_text, candidate hrefs) for the frontier's
    fused page-processing UDF: link extraction scans the raw tree (the
    reference scans the unmodified page, crawler.py:90-138), THEN the
    bad tags are decomposed in place for the visible-text strip
    (verify.py:70-104) — one parse instead of two."""
    if not html:
        return "", []
    from .spans import BAD_TAGS_REFERENCE

    root = parse_html(html)
    hrefs = _hrefs_from_root(root) if want_links else []
    root.decompose_all(BAD_TAGS_REFERENCE)
    return " ".join(root.stripped_strings()), hrefs


def is_junk_href(href: str) -> bool:
    """reference: src/crawler.py:117-120"""
    low = href.lower()
    return "javascript" in low or len(href) < 3 or "mailto:" in low


def admit_links(full_url: str, raw_hrefs: list[str], seen_probe) -> list[str]:
    """Apply the reference's post-keyword pipeline to raw hrefs.

    ``seen_probe(raw_href) -> bool`` returns True when the href was
    already seen (and bumps its count), False when it inserts it.
    Returns completed+cleaned links with ordered in-page dedupe applied
    (reference: src/crawler.py:108-137).
    """
    links: list[str] = []
    for href in raw_hrefs:
        if seen_probe(href):
            continue
        if is_junk_href(href):
            continue
        links.append(complete_link(full_url, href))
    return list(dict.fromkeys(links))
