"""Deterministic synthetic-web + fixture generators (seed-driven).

Replaces live HTTP for tests and benchmarks (FIXTURES.md §3): a closed
link graph with known depth/fan-out whose expected crawl order, seen
set, and politeness behavior the sequential oracle computes.  Includes
hot-host clusters (many URLs on one shared host) to exercise salted
repartitioning, junk/relative/duplicate links per the reference's edge
cases (src/crawler.py:86,117-136), duplicate policy texts across
domains, non-English pages, and fetch failures.

Everything is pure Python + ``random.Random(seed)`` — no network, no
external data.
"""

from __future__ import annotations

import random
import re

# vocabulary pools ----------------------------------------------------------

_POLICY_VOCAB = (
    "privacy policy personal data information collect use share process "
    "cookies tracking consent rights access deletion retention security "
    "third parties partners advertising analytics account email address "
    "location device browser purposes legal obligations contact officer "
    "request children transfer international safeguards updates changes "
    "notify effective date agree terms service provider controller "
    "processor lawful basis legitimate interests marketing preferences "
    "opt out unsubscribe disclose protect store period applicable law"
).split()

_FILLER_VOCAB = (
    "welcome products news shop cart checkout sale blog story sports "
    "weather games music video photo travel food health science culture "
    "review article comment launch update team about careers press events"
).split()

_NON_ENGLISH = (
    "datos privacidad política información recopilamos utilizamos "
    "compartimos galletas seguimiento consentimiento derechos acceso "
    "eliminación retención seguridad terceros socios publicidad"
).split()

GROUND_TRUTH_SENTENCES = 40
DICTIONARY_WORDS = sorted(set(_POLICY_VOCAB + _FILLER_VOCAB + (
    "we you your this that they them from with have will may can our the "
    "and for are not all any how what when where is in of to on at by it "
    "as be or an more other some such only also if do does did been has"
).split()))


def make_dictionary() -> frozenset:
    return frozenset(w.upper() for w in DICTIONARY_WORDS)


def _sentences(rng: random.Random, vocab, n_sent: int, lo=6, hi=14) -> str:
    out = []
    for _ in range(n_sent):
        n = rng.randint(lo, hi)
        ws = [rng.choice(vocab) for _ in range(n)]
        ws += ["we", "the", "and", "your"][: rng.randint(1, 4)]
        rng.shuffle(ws)
        out.append(" ".join(ws).capitalize() + ".")
    return " ".join(out)


def make_ground_truth(seed: int = 42) -> str:
    rng = random.Random(seed * 7919)
    return _sentences(rng, _POLICY_VOCAB, GROUND_TRUTH_SENTENCES)


def _policy_html(rng: random.Random, extra_links: list[str]) -> str:
    body = [
        "<h1>Privacy Policy</h1>",
        f"<p>{_sentences(rng, _POLICY_VOCAB, rng.randint(6, 12))}</p>",
        "<p>We collect the following:</p>",
        "<ul>" + "".join(
            f"<li>{_sentences(rng, _POLICY_VOCAB, 1, 3, 6)}</li>"
            for _ in range(rng.randint(2, 5))
        ) + "</ul>",
        f"<p>{_sentences(rng, _POLICY_VOCAB, rng.randint(4, 8))}</p>",
    ]
    if rng.random() < 0.3:
        body.append('<img src="http://cdn.shared-host.com/logo.png">')
    for href in extra_links:
        body.append(f'<a href="{href}">privacy link</a>')
    return "<html><head><title>Privacy</title></head><body>" + "".join(body) + "</body></html>"


def _filler_html(rng: random.Random, links: list[str], english=True) -> str:
    vocab = _FILLER_VOCAB if english else _NON_ENGLISH
    body = [f"<p>{_sentences(rng, vocab, rng.randint(3, 8))}</p>"]
    for href in links:
        body.append(f'<a href="{href}">privacy notice</a>')
    return "<html><body>" + "".join(body) + "</body></html>"


def gen_web(
    n_domains: int = 20,
    seed: int = 42,
    fail_rate: float = 0.1,
    hot_host_every: int = 5,
    dup_policy_every: int = 7,
    non_english_every: int = 9,
):
    """Build a deterministic synthetic web.

    Returns ``(pages, seeds, robots)``:
      pages  : dict url -> html ('' entries model fetch failures)
      seeds  : ordered domain list (site0000.com ...)
      robots : dict host -> robots.txt text (sparse)

    Shapes exercised: junk links (javascript/mailto/short), fragments,
    relative + protocol-relative hrefs, duplicate hrefs across domains
    (seen-set suppression), hot shared host, duplicate policy texts,
    non-English policies, landing failures, second-hop expansion pages.
    """
    robots: dict[str, str] = {}
    seeds = [f"site{i:04d}.com" for i in range(n_domains)]
    shared_policy = _shared_policy(seed)

    pages: dict[str, str] = {}
    for i in range(n_domains):
        dp, rob = _domain_pages(
            i, seed, fail_rate, hot_host_every, dup_policy_every,
            non_english_every, shared_policy,
        )
        pages.update(dp)
        if rob is not None:
            robots[seeds[i]] = rob

    # hot shared host content
    pages["http://cdn.shared-host.com/privacy-shared"] = shared_policy
    return pages, seeds, robots


def _shared_policy(seed: int) -> str:
    return _policy_html(random.Random(seed * 31), [])


def _domain_pages(
    i: int, seed: int, fail_rate: float, hot_host_every: int,
    dup_policy_every: int, non_english_every: int, shared_policy: str,
) -> tuple[dict[str, str], str | None]:
    """One domain's pages (and robots.txt, or None) — a PURE function of
    (i, seed, knobs): each domain has its own RNG stream, so pages can
    be regenerated lazily per fetch at any scale instead of
    materializing the whole web in driver memory (``gen_web_fn``)."""
    domain = f"site{i:04d}.com"
    base = f"http://{domain}"
    pages: dict[str, str] = {}
    drng = random.Random(seed * 1_000_003 + i)

    if drng.random() < fail_rate:
        pages[base] = ""  # landing fetch failure
        return pages, None

    hot = (i % hot_host_every == 0)
    # raw hrefs are mostly domain-unique so most domains crawl; the
    # shared suffix-less '/privacy' href (every 11th domain) exercises
    # the reference's GLOBAL raw-href seen set (first domain wins,
    # later ones get it suppressed — crawler.py:110-115)
    main_href = "/privacy" if i % 11 == 10 else f"/privacy-{i}#top"
    landing_links = [
        main_href,                       # relative w/ fragment
        f"privacy-center-{i}",           # no leading slash
        "javascript:openPrivacy()",      # junk (shared raw href)
        "x",                             # junk (len<3)
        "mailto:privacy@" + domain,      # junk
    ]
    if hot:
        landing_links.append("//cdn.shared-host.com/privacy-shared")
    pages[base] = _filler_html(drng, landing_links)

    main_path = main_href.split("#", 1)[0]
    # second hop from the policy page
    deep = f"/privacy/details-{i}"
    policy_links = [deep, main_href]  # repeat href: seen-set bump
    if i % dup_policy_every == 3:
        pages[f"{base}{main_path}"] = shared_policy  # cross-domain dup text
    elif i % non_english_every == 4:
        pages[f"{base}{main_path}"] = _filler_html(drng, policy_links, english=False)
    else:
        pages[f"{base}{main_path}"] = _policy_html(drng, policy_links)

    pages[f"{base}/privacy-center-{i}"] = (
        _policy_html(drng, []) if drng.random() < 0.5
        else _filler_html(drng, [])
    )
    if drng.random() < 0.85:
        pages[f"{base}{deep}"] = _policy_html(drng, [])
    # else: dangling link -> fetch failure path

    rob = (
        "User-agent: *\nDisallow: /privacy/details-\n" if i % 6 == 2 else None
    )
    return pages, rob


_SITE_RE = re.compile(r"^http://site(\d{4,})\.com(?:/|$)")


def gen_web_fn(
    n_domains: int,
    seed: int = 42,
    fail_rate: float = 0.1,
    hot_host_every: int = 5,
    dup_policy_every: int = 7,
    non_english_every: int = 9,
    cache_size: int = 4096,
):
    """The 10^6+-URL twin of ``gen_web``: returns ``(fetch_fn, seeds,
    robots)`` where ``fetch_fn(url) -> html`` REGENERATES the owning
    domain's pages on demand (pure per-domain RNG streams) instead of
    materializing the whole web as a driver-side dict.  A 10^6-domain
    web as a broadcast dict is multi-GB pickled into EVERY Python
    worker; this closure ships as a few KB and costs ~100us of RNG per
    domain, LRU-cached per worker.  Byte-identical to ``gen_web`` on
    every URL (parity-tested)."""
    shared_policy = _shared_policy(seed)
    seeds = [f"site{i:04d}.com" for i in range(n_domains)]
    robots = {
        f"site{i:04d}.com": "User-agent: *\nDisallow: /privacy/details-\n"
        for i in range(n_domains)
        if i % 6 == 2
        # failed-landing domains never reach the robots line in gen_web
        and random.Random(seed * 1_000_003 + i).random() >= fail_rate
    }

    # hand-rolled FIFO cache: lru_cache-wrapped closures don't pickle
    # into Spark workers; a dict closure does (ships empty, fills
    # per-worker)
    cache: dict[int, dict[str, str]] = {}

    def domain_pages(i: int) -> dict[str, str]:
        dp = cache.get(i)
        if dp is None:
            if len(cache) >= cache_size:
                cache.pop(next(iter(cache)))
            dp = _domain_pages(
                i, seed, fail_rate, hot_host_every, dup_policy_every,
                non_english_every, shared_policy,
            )[0]
            cache[i] = dp
        return dp

    def fetch(url: str) -> str:
        if url == "http://cdn.shared-host.com/privacy-shared":
            return shared_policy
        m = _SITE_RE.match(url)
        if not m:
            return ""
        i = int(m.group(1))
        if i >= n_domains:
            return ""
        return domain_pages(i).get(url, "")

    return fetch, seeds, robots


# span-document fixtures (FIXTURES.md §1) -----------------------------------


def gen_span_docs(n_docs: int = 50, seed: int = 42) -> list[tuple]:
    """Deterministic (doc_id, spans) rows exercising extraction edge
    cases; rendered to HTML via render_spans_html for round-trips."""
    rng = random.Random(seed * 104729)
    rows = []
    for i in range(n_docs):
        spans = []
        off = 0
        for _ in range(rng.randint(2, 10)):
            kind = rng.choice(["p", "p", "p", "h", "l", "media"])
            if kind == "media":
                spans.append(("media", None, f"http://cdn.x.com/m{i}_{off}.png", off))
            elif kind == "l":
                items = "\n".join(
                    _sentences(rng, _POLICY_VOCAB, 1, 3, 5) for _ in range(rng.randint(1, 4))
                )
                spans.append(("l", items + "\n", None, off))
            else:
                spans.append((kind, _sentences(rng, _POLICY_VOCAB, rng.randint(1, 4)) + "\n", None, off))
            off += 1
        rows.append((f"doc{i:04d}", spans))
    return rows
