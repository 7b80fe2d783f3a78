"""Sequential round-synchronous crawl oracle — the canonical semantics.

The reference crawler's cross-domain state (``link_dict``/``policy_dict``,
reference: src/crawler.py:350-351) is mutated concurrently by
``2*cpu_count`` processes, so its crawl outcome is racy (SURVEY.md §7).
The rebuild therefore pins a *deterministic* canon that both this oracle
and the distributed Spark frontier implement exactly:

**Round-synchronous execution.**  Time advances in rounds.  In a round,
every non-finished domain issues at most one fetch request (its landing
page, or the next unvisited link in its frontier list).  Per-host
politeness budgets and robots gating decide which requests are granted;
deferred requests retry next round.  Granted requests are *committed in
seed-rank order* within the round, so every cross-domain conflict
(URL-seen insertion, policy-text first-writer) resolves by
``(round, seed_rank, position)`` — exactly the ordering the Spark engine
reproduces with window functions.

Within a domain the reference semantics are preserved verbatim:
  * frontier list is FIFO-with-append, mutated while iterated
    (crawler.py:182,199-201);
  * the expansion budget ``depth_count < max_crawler_depth`` increments
    once per non-empty fetched link page — a page budget, not a true
    depth (crawler.py:196-198);
  * seen-set probes hit the RAW pre-clean href and junk hrefs do enter
    the seen set (crawler.py:110-120);
  * policy-text dedupe is probe-insert on the full stripped text for
    every visited non-empty link page, policy or not
    (crawler.py:209,224; verify.py:142-155);
  * similarity = English gate then pair-fit TF-IDF cosine
    (crawler.py:43-75); duplicates log sim 0.0 (crawler.py:210,225);
  * domain outcome classification (crawler.py:231-236) and doc naming
    ``domain[:-4] + "_" + str(output_count)`` (crawler.py:214).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .english import is_english
from .links import admit_links, extract_candidate_hrefs
from .robots import robots_allows, url_path
from .spans import strip_text
from .tfidf import tfidf_cosine_counts, tokenize_counts
from .urls import ensure_scheme, host_of


@dataclass
class LogRow:
    seed_rank: int
    domain: str
    url: str
    discovery_rank: int
    round: int
    sim: float
    fetched: bool
    valid: bool
    duplicate: bool
    doc_id: str | None

    def key(self):
        return (self.seed_rank, self.discovery_rank)


@dataclass
class OracleResult:
    crawl_log: list[LogRow]
    seen: dict[str, int]                  # raw href -> revisit count
    documents: list[tuple]                # (doc_id, url, html, text)
    outcomes: dict[str, str]              # domain -> outcome class
    sim_avg: dict[str, float]             # domain -> running mean of sims
    rounds: int
    metrics: list[dict] = field(default_factory=list)


@dataclass
class _DomainState:
    seed_rank: int
    domain: str
    full_url: str
    phase: str = "landing"     # landing | active | done
    links: list = field(default_factory=list)
    next_idx: int = 0
    depth_count: int = 0
    output_count: int = 0
    any_valid: bool = False
    had_links: bool = False
    landing_ok: bool = False
    sim_sum_n: tuple = (0.0, 0)


class CrawlOracle:
    """Deterministic reference-semantics crawler over a fixture web.

    Parameters
    ----------
    pages : dict url -> html ("" or missing url = fetch failure,
            reference: src/utils/utils.py:111-181 returns "" on error)
    seeds : ordered list of domains (seed_rank = list index)
    ground_truth : concatenated ground-truth text (already stripped)
    dictionary : uppercase word set for the English gate
    threshold : cosine-similarity acceptance cutoff (crawler.py:205)
    max_depth : per-domain page-expansion budget (crawler.py:196-198)
    host_budget : max granted fetches per host per round (None = no cap)
    robots : dict host -> robots.txt text (None entries allow all)
    """

    def __init__(self, pages, seeds, ground_truth="", dictionary=frozenset(),
                 threshold=0.6, max_depth=3, host_budget=None, robots=None,
                 user_agent="*", priority_fn=None):
        self.pages = pages
        self.seeds = list(seeds)
        self.gt_counts = tokenize_counts(ground_truth)
        self.dictionary = dictionary
        self.threshold = threshold
        self.max_depth = max_depth
        self.host_budget = host_budget
        self.robots = robots or {}
        self.user_agent = user_agent
        # priority queue [NEW]: when the politeness budget is contended,
        # requests are granted by (priority(url), seed_rank); commit
        # order within a round remains seed-rank (the canon).  None =
        # FIFO (constant priority), the reference semantics.
        self.priority_fn = priority_fn or (lambda url: 0)

    # -- primitive steps -------------------------------------------------
    def _fetch(self, url: str) -> str:
        return self.pages.get(url, "") or ""

    def _robots_ok(self, url: str) -> bool:
        txt = self.robots.get(host_of(url))
        return robots_allows(txt, url_path(url), self.user_agent)

    def _verify(self, contents: str) -> float:
        """English gate then TF-IDF pair cosine (crawler.py:43-75)."""
        if not is_english(self.dictionary, contents):
            return 0.0
        return tfidf_cosine_counts(self.gt_counts, tokenize_counts(contents))

    # -- main loop --------------------------------------------------------
    def run(self, max_rounds: int = 10_000) -> OracleResult:
        states = [
            _DomainState(i, d, ensure_scheme(d)) for i, d in enumerate(self.seeds)
        ]
        seen: dict[str, int] = {}
        policy_texts: dict[str, tuple] = {}
        log: list[LogRow] = []
        docs: list[tuple] = []
        metrics: list[dict] = []

        def seen_probe(href: str) -> bool:
            if href in seen:
                seen[href] += 1
                return True
            seen[href] = 0
            return False

        rnd = 0
        for rnd in range(max_rounds):
            due = [s for s in states if s.phase != "done"]
            if not due:
                break
            # politeness: grant up to host_budget fetches per host,
            # ordered by seed_rank (robots-blocked requests consume no
            # budget — no fetch happens)
            granted: list[_DomainState] = []
            host_used: dict[str, int] = {}
            robots_blocked: list[_DomainState] = []
            reqs = []
            for s in due:
                url = (s.full_url if s.phase == "landing"
                       else s.links[s.next_idx])
                if not self._robots_ok(url):
                    robots_blocked.append(s)
                    continue
                reqs.append((self.priority_fn(url), s.seed_rank, s, url))
            # budget allocation order: (priority, seed_rank)
            for _prio, _rank, s, url in sorted(reqs, key=lambda r: r[:2]):
                h = host_of(url)
                used = host_used.get(h, 0)
                if self.host_budget is not None and used >= self.host_budget:
                    continue  # deferred to next round
                host_used[h] = used + 1
                granted.append(s)
            # commit order within the round: seed rank (the canon)
            granted.sort(key=lambda s: s.seed_rank)

            n_fetched = 0
            n_new_links = 0
            n_policies = 0

            # robots-blocked requests are consumed as failed fetches
            for s in robots_blocked:
                if s.phase == "landing":
                    s.phase = "done"
                    s.landing_ok = False
                else:
                    url = s.links[s.next_idx]
                    self._add_sim(s, 0.0)
                    log.append(LogRow(s.seed_rank, s.domain, url, s.next_idx,
                                      rnd, 0.0, False, False, False, None))
                    s.next_idx += 1
                    if s.next_idx >= len(s.links):
                        s.phase = "done"

            # committed in seed-rank order (the canonical in-round order)
            for s in granted:
                if s.phase == "landing":
                    html = self._fetch(s.full_url)
                    n_fetched += 1
                    if strip_text(html) == "":
                        s.phase = "done"
                        s.landing_ok = False
                        continue
                    s.landing_ok = True
                    raw = extract_candidate_hrefs(html)
                    s.links = admit_links(s.full_url, raw, seen_probe)
                    n_new_links += len(s.links)
                    if not s.links:
                        s.phase = "done"
                    else:
                        s.had_links = True
                        s.phase = "active"
                    continue

                # link visit
                url = s.links[s.next_idx]
                html = self._fetch(url)
                contents = strip_text(html)
                n_fetched += 1
                if contents == "":
                    self._add_sim(s, 0.0)
                    log.append(LogRow(s.seed_rank, s.domain, url, s.next_idx,
                                      rnd, 0.0, False, False, False, None))
                    s.next_idx += 1
                    if s.next_idx >= len(s.links):
                        s.phase = "done"
                    continue

                # expansion budget (crawler.py:196-201)
                if s.depth_count < self.max_depth:
                    s.depth_count += 1
                    new_raw = extract_candidate_hrefs(html)
                    new_links = admit_links(s.full_url, new_raw, seen_probe)
                    for link in new_links:
                        if link not in s.links:
                            s.links.append(link)
                            n_new_links += 1

                sim = self._verify(contents)
                is_policy = sim >= self.threshold

                dup = contents in policy_texts
                if not dup:
                    policy_texts[contents] = (s.seed_rank, s.next_idx)

                if is_policy and dup:
                    self._add_sim(s, 0.0)
                    log.append(LogRow(s.seed_rank, s.domain, url, s.next_idx,
                                      rnd, 0.0, True, True, True, None))
                    s.any_valid = True
                elif is_policy:
                    s.output_count += 1
                    doc_id = s.domain[:-4] + "_" + str(s.output_count)
                    docs.append((doc_id, url, html, contents))
                    self._add_sim(s, sim)
                    log.append(LogRow(s.seed_rank, s.domain, url, s.next_idx,
                                      rnd, sim, True, True, False, doc_id))
                    s.any_valid = True
                    n_policies += 1
                elif dup:
                    self._add_sim(s, 0.0)
                    log.append(LogRow(s.seed_rank, s.domain, url, s.next_idx,
                                      rnd, 0.0, True, False, True, None))
                else:
                    self._add_sim(s, sim)
                    log.append(LogRow(s.seed_rank, s.domain, url, s.next_idx,
                                      rnd, sim, True, False, False, None))

                s.next_idx += 1
                if s.next_idx >= len(s.links):
                    s.phase = "done"

            metrics.append({
                "round": rnd, "granted": len(granted), "fetched": n_fetched,
                "new_links": n_new_links, "policies": n_policies,
                "active_domains": len(due),
            })

        outcomes = {}
        sim_avg = {}
        for s in states:
            if not s.landing_ok:
                outcomes[s.domain] = "failed_access"
            elif not s.had_links:
                outcomes[s.domain] = "no_links"
            elif not s.any_valid:
                outcomes[s.domain] = "failed_links"  # crawler.py:233-234
            else:
                outcomes[s.domain] = "successful"
            n = s.sim_sum_n[1]
            sim_avg[s.domain] = (s.sim_sum_n[0] / n) if n else 0.0

        log.sort(key=LogRow.key)  # crawl-order parity key
        return OracleResult(log, seen, docs, outcomes, sim_avg, rnd, metrics)

    @staticmethod
    def _add_sim(s: _DomainState, sim: float):
        """Running mean over logged links == avg (crawler.py:38-41)."""
        total, n = s.sim_sum_n
        s.sim_sum_n = (total + sim, n + 1)
