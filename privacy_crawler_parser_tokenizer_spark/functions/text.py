"""Native (JVM-side, codegen-friendly) column expressions.

Everything here compiles into whole-stage codegen — no Python in the
hot path.  These are the Spark-first re-expressions of the reference's
per-sentence / per-link Python loops (SURVEY.md §2.3, §2.5): quality
rules as ``rlike``/higher-order-function expressions, URL completion
and canonicalization as string expressions, link junk filters as plain
predicates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.rules import META_PATTERN, PRE_NOISE_PATTERN

# ---------------------------------------------------------------------------
# words & sentence-quality rules (reference: src/statistics/sentences.py)
# ---------------------------------------------------------------------------


def words_col(text: Column) -> Column:
    """Whitespace-split words; empty/blank text -> empty array
    (Python ``"".split() == []`` semantics, sentences.py:58)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_count_col(text: Column) -> Column:
    """reference: src/parser-tokenizer.py:225 ``len(sentence.split())``"""
    return F.size(words_col(text))


def rule_short_col(text: Column, threshold: int = 5) -> Column:
    """reference: sentences.py:49-59"""
    return word_count_col(text) < F.lit(threshold)


def rule_start_cap_col(text: Column) -> Column:
    """Hit when sentence does NOT start with [A-Z] (flag False,
    sentences.py:105-107, rules.json START_CAP)."""
    return ~text.rlike(r"^[A-Z]")


def rule_pre_noise_col(text: Column) -> Column:
    """Numbered-heading prefix (rules.json PRE_NOISE; pattern is
    ^-anchored so rlike == re.match)."""
    return text.rlike(PRE_NOISE_PATTERN)


def rule_end_punc_col(text: Column) -> Column:
    """Hit when NO '!?.' appears anywhere (re.match of ``.*[!?.]``
    succeeds iff one of !?. occurs; flag False inverts)."""
    return ~text.rlike(r"[!?.]")


def rule_head_frag_col(text: Column, threshold: float = 0.6) -> Column:
    """Fraction of words containing an uppercase char > threshold
    (sentences.py:61-79; 0 words -> False)."""
    w = words_col(text)
    ncaps = F.size(F.filter(w, lambda x: x.rlike(r"\p{Lu}")))
    return F.when(F.size(w) == 0, F.lit(False)).otherwise(
        (ncaps / F.size(w)) > F.lit(threshold)
    )


def rule_meta_col(text: Column) -> Column:
    """META marker at sentence start (re.match semantics)."""
    return text.rlike("^" + META_PATTERN)


def rule_hits_col(text: Column) -> Column:
    """Ordered array of rule hits; ``["GOOD"]`` when none
    (reference: sentences.py:81-111).  Pure native expression."""
    hits = F.filter(
        F.array(
            F.when(rule_short_col(text), F.lit("SHORT")),
            F.when(rule_start_cap_col(text), F.lit("START_CAP")),
            F.when(rule_pre_noise_col(text), F.lit("PRE_NOISE")),
            F.when(rule_end_punc_col(text), F.lit("END_PUNC")),
            F.when(rule_head_frag_col(text), F.lit("HEAD_FRAG")),
            F.when(rule_meta_col(text), F.lit("META")),
        ),
        lambda x: x.isNotNull(),
    )
    return F.when(F.size(hits) == 0, F.array(F.lit("GOOD"))).otherwise(hits)


# ---------------------------------------------------------------------------
# URL handling (reference: src/crawler.py:77-136) — fully native
# ---------------------------------------------------------------------------


def clean_link_col(url: Column) -> Column:
    """Fragment strip, query kept (crawler.py:86-87)."""
    return F.split(url, "#", 2).getItem(0)


def complete_link_col(full_url: Column, href: Column) -> Column:
    """Resolve href against the page URL with the reference's quirks
    (crawler.py:123-136), then fragment-strip."""
    completed = (
        F.when(href.contains("http"), href)
        .when(~href.startswith("/"), F.concat(full_url, F.lit("/"), href))
        .when(href.startswith("//"), F.concat(F.lit("http:"), href))
        .otherwise(F.concat(full_url, href))
    )
    return clean_link_col(completed)


def is_junk_href_col(href: Column) -> Column:
    """reference: crawler.py:117-120"""
    low = F.lower(href)
    return (
        low.contains("javascript") | (F.length(href) < 3) | low.contains("mailto:")
    )


def ensure_scheme_col(domain: Column) -> Column:
    """reference: crawler.py:154"""
    return F.when(domain.contains("http"), domain).otherwise(
        F.concat(F.lit("http://"), domain)
    )


def host_of_col(url: Column) -> Column:
    """Lowercased authority of a URL (native regexp)."""
    with_scheme = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    bare = F.split(F.split(url, "/", 2).getItem(0), r"\?", 2).getItem(0)
    return F.lower(F.when(with_scheme != "", with_scheme).otherwise(bare))


def canonicalize_url_col(url: Column) -> Column:
    """Production canonical form, native (north-rule: scheme/host
    lowercase, fragment strip, query-param sort; plus default-port drop,
    path '//' collapse, trailing-slash strip — mirrors
    core.urls.canonicalize_url)."""
    no_frag = clean_link_col(url)
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://(.*)$", 1)
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.when(
        ((scheme == "http") & hostport.endswith(":80"))
        | ((scheme == "https") & hostport.endswith(":443")),
        F.regexp_replace(hostport, r":\d+$", ""),
    ).otherwise(hostport)
    pathq = F.regexp_extract(rest, r"^[^/?]*(.*)$", 1)
    path = F.split(pathq, r"\?", 2).getItem(0)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.when(F.length(path) > 1, F.regexp_replace(path, "/$", "")).otherwise(path)
    query = F.when(
        pathq.contains("?"), F.split(pathq, r"\?", 2).getItem(1)
    ).otherwise(F.lit(""))
    sorted_query = F.concat_ws(
        "&", F.array_sort(F.filter(F.split(query, "&"), lambda p: p != ""))
    )
    base = F.concat(scheme, F.lit("://"), host, path)
    return F.when(scheme == "", no_frag).otherwise(
        F.when(sorted_query != "", F.concat(base, F.lit("?"), sorted_query)).otherwise(base)
    )


# ---------------------------------------------------------------------------
# span-array context (shared by batch pipeline and streaming)
# ---------------------------------------------------------------------------

# Per-kind tag_index and prec_by/proc_by computed INSIDE each document's
# span array with higher-order functions: zero shuffles (a window
# formulation costs 2-3 doc_id exchanges — the dominant parse-stage cost
# at 100 TB) and streaming-safe.  Quirks preserved: tag label is
# kind||tag_index, the first span's predecessor wraps to the LAST span
# (Python -1, reference src/parser-tokenizer.py:87,211-213), proc_by is
# 'None' past the end.
_SPANS_TAGGED = """
    transform({spans}, (s, i) -> named_struct(
      'kind', s.kind, 'text', s.text, 'media_ref', s.media_ref,
      'offset', s.offset,
      'tag_index', size(filter(slice({spans}, 1, i + 1),
                               p -> p.kind = s.kind)) - 1,
      'tag', concat(s.kind, cast(
         size(filter(slice({spans}, 1, i + 1), p -> p.kind = s.kind)) - 1
         AS string))))
"""

_SPANS_CTX = """
    transform(_tagged, (s, i) -> named_struct(
      'kind', s.kind, 'text', s.text, 'media_ref', s.media_ref,
      'offset', s.offset, 'tag_index', s.tag_index, 'tag', s.tag,
      'prec_by', CASE WHEN i = 0 THEN element_at(_tagged, -1).tag
                      ELSE _tagged[i - 1].tag END,
      'proc_by', CASE WHEN i = size(_tagged) - 1 THEN 'None'
                      ELSE _tagged[i + 1].tag END))
"""


def spans_tagged_col(spans_col_name: str = "spans") -> Column:
    return F.expr(_SPANS_TAGGED.format(spans=spans_col_name))


def spans_context_col() -> Column:
    """Apply to a ``_tagged`` column produced by :func:`spans_tagged_col`."""
    return F.expr(_SPANS_CTX)


# ---------------------------------------------------------------------------
# text analytics (training-data pipeline operators, native)
# ---------------------------------------------------------------------------

# small built-in stopword markers per language for the heuristic lang-id
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "fr": ["le", "la", "les", "des", "une", "est", "dans", "pour", "que", "vous"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "auf"],
    "zh": ["的", "是", "在", "了", "我", "有", "和", "不", "人", "这"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + [
    "a", "an", "it", "on", "as", "are", "was", "be", "by", "at", "or", "we",
]


def stopword_ratio_col(text: Column, stopwords=None) -> Column:
    """Fraction of words that are (lowercased) stopwords."""
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    w = words_col(F.lower(text))
    n = F.size(w)
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def punct_ratio_col(text: Column) -> Column:
    """Fraction of characters that are not letters/digits/whitespace."""
    stripped = F.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(text)
    )


def quality_score_col(text: Column) -> Column:
    """Composite document quality score in [0,1]: rewards stopword
    presence and sane length, penalises punctuation soup.  Training-data
    quality heuristic (word-count band 50..2000)."""
    n = word_count_col(text)
    len_ok = F.when((n >= 50) & (n <= 2000), F.lit(1.0)).otherwise(
        F.when(n == 0, F.lit(0.0)).otherwise(F.lit(0.5))
    )
    score = (
        len_ok * 0.4
        + F.least(stopword_ratio_col(text) * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio_col(text) * F.lit(5.0), F.lit(1.0))) * 0.2
    )
    return F.round(score, 6)


def lang_id_col(text: Column) -> Column:
    """Heuristic language ID: the language whose marker-word hit-count
    is highest wins; ties and zero-hit docs -> 'und'.  Deterministic
    tie-break by language code order."""
    w = words_col(F.lower(text))
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        cnt = F.size(F.filter(w, lambda x: F.array_contains(markers, x)))
        scores.append((lang, cnt))
    best = F.greatest(*[c for _, c in scores])
    pred = F.lit("und")
    # reversed so earlier codes win ties via later .when precedence
    for lang, cnt in reversed(scores):
        pred = F.when((cnt == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


def fingerprint_col(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    lowercase/whitespace-collapsed text (content-defined identity for
    exact dedup across engines)."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


# MinHash-LSH band count shared by the batch queries, the streaming
# online-LSH operator, and their tests — one constant, no drift
N_BANDS = 4


def shingle_slots_of_words(w: Column, k: int) -> tuple[Column, Column]:
    """``shingle_slots`` over an already-tokenized word array — for
    callers that materialize the words as a projected attribute BELOW a
    Generate (the english_gate lesson: an inline text expression in the
    generator re-evaluates the split per slice reference; an attribute
    is computed once per doc)."""
    n = F.size(w)
    m = n - F.lit(k - 1)
    return n, F.arrays_zip(*[F.slice(w, i + 1, m) for i in range(k)])


def shingle_slots(text: Column, k: int) -> tuple[Column, Column]:
    """The shared k-gram construction: (word count, zipped struct array
    of k shifted word slices) — ONE definition of the shingle identity
    consumed by both the string form (``shingles_col``) and the int64
    hashed form (``operators.scrub.hashed_shingles_col``), so a
    tokenization change can never fork them.  Built by zipping k
    shifted slices — a sequence+element_at lambda is ~16x slower at
    sf0.1: per-element computed-index lookups defeat codegen."""
    return shingle_slots_of_words(words_col(F.lower(text)), k)


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles as an array (empty when < k words)."""
    n, z = shingle_slots(text, k)
    mk = F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)]))
    return F.when(n < F.lit(k), F.array().cast("array<string>")).otherwise(mk)


def minhash_col(shingles: Column, seed: int) -> Column:
    """One MinHash value: lexicographic min of md5(seed || ':' || s).
    md5-hex min is engine-portable (identical in Spark and DuckDB)."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )
