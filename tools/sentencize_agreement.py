#!/usr/bin/env python
"""Quantify sentence-boundary divergence between the engine's canonical
regex tokenizer (core/sentencize.py) and a punkt-style reference rule
set, over the 21 REAL ground-truth policy pages the reference repo
ships (data/inputs/ground_truth_html/).

The reference crawler tokenizes with NLTK punkt
(src/parser-tokenizer.py:219).  punkt itself is unavailable in this
sandbox (and is non-deterministic across model versions), so the
comparator here re-implements the *deterministic core* of punkt's
decision procedure (Kiss & Strunk 2006, as realized in
nltk/tokenize/punkt.py):

  * candidate break after . ! ? plus any run of closing quotes/brackets;
  * suppressed when the preceding token is a known abbreviation or a
    single initial letter (punkt's learned abbreviation set approximated
    by its common-English list);
  * ellipsis ("..."/U+2026) breaks only before an upper/digit start;
  * an orthographic heuristic: after a '.' the break needs the next
    token to start with uppercase/digit/quote (punkt's ortho_lc rule);
    '!'/'?' always break.

Metric: per p/h span of each page, sentence-end character offsets from
both tokenizers; report boundary-set F1 + exact-span-agreement rate.
Numbers are recorded in BENCH/BASELINE.md ("sentence tokenizer
divergence").
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setrecursionlimit(100_000)

from privacy_crawler_parser_tokenizer_spark.core.sentencize import sent_tokenize
from privacy_crawler_parser_tokenizer_spark.core.spans import extract_spans

CORPUS = "/root/reference/data/inputs/ground_truth_html"

# punkt's frequently-cited common-English abbreviation behavior
_PUNKT_ABBREVS = frozenset(
    """mr mrs ms dr prof rev hon st no jr sr inc ltd co corp vs etc al
    e.g i.e cf ca approx dept est fig figs vol vols pp ex sec chap
    jan feb mar apr jun jul aug sep sept oct nov dec mon tue wed thu fri
    sat sun u.s u.k a.m p.m""".split()
)
_CLOSERS = "\"'’”)\\]»"


def punkt_proxy_tokenize(text: str) -> list[str]:
    """Deterministic punkt-core splitter (see module docstring)."""
    if not text or not text.strip():
        return []
    # candidate positions: sentence char + closers, then whitespace
    out, start = [], 0
    for m in re.finditer(rf"([.!?]|\.\.\.|…)([{_CLOSERS}]*)\s+", text):
        end = m.end(2)          # include closers in the sentence
        nxt = text[m.end():].lstrip()
        punct = m.group(1)
        if punct == ".":
            # abbreviation / initial guard
            prev = text[start:m.start() + 1]
            last = prev.rsplit(None, 1)[-1] if prev.split() else ""
            word = last.rstrip(".").lower().lstrip("(\"'‘“")
            if word in _PUNKT_ABBREVS or (len(word) == 1 and word.isalpha()):
                continue
            # ortho heuristic: '.' needs an upper/digit/quote start next
            if nxt and not (nxt[0].isupper() or nxt[0].isdigit()
                            or nxt[0] in "\"'‘“("):
                continue
        seg = text[start:end].strip()
        if seg:
            out.append(seg)
        start = m.end()
    tail = text[start:].strip()
    if tail:
        out.append(tail)
    # newlines always split (both rule sets treat block breaks as breaks)
    final = []
    for s in out:
        final.extend(p.strip() for p in s.split("\n") if p.strip())
    return final


def _boundaries(text: str, sents: list[str]) -> set[int]:
    """End offsets of each sentence located in order within ``text``."""
    offs, pos = set(), 0
    for s in sents:
        i = text.find(s, pos)
        if i < 0:
            i = text.find(s)
            if i < 0:
                continue
        pos = i + len(s)
        offs.add(pos)
    return offs


def main() -> None:
    files = sorted(glob.glob(os.path.join(CORPUS, "*")))
    n_spans = agree_spans = 0
    tp = fp = fn = 0
    n_sents_engine = n_sents_punkt = 0
    for f in files:
        html = open(f, encoding="utf-8", errors="replace").read()
        for span in extract_spans(html):
            kind, text = span.kind, span.text
            if kind not in ("p", "h") or not text or not text.strip():
                continue
            a = sent_tokenize(text)
            b = punkt_proxy_tokenize(text)
            n_spans += 1
            n_sents_engine += len(a)
            n_sents_punkt += len(b)
            if a == b:
                agree_spans += 1
            ba, bb = _boundaries(text, a), _boundaries(text, b)
            tp += len(ba & bb)
            fp += len(ba - bb)
            fn += len(bb - ba)
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 1.0
    print(json.dumps({
        "pages": len(files),
        "ph_spans": n_spans,
        "span_exact_agreement": round(agree_spans / n_spans, 4),
        "boundary_precision": round(prec, 4),
        "boundary_recall": round(rec, 4),
        "boundary_f1": round(f1, 4),
        "sents_engine": n_sents_engine,
        "sents_punkt_proxy": n_sents_punkt,
    }))


if __name__ == "__main__":
    main()
