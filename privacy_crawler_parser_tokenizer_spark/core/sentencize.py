"""Deterministic sentence tokenizer.

The reference uses NLTK punkt (reference: src/parser-tokenizer.py:12,219).
punkt is unavailable here and is non-deterministic across model versions,
so the engine defines its own canonical tokenizer.  The same function is
used by the sequential oracle and by the pandas UDFs, so distributed
output is bit-identical to the oracle by construction.

Canonical rules (punkt-informed, measured against a deterministic
punkt-core proxy on the reference repo's 21 real ground-truth policy
pages — see tools/sentencize_agreement.py; numbers in
BENCH/BASELINE.md):

  * a candidate boundary is ``. ! ?`` followed by optional closing
    quotes/brackets then whitespace, or any run of newlines (block
    breaks always split);
  * a ``.`` boundary is suppressed when the preceding token is a known
    abbreviation (incl. dotted forms like ``e.g.``/``u.s.``) or a
    single initial letter;
  * a ``.`` boundary is suppressed when the next sentence would start
    with a lowercase letter (punkt's orthographic ortho_lc heuristic —
    mid-sentence periods from abbreviations punkt learned but we
    can't); ``!``/``?`` always split.
"""

from __future__ import annotations

import re

_CLOSERS = "\"'’”)\\]»"
_CAND_RE = re.compile(rf"([.!?])([{_CLOSERS}]*)(\s+)|\n+")

_ABBREVS = frozenset(
    """mr mrs ms dr prof rev hon st no jr sr inc ltd co corp vs etc al
    e.g i.e cf ca approx dept est fig figs vol vols pp ex sec chap
    jan feb mar apr jun jul aug sep sept oct nov dec mon tue wed thu fri
    sat sun u.s u.k a.m p.m""".split()
)


def sent_tokenize(text: str) -> list[str]:
    """Split ``text`` into sentences (deterministic, whitespace-trimmed,
    empties dropped).  Canonical replacement for punkt ``sent_tokenize``
    (reference call sites: src/parser-tokenizer.py:152,188,219)."""
    if not text:
        return []
    out: list[str] = []
    start = 0
    for m in _CAND_RE.finditer(text):
        if m.group(1) is None:          # newline run: unconditional split
            seg = text[start:m.start()].strip()
            if seg:
                out.append(seg)
            start = m.end()
            continue
        if m.group(1) == "." and "\n" not in m.group(3):
            # (whitespace containing a newline is a block break: it
            # splits unconditionally — the suppression guards below are
            # for mid-paragraph periods only)
            # abbreviation / initial-letter guard on the preceding token
            prev = text[start:m.start() + 1]
            parts = prev.rsplit(None, 1)
            last = parts[-1] if parts else ""
            word = last.rstrip(".").lower().lstrip("(\"'‘“")
            if word in _ABBREVS or (len(word) == 1 and word.isalpha()):
                continue
            # orthographic heuristic: periods don't split before a
            # lowercase continuation
            nxt = text[m.end():].lstrip()
            if nxt and nxt[0].islower():
                continue
        seg = text[start:m.end(2)].strip()
        if seg:
            out.append(seg)
        start = m.end()
    tail = text[start:].strip()
    if tail:
        out.append(tail)
    return out
