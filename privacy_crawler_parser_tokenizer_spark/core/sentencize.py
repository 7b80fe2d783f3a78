"""Deterministic sentence tokenizer.

The reference uses NLTK punkt (reference: src/parser-tokenizer.py:12,219).
punkt is unavailable here and is non-deterministic across model versions,
so the engine defines its own canonical tokenizer: a regex splitter with
a small abbreviation guard.  The same function is used by the sequential
oracle and by the pandas UDFs, so distributed output is bit-identical to
the oracle by construction.

Canonical rule: a sentence boundary is whitespace preceded by one of
``. ! ?``, or any run of newlines.  A boundary is suppressed when the
text before it ends in a known abbreviation or a single initial letter.
"""

from __future__ import annotations

import re

_BOUNDARY_RE = re.compile(r"(?<=[.!?])\s+|\n+")

_ABBREVS = frozenset(
    "mr mrs ms dr prof inc ltd co corp vs etc st no jr sr".split()
)


def sent_tokenize(text: str) -> list[str]:
    """Split ``text`` into sentences (deterministic, whitespace-trimmed,
    empties dropped).  Canonical replacement for punkt ``sent_tokenize``
    (reference call sites: src/parser-tokenizer.py:152,188,219)."""
    if not text:
        return []
    out: list[str] = []
    buf = ""
    for piece in _BOUNDARY_RE.split(text):
        if piece is None:
            continue
        piece = piece.strip()
        if not piece:
            continue
        candidate = (buf + " " + piece) if buf else piece
        if candidate.endswith("."):
            last = candidate[:-1].rsplit(None, 1)
            lw = last[-1].rstrip(".").lower() if last else ""
            if lw in _ABBREVS or (len(lw) == 1 and lw.isalpha()):
                buf = candidate
                continue
        out.append(candidate)
        buf = ""
    if buf:
        out.append(buf)
    return out
