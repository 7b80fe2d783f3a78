"""Byte-pair-encoding kernels (sequential canon).

The reference counts whitespace words (src/parser-tokenizer.py:225);
the engine's training-data surface adds real subword tokenization: a
deterministic BPE trainer + encoder (Sennrich et al. 2016).  This
module is the sequential canon; ``operators/bpe.py`` runs the SAME
algorithm as iterative Spark aggregations and must produce the
identical merge list (asserted in tests — the frontier-oracle pattern).

Determinism: the next merge is the (count DESC, pair ASC) argmax —
lexicographic tie-break instead of dict order, so any engine (and any
partitioning) picks the same pair.
"""

from __future__ import annotations

import re
from collections import Counter

# Word = maximal run of non-whitespace with WHITESPACE DEFINED AS THE
# JAVA-REGEX DEFAULT CLASS [ \t\n\x0B\f\r]: the distributed trainer
# tokenizes with Spark's split(lower(text), '\s+') (Java regex), and
# Python's \S additionally treats Unicode whitespace (NBSP, ideographic
# space, \x1c-\x1f) as separators — that mismatch would fork the
# word-frequency tables and hence the learned merges between the canon
# and the cluster.  Explicit class == identical tokenization everywhere.
_WORD_RE = re.compile(r"[^ \t\n\x0b\f\r]+")
END = "</w>"


def word_freqs(texts: list[str]) -> Counter:
    """Lowercased whitespace word frequencies over a corpus."""
    c: Counter = Counter()
    for t in texts:
        c.update(_WORD_RE.findall((t or "").lower()))
    return c


def to_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence: characters plus the end-of-word mark."""
    return tuple(word) + (END,)


def pair_counts(freqs: dict[tuple[str, ...], int]) -> Counter:
    c: Counter = Counter()
    for syms, n in freqs.items():
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += n
    return c


def best_pair(counts: Counter) -> tuple[str, str] | None:
    """(count DESC, pair ASC) argmax — the deterministic merge choice."""
    if not counts:
        return None
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def merge_symbols(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Replace every non-overlapping left-to-right occurrence of
    ``pair`` with its concatenation."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(freqs: Counter, n_merges: int) -> list[tuple[str, str]]:
    """Sequential BPE training: ``n_merges`` (count DESC, pair ASC)
    merges over the word-frequency table."""
    table: dict[tuple[str, ...], int] = {
        to_symbols(w): n for w, n in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair = best_pair(pair_counts(table))
        if pair is None:
            break
        merges.append(pair)
        table = _apply_merge(table, pair)
    return merges


def _apply_merge(table: dict[tuple[str, ...], int],
                 pair: tuple[str, str]) -> dict[tuple[str, ...], int]:
    out: dict[tuple[str, ...], int] = {}
    for syms, n in table.items():
        m = merge_symbols(syms, pair)
        out[m] = out.get(m, 0) + n
    return out


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, lowest-rank (earliest-learned)
    pair first — the standard BPE encode loop."""
    syms = to_symbols(word)
    while len(syms) > 1:
        pairs = [(ranks.get(p, None), p) for p in zip(syms, syms[1:])]
        ranked = [(r, p) for r, p in pairs if r is not None]
        if not ranked:
            break
        _, pair = min(ranked)
        syms = merge_symbols(syms, pair)
    return list(syms)


def encode_text(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize a text with a learned merge list."""
    ranks = {p: i for i, p in enumerate(merges)}
    out: list[str] = []
    for w in _WORD_RE.findall((text or "").lower()):
        out.extend(encode_word(w, ranks))
    return out
