"""English-language gate.

Exact semantics of the reference gate
(reference: src/verification/verify.py:18-68): a text is "English" when
  * >= 50% of its whitespace-split words (after uppercasing and removing
    every char outside [A-Za-z \t\n]) appear in the dictionary, AND
  * >= 85% of its raw characters are letters/space/tab/newline.

The reference reloads the dictionary file per call (verify.py:27, an
anti-pattern its own comment flags); here the dictionary is loaded once
and passed in / broadcast.
"""

from __future__ import annotations

import re

_NONLETTER_RE = re.compile(r"[^A-Za-z \t\n]+")


def remove_nonletters(text: str) -> str:
    """reference: src/verification/verify.py:39-46 (char-by-char loop
    there; single vectorized regex substitution here)."""
    return _NONLETTER_RE.sub("", text)


def get_english_count(words: frozenset, text: str) -> float:
    """Fraction of words found in the dictionary
    (reference: src/verification/verify.py:26-37; dictionary words are
    stored uppercase)."""
    candidates = remove_nonletters(text.upper()).split()
    if not candidates:
        return 0.0
    matches = sum(1 for w in candidates if w in words)
    return matches / len(candidates)


def is_english(words: frozenset, text: str,
               word_percentage: float = 50, char_percentage: float = 85) -> bool:
    """reference: src/verification/verify.py:48-68"""
    words_match = get_english_count(words, text) * 100 >= word_percentage
    if len(text) == 0:
        letters_pct = 0.0
    else:
        letters_pct = len(remove_nonletters(text)) / len(text) * 100
    return words_match and letters_pct >= char_percentage


def load_dictionary_text(content: str) -> frozenset:
    """Newline-delimited word list -> uppercase membership set
    (reference: src/verification/verify.py:18-24)."""
    return frozenset(w.strip().upper() for w in content.split("\n") if w.strip())
