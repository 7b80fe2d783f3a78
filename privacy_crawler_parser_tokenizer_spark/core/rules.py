"""Sentence quality rules.

Semantics pinned to the reference rule engine
(reference: src/statistics/sentences.py:25-111, data/inputs/rules.json):

  SHORT      fewer than <threshold> words                    (threshold 5)
  START_CAP  hit when the sentence does NOT start uppercase  (flag False)
  PRE_NOISE  hit when a numbered-heading prefix matches      (flag True)
  END_PUNC   hit when NO '!?.' appears anywhere              (flag False;
             note Python re.match of ``.*[!?.]`` succeeds iff the string
             contains one of ``!?.`` at any position)
  HEAD_FRAG  fraction of words containing an uppercase char > 0.6
  META       hit when the sentence starts with a <META: .. /META> marker
  GOOD       synthetic: appended iff no other rule hit
             (reference: src/statistics/sentences.py:108-109)

Rules are evaluated in dict insertion order (matches reference JSON order)
so ``rule_hits`` list ordering is reproducible.
"""

from __future__ import annotations

import re

PRE_NOISE_PATTERN = (
    r"^((\d+)|(\d(\.|\-)\d)|(\d(\.|\-)\d(\.|\-)\d))(:|\.)?\s([A-Z]\w+.*?)"
)
META_PATTERN = r"<META:.*/META>"
START_CAP_PATTERN = r"^[A-Z].*"
END_PUNC_PATTERN = r".*[!?.]"

META_LIST_PREFIX = (
    "<META: This element identified as list prefix -- "
    "moved to content string of that list./META>"
)

# (name, kind, param, flag) — kind "regex" uses re.match; flag False
# inverts the hit (reference: src/statistics/sentences.py:102-107).
DEFAULT_RULES: list[tuple] = [
    ("SHORT", "short", 5, True),
    ("START_CAP", "regex", re.compile(START_CAP_PATTERN), False),
    ("PRE_NOISE", "regex", re.compile(PRE_NOISE_PATTERN), True),
    ("END_PUNC", "regex", re.compile(END_PUNC_PATTERN), False),
    ("HEAD_FRAG", "headfrag", 0.6, True),
    ("META", "regex", re.compile(META_PATTERN), True),
]

RULE_NAMES = [name for name, *_ in DEFAULT_RULES] + ["GOOD"]


def is_short(sentence: str, threshold: int = 5) -> bool:
    """reference: src/statistics/sentences.py:49-59"""
    return len(sentence.split()) < threshold


def is_header_fragment(sentence: str, threshold: float = 0.6) -> bool:
    """reference: src/statistics/sentences.py:61-79 (note: raises
    ZeroDivisionError there on empty sentences; we define 0 words -> False)."""
    words = sentence.split()
    if not words:
        return False
    ncaps = sum(1 for w in words if any(c.isupper() for c in w))
    return (ncaps / len(words)) > threshold


def apply_sentence_rules(sentence: str, rules=None) -> list[str]:
    """Names of rules hit by ``sentence``; ``["GOOD"]`` if none
    (reference: src/statistics/sentences.py:81-111)."""
    rules = DEFAULT_RULES if rules is None else rules
    hits: list[str] = []
    for name, kind, param, flag in rules:
        if kind == "short":
            if is_short(sentence, param):
                hits.append(name)
        elif kind == "headfrag":
            if is_header_fragment(sentence, param):
                hits.append(name)
        else:
            matched = param.match(sentence) is not None
            if matched == flag:
                hits.append(name)
    if not hits:
        hits.append("GOOD")
    return hits
