"""Pair-fit TF-IDF cosine similarity.

The reference verifies a candidate policy by fitting sklearn's
``TfidfVectorizer`` on exactly the pair ``[ground_truth, candidate]``
and taking the cosine of the two rows
(reference: src/crawler.py:43-75, src/verification/verify.py:186-205).

sklearn is unavailable; this reimplements the *exact* numerics of the
sklearn defaults for a 2-document corpus:

  * tokens: ``re.findall(r"(?u)\\b\\w\\w+\\b", text.lower())``
  * tf: raw counts
  * smooth idf: ``ln((1+n)/(1+df)) + 1`` with n=2, so
      df=2 (term in both docs)  -> idf = ln(1) + 1 = 1
      df=1 (term in one doc)    -> idf = ln(1.5) + 1
  * L2-normalised rows, cosine = dot product.

Because only shared terms contribute to the dot product and idf(df=2)=1,
the cosine reduces to a closed form over term-count intersections —
O(|doc| + |shared terms|) per candidate after the ground-truth counts
are precomputed once (broadcast in the Spark layer).
"""

from __future__ import annotations

import math
import re
from collections import Counter

TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")

_IDF_UNIQUE = math.log(1.5) + 1.0  # term present in exactly one doc
_IDF_SHARED = 1.0                  # term present in both docs


def tokenize_counts(text: str) -> Counter:
    """sklearn-default token counts (lowercased, >=2 word chars)."""
    return Counter(TOKEN_RE.findall(text.lower()))


def tfidf_cosine_counts(gt: Counter, cand: Counter) -> float:
    """Cosine of the pair-fit TF-IDF vectors given token counts."""
    if not gt or not cand:
        return 0.0
    if len(gt) <= len(cand):
        small, other = gt, cand
    else:
        small, other = cand, gt
    shared = [t for t in small if t in other]
    if not shared:
        return 0.0
    dot = 0.0
    for t in shared:
        # idf(shared)=1 so tfidf product is just the count product
        dot += gt[t] * cand[t]
    shared_set = set(shared)

    def _norm(c: Counter) -> float:
        acc = 0.0
        for t, n in c.items():
            w = n * (_IDF_SHARED if t in shared_set else _IDF_UNIQUE)
            acc += w * w
        return math.sqrt(acc)

    denom = _norm(gt) * _norm(cand)
    return dot / denom if denom else 0.0


def tfidf_cosine_pair(ground_truth: str, candidate: str) -> float:
    """Drop-in equivalent of the reference ``verify`` similarity
    (reference: src/crawler.py:60-75) minus the English gate, which the
    caller applies first (crawler.py:56-58)."""
    return tfidf_cosine_counts(tokenize_counts(ground_truth),
                               tokenize_counts(candidate))
