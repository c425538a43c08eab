"""Captioning metrics: tokenizer, CIDEr, METEOR — pure python, jar-free.

The reference's metric stack shells out to two Java jars (PTBTokenizer via
stanford-corenlp, METEOR 1.5 — `test/dvc/metrics/`, SURVEY.md §2.9) that
are large binary blobs. This module reimplements the stack self-contained:

- :func:`ptb_tokenize` — the PTBTokenizer contract as used by
  pycocoevalcap: lowercase, split, drop the standard punctuation list;
- :class:`Cider` — faithful reimplementation of the published CIDEr-D-less
  CIDEr algorithm (TF-IDF n-gram cosine, n=1..4, sigma=6, ×10) matching
  pycocoevalcap's `cider_scorer.py` semantics;
- :class:`Meteor` — METEOR with exact + Porter-stem matching stages and
  the classic parameters (α=0.9, β=3, γ=0.5). NOTE: this is the METEOR
  algorithm, not a bit-exact clone of meteor-1.5.jar (which adds
  paraphrase tables and tuned weights); scores are comparable but not
  identical. If the jar is present on disk a caller can prefer it.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

PUNCTUATIONS = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}

_TOKEN_RE = re.compile(r"[\w']+|[^\w\s]")


def ptb_tokenize(text: str) -> str:
    toks = _TOKEN_RE.findall(text.lower())
    return " ".join(t for t in toks if t not in PUNCTUATIONS)


# ---------------------------------------------------------------------------
# CIDEr
# ---------------------------------------------------------------------------


def _ngrams(words: Sequence[str], n_max: int = 4) -> List[Counter]:
    out = []
    for n in range(1, n_max + 1):
        out.append(Counter(tuple(words[i : i + n]) for i in range(len(words) - n + 1)))
    return out


class Cider:
    """Corpus CIDEr. compute_score(gts, res) -> (corpus_score, per_image).

    gts/res: dict image_id -> list of caption strings (res has exactly 1).
    """

    def __init__(self, n: int = 4, sigma: float = 6.0):
        self.n = n
        self.sigma = sigma

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, np.ndarray]:
        assert sorted(gts.keys()) == sorted(res.keys())
        keys = list(gts.keys())
        crefs = [[_ngrams(self._words(c), self.n) for c in self._caps(gts[k])] for k in keys]
        ctest = [_ngrams(self._words(self._caps(res[k])[0]), self.n) for k in keys]

        # document frequency over reference sets
        doc_freq: Counter = Counter()
        for refs in crefs:
            seen = set(ng for ref in refs for n_idx in range(self.n) for ng in ref[n_idx])
            doc_freq.update(seen)
        log_n_docs = np.log(max(len(crefs), 1))

        def counts2vec(cnts: List[Counter]):
            vec = [defaultdict(float) for _ in range(self.n)]
            norm = [0.0] * self.n
            length = 0
            for n_idx in range(self.n):
                for ng, tf in cnts[n_idx].items():
                    idf = log_n_docs - np.log(max(1.0, doc_freq[ng]))
                    vec[n_idx][ng] = float(tf) * idf
                    norm[n_idx] += vec[n_idx][ng] ** 2
                    if n_idx == 0:
                        length += tf
                norm[n_idx] = np.sqrt(norm[n_idx])
            return vec, norm, length

        def sim(vh, vr, nh, nr, lh, lr):
            delta = float(lh - lr)
            val = np.zeros(self.n)
            for n_idx in range(self.n):
                for ng, w in vh[n_idx].items():
                    val[n_idx] += min(w, vr[n_idx][ng]) * vr[n_idx][ng]
                if nh[n_idx] != 0 and nr[n_idx] != 0:
                    val[n_idx] /= nh[n_idx] * nr[n_idx]
                val[n_idx] *= np.exp(-(delta**2) / (2 * self.sigma**2))
            return val

        scores = []
        for test, refs in zip(ctest, crefs):
            vt, nt, lt = counts2vec(test)
            score = np.zeros(self.n)
            for ref in refs:
                vr, nr, lr = counts2vec(ref)
                score += sim(vt, vr, nt, nr, lt, lr)
            score_avg = np.mean(score / max(len(refs), 1)) * 10.0
            scores.append(score_avg)
        scores = np.array(scores)
        return float(scores.mean()) if len(scores) else 0.0, scores

    @staticmethod
    def _caps(v) -> List[str]:
        return [c["caption"] if isinstance(c, dict) else c for c in v]

    @staticmethod
    def _words(c: str) -> List[str]:
        return c.split()


# ---------------------------------------------------------------------------
# Porter stemmer (classic 1980 algorithm)
# ---------------------------------------------------------------------------

_V = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _V:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    forms = "".join("c" if _is_cons(stem, i) else "v" for i in range(len(stem)))
    return len(re.findall("vc", forms))


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def porter_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    # step 1a
    for suf, rep in (("sses", "ss"), ("ies", "i"), ("ss", "ss"), ("s", "")):
        if w.endswith(suf):
            w = w[: len(w) - len(suf)] + rep
            break
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w, flag = w[:-2], True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w, flag = w[:-3], True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: len(w) - len(suf)]) > 0:
                w = w[: len(w) - len(suf)] + rep
            break
    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: len(w) - len(suf)]) > 0:
                w = w[: len(w) - len(suf)] + rep
            break
    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    pass
                else:
                    w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# METEOR (exact + stem stages)
# ---------------------------------------------------------------------------


class Meteor:
    """METEOR with exact and Porter-stem matching. compute_score mirrors the
    pycocoevalcap interface: (corpus_score, per_image_scores)."""

    def __init__(self, alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5):
        self.alpha, self.beta, self.gamma = alpha, beta, gamma

    def _align(self, hyp: List[str], ref: List[str]) -> Tuple[int, int]:
        """Greedy two-stage alignment → (num_matches, num_chunks)."""
        n = len(hyp)
        match_to = [-1] * n  # hyp idx -> ref idx
        used = [False] * len(ref)
        # stage 1: exact
        for i, hw in enumerate(hyp):
            for j, rw in enumerate(ref):
                if not used[j] and hw == rw:
                    match_to[i], used[j] = j, True
                    break
        # stage 2: stem
        hyp_stem = [porter_stem(w) for w in hyp]
        ref_stem = [porter_stem(w) for w in ref]
        for i in range(n):
            if match_to[i] >= 0:
                continue
            for j in range(len(ref)):
                if not used[j] and hyp_stem[i] == ref_stem[j]:
                    match_to[i], used[j] = j, True
                    break
        matches = sum(1 for m in match_to if m >= 0)
        # chunks: maximal runs of adjacent matches in both strings
        chunks = 0
        prev = None
        for i in range(n):
            if match_to[i] < 0:
                prev = None
                continue
            if prev is None or match_to[i] != prev + 1:
                chunks += 1
            prev = match_to[i]
        return matches, chunks

    def _score_pair(self, hyp: str, ref: str) -> float:
        h, r = hyp.split(), ref.split()
        if not h or not r:
            return 0.0
        m, ch = self._align(h, r)
        if m == 0:
            return 0.0
        p = m / len(h)
        rec = m / len(r)
        fmean = p * rec / (self.alpha * p + (1 - self.alpha) * rec)
        penalty = self.gamma * (ch / m) ** self.beta
        return fmean * (1 - penalty)

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, np.ndarray]:
        assert sorted(gts.keys()) == sorted(res.keys())
        scores = []
        for k in gts:
            hyp = Cider._caps(res[k])[0]
            refs = Cider._caps(gts[k])
            scores.append(max(self._score_pair(hyp, r) for r in refs))
        scores = np.array(scores)
        return float(scores.mean()) if len(scores) else 0.0, scores
