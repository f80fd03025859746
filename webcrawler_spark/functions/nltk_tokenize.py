"""X14 faithful path: the reference's tokenizer, reproduced exactly.

The reference tokenizes page text with ``nltk.word_tokenize`` and then
post-processes each token (``implementation-indexing/processing.py:17-21``):
keep only ``str.isalnum()`` characters, lowercase, drop empties and
Slovene stopwords. nltk is not installed in this container, so this
module re-implements the tokenizer from the PUBLIC rule set of
``nltk.tokenize.NLTKWordTokenizer`` (the ``word_tokenize`` backend since
nltk 3.5, 2020 — the reference project era), which is itself a published
regex cascade descending from Robert MacIntyre's Penn Treebank sed
script.

Why no Punkt sentence model is needed: ``word_tokenize`` runs the word
tokenizer per Punkt-detected sentence, and the only rules whose effect
depends on the sentence boundary are the ``$``-anchored ones (final
period, trailing colon/comma). Those rules only decide whether trailing
punctuation is split into its OWN token — and the reference's
``isalnum`` strip then deletes that punctuation either way, from a
separate token (→ empty → dropped) or from the word's tail. The
alnum-stripped token stream is therefore invariant to sentence
segmentation — with one scoped exception: the English contraction rules
(CONTRACTIONS2/ENDING_QUOTES) anchor on a following space, so a
contraction immediately before a sentence-final period ("...wanna.")
splits under per-sentence nltk but not here. That shape does not occur
in the Slovene corpus (the validation below is exact); callers using
``tokens_nltk`` on English prose should know the caveat. (Punkt's
pickled parameters are unavailable here regardless; the validation
certifies the equivalence empirically.)

Validation against the reference's own published artifacts (asserted in
``tests/test_real_corpus_index.py`` over the real 1,416-page corpus):

* all 54 per-document query frequencies readable in the report's result
  screenshots (``report/*.png``) — exact;
* every legible published snippet window (~60 six-token windows of the
  filtered stream) — byte-exact;
* global max-frequency word 'slovenije' = 9,105 — exact;
* max single-document posting 'proizvodnja' = 2,266 — exact;
* vocabulary 48,398 vs published 48,081 (+0.66%) — residual attributed
  to the nltk 'slovene' stopword corpus file (see
  ``stopwords_sl.NLTK_SLOVENE_EVIDENCED``), which is data this container
  does not ship.

Scale shape: tokenization is per-row Python regex work, so the Spark
surface is an Arrow-batched pandas UDF (``tokens_nltk``) — the 10-100×
vectorized-transfer path, never row-at-a-time Python. For pipelines that
don't need reference-exact tokens, ``text.tokens_unicode`` remains the
pure-Catalyst (whole-stage-codegen) tokenizer.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: F401  (kept for API symmetry)
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# NLTKWordTokenizer rule cascade (public: nltk/tokenize/destructive.py).
_STARTING_QUOTES = [
    (re.compile("([«“‘„]|[`]+)", re.U), r" \1 "),
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
    (re.compile(r"(?i)(\')(?!re|ve|ll|m|t|s|d|n)(\w)\b", re.U), r"\1 \2"),
]
_PUNCTUATION = [
    (re.compile(r'([^\.])(\.)([\]\)}>"\'' "»”’ " r"]*)\s*$", re.U), r"\1 \2 \3 "),
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.{2,}", re.U), r" \g<0> "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
    (re.compile(r"[*]", re.U), r" \g<0> "),
]
_PARENS_BRACKETS = [(re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> ")]
_DOUBLE_DASHES = [(re.compile(r"--"), r" -- ")]
_ENDING_QUOTES = [
    (re.compile("([»”’])", re.U), r" \1 "),
    (re.compile(r"''"), " '' "),
    (re.compile(r'"'), " '' "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]
_CONTRACTIONS2 = [re.compile(p) for p in (
    r"(?i)\b(can)(?#X)(not)\b", r"(?i)\b(d)(?#X)('ye)\b",
    r"(?i)\b(gim)(?#X)(me)\b", r"(?i)\b(gon)(?#X)(na)\b",
    r"(?i)\b(got)(?#X)(ta)\b", r"(?i)\b(lem)(?#X)(me)\b",
    r"(?i)\b(mor)(?#X)('n)\b", r"(?i)\b(wan)(?#X)(na)\s",
)]
_CONTRACTIONS3 = [re.compile(p) for p in (
    r"(?i) ('t)(?#X)(is)\b", r"(?i) ('t)(?#X)(was)\b",
)]


def word_tokenize_text(text: str) -> list[str]:
    """nltk ``word_tokenize`` equivalent on the alnum-stripped stream
    (see module docstring for the sentence-invariance argument)."""
    for rx, sub in _STARTING_QUOTES:
        text = rx.sub(sub, text)
    for rx, sub in _PUNCTUATION:
        text = rx.sub(sub, text)
    for rx, sub in _PARENS_BRACKETS:
        text = rx.sub(sub, text)
    for rx, sub in _DOUBLE_DASHES:
        text = rx.sub(sub, text)
    text = " " + text + " "
    for rx, sub in _ENDING_QUOTES:
        text = rx.sub(sub, text)
    for rx in _CONTRACTIONS2:
        text = rx.sub(r" \1 \2 ", text)
    for rx in _CONTRACTIONS3:
        text = rx.sub(r" \1 \2 ", text)
    return text.split()


def clean_tokens(text: str) -> list[str]:
    """processing.py:17-21 minus the stopword filter: tokenize, keep
    alnum chars per token, lowercase, drop empties. Stopword removal is
    left to the caller (Catalyst ``remove_stopwords`` in the Spark path)
    so positions are computed over the same stream either way."""
    out = []
    for w in word_tokenize_text(text):
        w = "".join(ch for ch in w if ch.isalnum())
        if w:
            out.append(w.lower())
    return out


def reference_tokens(text: str, stopwords: frozenset[str]) -> list[str]:
    """The complete reference pipeline (processing.py:17-21): the
    filtered token stream whose indices the postings' positions use."""
    return [w for w in clean_tokens(text) if w not in stopwords]


@pandas_udf(T.ArrayType(T.StringType()))
def _clean_tokens_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: clean_tokens(t) if t is not None else None)


def tokens_nltk(col: Column | str) -> Column:
    """Column form of :func:`clean_tokens` — drop-in ``tokenizer=`` for
    ``build_postings`` / ``snippets`` / ``search_scan``. Arrow-batched;
    the per-batch work is the same regex cascade nltk itself runs."""
    return _clean_tokens_udf(col)
