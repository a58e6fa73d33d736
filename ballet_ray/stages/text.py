"""Text-analysis stages for large-scale training-data pipelines.

All stateless stages are plain ``map_batches`` functions over Arrow
batches; stages with one-time setup (compiled regexes, stopword tables)
are callable classes run as actor pools. Oracle-parity notes: regex token
counting uses ``[A-Za-z0-9]+`` so DuckDB's
``len(regexp_extract_all(text, '[A-Za-z0-9]+'))`` matches exactly;
fingerprints use md5 so DuckDB's ``md5(text)`` matches exactly.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ballet_ray.transformer import Transform

_WORD_RE = re.compile(r"[A-Za-z0-9]+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "que", "por"},
}


class RegexTokenCount(Transform):
    """# of ``[A-Za-z0-9]+`` matches — DuckDB-parity token counting."""

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        out = {}
        for c in cols:
            texts = table.column(c).to_pylist()
            out[f"{c}_ntok"] = pa.array(
                [len(_WORD_RE.findall(t)) if t is not None else None for t in texts],
                type=pa.int64(),
            )
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_ntok" for c in cols]


class Fingerprint(Transform):
    """md5 hex digest of the column (document fingerprinting / exact-dedup key)."""

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        out = {}
        for c in cols:
            texts = table.column(c).to_pylist()
            out[f"{c}_md5"] = pa.array(
                [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None for t in texts]
            )
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_md5" for c in cols]


class QualityScore(Transform):
    """Cheap document-quality heuristics: word count, mean word length,
    alpha ratio, and a composite score. Formulas kept SQL-expressible:

        words      = len(regexp_extract_all(text, '[A-Za-z0-9]+'))
        mean_wlen  = sum of match lengths / words
        alpha_frac = sum of match lengths / length(text)
        quality    = alpha_frac * min(words, 256) / 256.0
    """

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        c = cols[0]
        texts = table.column(c).to_pylist()
        n = len(texts)
        words = np.zeros(n, dtype=np.int64)
        wlen = np.zeros(n, dtype=np.float64)
        tlen = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            if t is None:
                continue
            ms = _WORD_RE.findall(t)
            words[i] = len(ms)
            wlen[i] = sum(len(m) for m in ms)
            tlen[i] = len(t)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_wlen = np.where(words > 0, wlen / words, 0.0)
            alpha_frac = np.where(tlen > 0, wlen / tlen, 0.0)
        quality = alpha_frac * np.minimum(words, 256) / 256.0
        return pa.table(
            {
                "words": pa.array(words),
                "mean_wlen": pa.array(mean_wlen),
                "alpha_frac": pa.array(alpha_frac),
                "quality": pa.array(quality),
            }
        )

    def output_names(self, cols):
        return ["words", "mean_wlen", "alpha_frac", "quality"]


class LangId:
    """Stopword-hit language scorer — actor-pool stage (regex compiled and
    stopword tables built once per actor in ``__init__``). Emits the argmax
    language and its hit fraction. Heuristic: rows-only oracle."""

    def __init__(self):
        self.word = re.compile(r"[a-z0-9]+")
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, table: pa.Table) -> pa.Table:
        texts = table.column("text").to_pylist()
        langs, fracs = [], []
        for t in texts:
            toks = self.word.findall(t.lower()) if t else []
            best, best_hits = "und", 0
            for lang, stop in self.tables.items():
                hits = sum(1 for w in toks if w in stop)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best)
            fracs.append(best_hits / max(1, len(toks)))
        return table.append_column("pred_lang", pa.array(langs)).append_column(
            "stop_frac", pa.array(fracs, type=pa.float64())
        )


def hash_tokenize(table: pa.Table, text_col: str = "text", vocab: int = 50_257) -> pa.Table:
    """text → (tokens list<int32>, n_tok) by hashing whitespace words into a
    fixed vocab — turns any text table into the canonical north-rule shape."""
    texts = table.column(text_col).to_pylist()
    offsets = [0]
    flat: list[int] = []
    for t in texts:
        ws = _WORD_RE.findall(t) if t else []
        flat.extend(int(hashlib.blake2b(w.encode(), digest_size=4).hexdigest(), 16) % vocab for w in ws)
        offsets.append(len(flat))
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(np.asarray(flat, dtype=np.int32))
    )
    n_tok = pa.array(np.diff(np.asarray(offsets)).astype(np.int32))
    return table.append_column("tokens", tokens).append_column("n_tok", n_tok)
