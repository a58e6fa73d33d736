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
    """# of ``[A-Za-z0-9]+`` matches — DuckDB-parity token counting.

    Fully vectorized: ``pc.count_substring_regex`` is a C++ RE2 kernel, no
    per-row Python loop."""

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        out = {}
        for c in cols:
            n = pc.count_substring_regex(table.column(c), pattern="[A-Za-z0-9]+")
            out[f"{c}_ntok"] = pc.cast(n, pa.int64())
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


#: conservative RE2-compatible PII patterns (work identically in pyarrow's
#: RE2 and DuckDB's regexp_* — no lookarounds, no backrefs)
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{7,}\b", "<NUM>"),
]


class RegexRedactor(Transform):
    """Sequential regex redaction (PII scrubbing for training corpora).

    Each ``(pattern, replacement)`` is applied in order with vectorized
    RE2 kernels (``pc.replace_substring_regex``); ``n_redactions`` counts
    total matches before replacement. Patterns restricted to RE2 syntax
    so the same strings run in DuckDB's regexp functions — oracle parity.
    Default patterns: :data:`PII_PATTERNS`.
    """

    def __init__(self, patterns: list[tuple[str, str]] | None = None):
        self.patterns = list(patterns or PII_PATTERNS)

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        out = {}
        for c in cols:
            col = pc.cast(table.column(c), pa.string())
            hits = np.zeros(len(table), dtype=np.int64)
            for pat, repl in self.patterns:
                hits += pc.count_substring_regex(col, pattern=pat).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
            out[f"{c}_redacted"] = col
            out[f"{c}_n_redactions"] = pa.array(hits)
        return pa.table(out)

    def output_names(self, cols):
        return [x for c in cols for x in (f"{c}_redacted", f"{c}_n_redactions")]


#: named per-doc PII detectors (Dolma's pii attribute set: Soldaini et al.
#: 2024 §2.3 publishes email / phone / IP regex taggers). RE2-only (no
#: lookarounds, no backrefs) so pyarrow's ``count_substring_regex`` and
#: DuckDB's ``regexp_extract_all`` count the identical non-overlapping
#: leftmost matches — the signal stage is SQL-oracle-checkable.
PII_SIGNAL_PATTERNS: dict[str, str] = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # leading \b only on the bare-digit branch: '(' and '+' are non-word
    # chars, so a pattern-wide \b would make those prefixes unreachable
    "phones": r"(\+\d{1,2}[ .-]?)?(\(\d{3}\)|\b\d{3})[ .-]?\d{3}[ .-]?\d{4}\b",
    "ip_addresses": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


class PiiSignals(Transform):
    """Per-document PII detection counts (the Dolma quality-attribute
    shape: emit ``n_<kind>`` per detector plus a total, so downstream
    policy — drop, redact, or weight — is a separate filter decision
    from detection).

    One vectorized ``pc.count_substring_regex`` pass per named pattern;
    no per-row Python. Patterns default to :data:`PII_SIGNAL_PATTERNS`
    and are restricted to RE2 syntax for DuckDB oracle parity. To scrub
    rather than count, use :class:`RegexRedactor`.
    """

    def __init__(self, patterns: dict[str, str] | None = None):
        self.patterns = dict(PII_SIGNAL_PATTERNS if patterns is None else patterns)
        if not self.patterns:
            raise ValueError("patterns must be non-empty")

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        out = {}
        for c in cols:
            col = pc.cast(table.column(c), pa.string())
            total = np.zeros(len(table), dtype=np.int64)
            for name, pat in self.patterns.items():
                n = pc.count_substring_regex(col, pattern=pat).to_numpy(
                    zero_copy_only=False
                )
                n = np.nan_to_num(n, nan=0.0).astype(np.int64)
                out[f"{c}_n_{name}"] = pa.array(n)
                total += n
            out[f"{c}_n_pii"] = pa.array(total)
        return pa.table(out)

    def output_names(self, cols):
        return [x for c in cols
                for x in ([f"{c}_n_{n}" for n in self.patterns] + [f"{c}_n_pii"])]


class PiiSpans(Transform):
    """Per-document PII SPANS — Dolma's span-tagger shape (Soldaini 2024
    §2.3): the attribute sidecar records character offsets per detector so
    the mix step can redact WITHOUT re-scanning the text. One output
    column per pattern, ``{col}_{kind}_spans: list<int32>`` of flattened
    ``(start, end)`` pairs in Python-str (codepoint) offsets — primitive
    lists so the columns survive parquet round-trips and the mix join's
    list packing (a struct-list would not).

    Match positions need ``re.finditer`` (no Arrow kernel yields offsets),
    which is per-row Python — so a vectorized ``count_substring_regex``
    prefilter finds the (typically rare) rows with any hit first and only
    those rows pay the finditer; a PII-free batch never leaves Arrow.
    Both engines use leftmost non-overlapping match semantics, so span
    counts per kind equal :class:`PiiSignals` counts exactly.
    """

    def __init__(self, patterns: dict[str, str] | None = None):
        self.patterns = dict(PII_SIGNAL_PATTERNS if patterns is None else patterns)
        if not self.patterns:
            raise ValueError("patterns must be non-empty")
        self._compiled = None  # lazy: compile once per worker, not per batch

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        import re

        if self._compiled is None:
            self._compiled = {k: re.compile(p) for k, p in self.patterns.items()}
        out = {}
        for c in cols:
            col = pc.cast(table.column(c), pa.string())
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n_rows = len(table)
            hits: dict[str, np.ndarray] = {}
            any_hit = np.zeros(n_rows, dtype=bool)
            for name, pat in self.patterns.items():
                cnt = pc.count_substring_regex(col, pattern=pat).to_numpy(
                    zero_copy_only=False)
                cnt = np.nan_to_num(cnt, nan=0.0).astype(np.int64)
                hits[name] = cnt > 0
                any_hit |= hits[name]
            row_texts: dict[int, str] = {}
            if any_hit.any():
                idxs = np.flatnonzero(any_hit)
                row_texts = dict(zip(
                    idxs.tolist(),
                    col.take(pa.array(idxs)).to_pylist()))
            for name in self.patterns:
                rx = self._compiled[name]
                counts = np.zeros(n_rows, dtype=np.int32)
                flat: list[int] = []
                for ri in np.flatnonzero(hits[name]).tolist():
                    spans = [(m.start(), m.end())
                             for m in rx.finditer(row_texts[ri])]
                    counts[ri] = len(spans)
                    for s, e in spans:
                        flat.extend((s, e))
                offsets = pa.array(
                    np.concatenate(([0], np.cumsum(counts) * 2)).astype(np.int32))
                out[f"{c}_{name}_spans"] = pa.ListArray.from_arrays(
                    offsets, pa.array(np.asarray(flat, dtype=np.int32),
                                      pa.int32()))
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_{n}_spans" for c in cols for n in self.patterns]


def apply_spans(ds, *, span_cols, text_col: str = "text", repl: str = "",
                drop_span_cols: bool = True):
    """Apply span-tagger output to the text (the Dolma mix step's
    redaction half): every ``(start, end)`` span from each ``span_cols``
    entry (flattened-pair ``list<int32>`` columns, the
    :class:`PiiSpans` format) is replaced with ``repl`` (default: removed).
    Overlapping/adjacent spans from different taggers merge first, so
    nested matches never produce doubled replacements.

    Map-only and payload-local: only the (typically rare) rows with ≥1
    span pay the Python splice; untouched rows keep their Arrow buffer
    values byte-identical."""
    if isinstance(span_cols, str):
        span_cols = [span_cols]
    span_cols = list(span_cols)

    def cut(t: pa.Table) -> pa.Table:
        col = pc.cast(t.column(text_col), pa.string())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_rows = len(t)
        per_row: dict[int, list] = {}
        for sc in span_cols:
            arr = t.column(sc)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
            lens = np.nan_to_num(lens, nan=0.0).astype(np.int64)
            if not lens.sum():
                continue
            flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            for ri in np.flatnonzero(lens > 0).tolist():
                seg = flat[starts[ri]: starts[ri] + lens[ri]]
                per_row.setdefault(ri, []).extend(
                    zip(seg[0::2].tolist(), seg[1::2].tolist()))
        if per_row:
            texts = col.to_numpy(zero_copy_only=False)  # object ndarray
            texts = texts.copy()
            for ri, spans in per_row.items():
                spans.sort()
                merged = [list(spans[0])]
                for s, e in spans[1:]:
                    if s <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], e)
                    else:
                        merged.append([s, e])
                txt = texts[ri]
                parts, pos = [], 0
                for s, e in merged:
                    parts.append(txt[pos:s])
                    parts.append(repl)
                    pos = e
                parts.append(txt[pos:])
                texts[ri] = "".join(parts)
            col = pa.array(texts, pa.string())
        i = t.column_names.index(text_col)
        t = t.set_column(i, text_col, col)
        if drop_span_cols:
            t = t.drop_columns([c for c in span_cols if c in t.column_names])
        return t

    return ds.map_batches(cut, batch_format="pyarrow")


#: named HTML entities decoded by :class:`HtmlToText` — a fixed
#: plain-substring set so DuckDB's ``replace()`` mirrors it exactly.
#: ``&amp;`` is decoded LAST ("&amp;lt;" must render "&lt;", not "<").
#: Numeric entities other than ``&#39;`` are left verbatim: decoding an
#: arbitrary ``&#NNN;`` needs a computed character, which neither an RE2
#: replacement string nor a single SQL expression can produce.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
]

#: tags whose open/close boundaries become newlines (paragraph structure
#: survives the strip); everything else strips to "".
HTML_BLOCK_TAG_RE = (
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|th|td|table|blockquote|section|"
    r"article|header|footer|nav|aside|pre|form|hr|dt|dd|dl|figure|"
    r"figcaption)\b[^>]*>"
)

#: elements dropped WITH their content (RE2 has no backreferences, so one
#: pattern per tag rather than ``</\1>``)
HTML_DROP_CONTENT_TAGS = ("script", "style", "noscript", "template")


class HtmlToText(Transform):
    """HTML → text extraction (the first stage of every web-crawl ingest:
    the trafilatura/justext step reduced to its deterministic core).

    A fixed RE2 replacement chain — identical semantics in pyarrow's and
    DuckDB's regex engines (both RE2: no lookarounds, no backrefs), so the
    whole stage is SQL-oracle-checkable:

    1. drop ``<script>/<style>/<noscript>/<template>`` elements WITH content;
    2. drop comments ``<!-- ... -->``;
    3. block-level tags (:data:`HTML_BLOCK_TAG_RE`) → newline;
    4. every remaining tag → ``""``;
    5. decode the fixed named-entity set (:data:`HTML_ENTITIES`, ``&amp;``
       last);
    6. collapse horizontal whitespace to one space, tighten newlines (max
       one blank line), trim both ends.

    Outputs ``{c}_text`` (extracted text) and ``{c}_n_tags`` (tag count in
    the raw input). Stateless and vectorized — runs as a plain
    ``map_batches`` stage; at 100 TB it is embarrassingly parallel (no
    shuffle, no state, no driver traffic).
    """

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        out = {}
        for c in cols:
            col = pc.cast(table.column(c), pa.string())
            n_tags = pc.count_substring_regex(col, pattern=r"(?s)<[^>]*>")
            for tag in HTML_DROP_CONTENT_TAGS:
                col = pc.replace_substring_regex(
                    col, pattern=rf"(?is)<{tag}\b[^>]*>.*?</{tag}>",
                    replacement="")
            col = pc.replace_substring_regex(
                col, pattern=r"(?s)<!--.*?-->", replacement="")
            col = pc.replace_substring_regex(
                col, pattern=HTML_BLOCK_TAG_RE, replacement="\n")
            col = pc.replace_substring_regex(
                col, pattern=r"(?s)<[^>]*>", replacement="")
            for ent, ch in HTML_ENTITIES:
                col = pc.replace_substring(col, pattern=ent, replacement=ch)
            col = pc.replace_substring_regex(
                col, pattern=r"[ \t\r\f\v]+", replacement=" ")
            col = pc.replace_substring_regex(
                col, pattern=r" ?\n ?", replacement="\n")
            col = pc.replace_substring_regex(
                col, pattern=r"\n{3,}", replacement="\n\n")
            col = pc.replace_substring_regex(
                col, pattern=r"^\s+", replacement="")
            col = pc.replace_substring_regex(
                col, pattern=r"\s+$", replacement="")
            out[f"{c}_text"] = col
            out[f"{c}_n_tags"] = pc.cast(n_tags, pa.int64())
        return pa.table(out)

    def output_names(self, cols):
        return [x for c in cols for x in (f"{c}_text", f"{c}_n_tags")]


class TextNormalizer(Transform):
    """Unicode/whitespace text normalization — the standard pre-hash step
    of a dedup pipeline (two visually identical strings with different
    combining-character forms must hash identically):

    1. Unicode NFC normalization — stdlib ``unicodedata`` applied ONLY to
       the rows that contain non-ASCII bytes (ASCII is NFC-invariant, so
       the typical web-English batch skips the per-row call entirely; the
       non-ASCII slice pays one C-library call per row). NOTE: pyarrow's
       ``utf8_normalize(form="NFC")`` is NOT used — as of pyarrow 16 it
       fails to compose e+U+0301 into é, diverging from true NFC (and
       from DuckDB's ``nfc_normalize``, which this stage mirrors exactly
       for the oracle);
    2. optional lowercasing;
    3. strip C0/C1 control characters (tab/newline kept as whitespace);
    4. collapse horizontal whitespace runs to one space, trim ends.

    Stateless, map-only. Output: ``{c}_norm``.
    """

    def __init__(self, *, lower: bool = True):
        self.lower = lower

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        import unicodedata

        out = {}
        for c in cols:
            col = pc.cast(table.column(c), pa.string())
            non_ascii = pc.match_substring_regex(col, r"[^\x00-\x7f]")
            if pc.any(pc.fill_null(non_ascii, False)).as_py():
                vals = col.to_numpy(zero_copy_only=False)
                idx = np.flatnonzero(
                    pc.fill_null(non_ascii, False).to_numpy(zero_copy_only=False))
                vals = vals.astype(object)
                for i in idx:
                    vals[i] = unicodedata.normalize("NFC", vals[i])
                col = pa.array(vals, type=pa.string())
            if self.lower:
                col = pc.utf8_lower(col)
            col = pc.replace_substring_regex(
                col, pattern=r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]",
                replacement="")
            col = pc.replace_substring_regex(
                col, pattern=r"[ \t]+", replacement=" ")
            col = pc.replace_substring_regex(col, pattern=r"^\s+", replacement="")
            col = pc.replace_substring_regex(col, pattern=r"\s+$", replacement="")
            out[f"{c}_norm"] = col
        return pa.table(out)

    def output_names(self, cols):
        return [f"{c}_norm" for c in cols]


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
        # all three statistics via vectorized RE2/utf8 kernels (null → 0,
        # matching the previous per-row behavior)
        col = pc.fill_null(pc.cast(table.column(c), pa.string()), "")
        words = pc.count_substring_regex(col, pattern="[A-Za-z0-9]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        wlen = (
            pc.utf8_length(pc.replace_substring_regex(col, pattern="[^A-Za-z0-9]", replacement=""))
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        tlen = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
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
    hashed stopword tables built once per actor in ``__init__``). Emits the
    argmax language (first language in table order on ties, 'und' when no
    stopword hits) and its hit fraction.

    Vectorized: tokens of the whole batch are hashed in one siphash pass;
    per-language hits are an ``isin`` + per-doc ``add.reduceat`` — the only
    per-row Python work is the regex findall."""

    def __init__(self, text_col: str = "text"):
        from ballet_ray.functions.partition import stable_hash_array

        self.word = re.compile(r"[a-z0-9]+")
        self.text_col = text_col
        self.langs = list(_STOPWORDS)
        self._hash = stable_hash_array
        self.stop_hashes = {
            k: np.sort(stable_hash_array(np.asarray(sorted(v), dtype=object)))
            for k, v in _STOPWORDS.items()
        }

    def __call__(self, table: pa.Table) -> pa.Table:
        texts = table.column(self.text_col).to_pylist()
        n = len(texts)
        toks: list[str] = []
        off = np.empty(n + 1, dtype=np.int64)
        off[0] = 0
        for i, t in enumerate(texts):
            toks.extend(self.word.findall(t.lower()) if t else [])
            off[i + 1] = len(toks)
        lens = np.diff(off)
        nonempty = lens > 0
        hits = np.zeros((n, len(self.langs)), dtype=np.int64)
        if toks:
            flat = self._hash(np.asarray(toks, dtype=object))
            for j, lang in enumerate(self.langs):
                m = np.isin(flat, self.stop_hashes[lang]).astype(np.int64)
                hits[nonempty, j] = np.add.reduceat(m, off[:-1][nonempty])
        best_hits = hits.max(axis=1)
        best_idx = hits.argmax(axis=1)  # first max — matches strict-> update order
        langs = np.where(best_hits > 0, np.asarray(self.langs, dtype=object)[best_idx], "und")
        fracs = best_hits / np.maximum(1, lens)
        return table.append_column("pred_lang", pa.array(langs.astype(object))).append_column(
            "stop_frac", pa.array(fracs, type=pa.float64())
        )


def hash_tokenize(table: pa.Table, text_col: str = "text", vocab: int = 50_257) -> pa.Table:
    """text → (tokens list<int32>, n_tok) by hashing words into a fixed
    vocab — turns any text table into the canonical north-rule shape.
    One vectorized siphash pass over the batch's flattened word list (the
    per-row work is only the regex findall)."""
    from ballet_ray.functions.partition import stable_hash_array

    texts = table.column(text_col).to_pylist()
    words: list[str] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    for i, t in enumerate(texts):
        words.extend(_WORD_RE.findall(t) if t else [])
        offsets[i + 1] = len(words)
    if words:
        flat = (stable_hash_array(np.asarray(words, dtype=object)) % np.uint64(vocab)).astype(np.int32)
    else:
        flat = np.empty(0, dtype=np.int32)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat)
    )
    n_tok = pa.array(np.diff(offsets).astype(np.int32))
    return table.append_column("tokens", tokens).append_column("n_tok", n_tok)


_URL_HOST_RE = (r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@\s]*@)?"
                r"(?P<host>[^/?#:\s]+)")


#: query parameters stripped by canonicalize_url (tracking noise that
#: makes otherwise-identical URLs distinct — the URL-dedup killer)
TRACKING_PARAMS_RE = r"(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid|ref|ref_src|igshid)"


def canonicalize_url(table: pa.Table, url_col: str = "url",
                     out: str = "canonical_url") -> pa.Table:
    """URL canonicalization for URL-level dedup (the first key of every
    crawl-frontier/dedup pipeline). Deterministic RE2 chain, mirrored
    exactly by DuckDB SQL for the oracle:

    1. strip the fragment (``#...``);
    2. drop tracking query params (:data:`TRACKING_PARAMS_RE`), tidy the
       separators left behind (``?&`` → ``?``, ``&&`` → ``&``, trailing
       ``?``/``&`` removed);
    3. lowercase scheme + authority (never the path/query);
    4. strip default ports (``http://…:80``, ``https://…:443``);
    5. strip the root trailing slash (``…example.com/`` → no slash).

    Rows without a ``scheme://`` prefix pass through steps 1–2 unchanged
    by 3–5. Stateless, vectorized, map-only.
    """
    u = pc.cast(table.column(url_col), pa.string())
    u = pc.replace_substring_regex(u, pattern=r"#[\s\S]*$", replacement="")
    u = pc.replace_substring_regex(
        u, pattern=r"([?&])" + TRACKING_PARAMS_RE + r"=[^&#]*",
        replacement=r"\1")
    u = pc.replace_substring_regex(u, pattern=r"\?&+", replacement="?")
    u = pc.replace_substring_regex(u, pattern=r"&&+", replacement="&")
    u = pc.replace_substring_regex(u, pattern=r"[?&]+$", replacement="")
    parts = pc.extract_regex(
        u, pattern=r"^(?P<p>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<r>[\s\S]*)$")
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(parts, "p")),
        pc.struct_field(parts, "r"), "")
    u = pc.if_else(pc.is_valid(lowered), lowered, u)
    u = pc.replace_substring_regex(
        u, pattern=r"^(http://[^/:?#]+):80([/?#][\s\S]*)?$", replacement=r"\1\2")
    u = pc.replace_substring_regex(
        u, pattern=r"^(https://[^/:?#]+):443([/?#][\s\S]*)?$", replacement=r"\1\2")
    u = pc.replace_substring_regex(
        u, pattern=r"^([A-Za-z0-9+.-]+://[^/?#]+)/$", replacement=r"\1")
    return table.append_column(out, u)


def extract_domain(table: pa.Table, url_col: str = "url",
                   out_col: str = "domain", apex: bool = False) -> pa.Table:
    """Append the lowercased host of a URL column — the group key the
    per-domain cap (:func:`~ballet_ray.stages.sampling.cap_per_group`)
    and per-domain stats need. Scheme, userinfo, port, path and query are
    stripped; scheme-less inputs ("example.com/page") parse too. Rows that
    don't parse get null. One Arrow ``extract_regex`` pass, no Python rows.

    ``apex=True`` additionally reduces the host to its last two labels
    ("news.bbc.co.uk" → "co.uk") — a NAIVE apex with no public-suffix
    list (none ships in this environment), documented trade: multi-label
    suffixes (.co.uk) group at the suffix. Use the default host grouping
    when that matters.
    """
    col = table.column(url_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    m = pc.extract_regex(col, _URL_HOST_RE)
    host = pc.utf8_lower(pc.struct_field(m, 0))
    if apex:
        # keep the substring after the second-to-last dot, if any
        rev_parts = pc.split_pattern_regex(host, r"\.")

        def last2(lst: pa.Array) -> pa.Array:
            offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            flat = lst.flatten()
            lens = np.diff(offs)
            starts = offs[:-1] + np.maximum(lens - 2, 0)
            counts = np.minimum(lens, 2)
            out_offs = np.concatenate([[0], np.cumsum(counts)])
            total = int(out_offs[-1])
            take = (np.arange(total, dtype=np.int64)
                    - np.repeat(out_offs[:-1], counts)
                    + np.repeat(starts, counts))
            picked = flat.take(pa.array(take))
            joined = pa.ListArray.from_arrays(
                pa.array(out_offs.astype(np.int32)), picked)
            return pc.binary_join(joined, ".")

        if isinstance(rev_parts, pa.ChunkedArray):
            rev_parts = rev_parts.combine_chunks()
        host = pc.if_else(pc.is_valid(host), last2(rev_parts), host)
    return table.append_column(out_col, host)


def domain_match_mask(table: pa.Table, domains, *, url_col: str = "url",
                      domain_col: str | None = None,
                      match_subdomains: bool = True,
                      max_depth: int = 8) -> pa.Array:
    """Boolean mask: row's host is in ``domains`` (a set/list/Arrow array
    of lowercase domains). With ``match_subdomains`` (the UT1-blocklist
    convention) a host also matches any listed suffix domain —
    ``ads.bad.com`` matches an entry ``bad.com`` — implemented as ≤
    ``max_depth`` vectorized label-strip + ``is_in`` passes (hosts rarely
    exceed 8 labels; no per-row Python). Null / unparseable URLs never
    match. ``domain_col`` skips extraction when a host column already
    exists."""
    if domain_col is not None:
        host = table.column(domain_col)
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        host = pc.utf8_lower(pc.cast(host, pa.string()))
    else:
        host = extract_domain(table, url_col=url_col,
                              out_col="__host").column("__host")
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
    if not isinstance(domains, (pa.Array, pa.ChunkedArray)):
        domains = pa.array(sorted(set(domains)), pa.string())
    mask = pc.is_in(host, value_set=domains)
    if match_subdomains:
        cur = host
        for _ in range(max_depth):
            nxt = pc.replace_substring_regex(
                cur, pattern=r"^[^.]*\.", replacement="",
                max_replacements=1)
            if pc.all(pc.equal(nxt, cur)).as_py() in (True, None):
                break
            cur = nxt
            mask = pc.or_(mask, pc.is_in(cur, value_set=domains))
    return pc.fill_null(mask, False)


def filter_by_domain(ds, domains, *, url_col: str = "url",
                     domain_col: str | None = None, mode: str = "block",
                     match_subdomains: bool = True):
    """Drop (``mode='block'``) or keep only (``mode='allow'``) rows whose
    URL host is on a domain list — the UT1/adult-blocklist step of every
    crawl curation pipeline (RefinedWeb §3.1, FineWeb). The list ships to
    workers ONCE via ``ray.put`` (UT1 is ~4M domains ≈ 80 MB — per-batch
    closure capture would re-serialize it per task) and each batch is one
    (or ``max_depth`` for subdomain matching) vectorized ``is_in``; no
    shuffle, no state, map-only at any corpus size."""
    import ray as _ray

    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    arr = (domains if isinstance(domains, pa.Array)
           else pa.array(sorted({d.lower() for d in domains}), pa.string()))
    dref = _ray.put(arr)
    block = mode == "block"

    def apply(t: pa.Table) -> pa.Table:
        dset = _ray.get(dref)
        m = domain_match_mask(t, dset, url_col=url_col,
                              domain_col=domain_col,
                              match_subdomains=match_subdomains)
        return t.filter(pc.invert(m) if block else m)

    return ds.map_batches(apply, batch_format="pyarrow")


# C4's published line/document heuristics (Raffel et al. 2020 §2.2):
# a line survives only if it ends in a terminal punctuation mark.
C4_TERMINAL_PUNCT_RE = "[.!?\"”']\\s*$"


def c4_clean_table(table: pa.Table, text_col: str = "text", *,
                   min_words_per_line: int = 5, min_lines: int = 3,
                   line_drop_terms: tuple = ("javascript",),
                   doc_drop_phrases: tuple = ("lorem ipsum",),
                   doc_drop_chars: tuple = ("{",),
                   stats: bool = True) -> pa.Table:
    """Batch kernel for :func:`c4_clean` — entirely Arrow/numpy:
    one ``split_pattern`` to a list column, line masks via RE2 kernels on
    the FLAT line array (never per-row Python), kept-per-doc counts by a
    cumsum gather over the list offsets, re-joined with ``binary_join``."""
    col = pc.fill_null(pc.cast(table.column(text_col), pa.string()), "")
    lines = pc.split_pattern(col, pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = lines.flatten()
    off = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]  # flatten() already drops any leading slice offset

    keep = pc.match_substring_regex(flat, C4_TERMINAL_PUNCT_RE)
    keep = pc.and_(keep, pc.greater_equal(
        pc.count_substring_regex(flat, pattern="[A-Za-z0-9]+"),
        min_words_per_line))
    flat_low = pc.utf8_lower(flat)
    for term in line_drop_terms:
        keep = pc.and_(keep, pc.invert(
            pc.match_substring(flat_low, term.lower())))
    keep_np = pc.fill_null(keep, False).to_numpy(zero_copy_only=False)

    cs = np.concatenate([[0], np.cumsum(keep_np, dtype=np.int64)])
    kept_per_doc = cs[off[1:]] - cs[off[:-1]]
    kept_lines = flat.filter(pa.array(keep_np))
    new_off = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
    clean = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), kept_lines),
        "\n")

    doc_keep = kept_per_doc >= min_lines
    low = pc.utf8_lower(col)
    for phrase in doc_drop_phrases:
        doc_keep &= ~pc.match_substring(low, phrase.lower()).to_numpy(
            zero_copy_only=False)
    for ch in doc_drop_chars:
        doc_keep &= ~pc.match_substring(col, ch).to_numpy(
            zero_copy_only=False)

    out = table.set_column(table.column_names.index(text_col),
                           text_col, clean)
    if stats:
        out = out.append_column(
            "lines_in", pa.array((off[1:] - off[:-1]).astype(np.int64)))
        out = out.append_column(
            "lines_kept", pa.array(kept_per_doc.astype(np.int64)))
    return out.filter(pa.array(doc_keep))


def c4_clean(ds, text_col: str = "text", *,
             min_words_per_line: int = 5, min_lines: int = 3,
             line_drop_terms: tuple = ("javascript",),
             doc_drop_phrases: tuple = ("lorem ipsum",),
             doc_drop_chars: tuple = ("{",),
             stats: bool = True):
    """C4 heuristic cleanup (Raffel et al. 2020 §2.2 — the public rules
    behind the C4 corpus), the line-level complement to the doc-level
    Gopher filter:

    - **line level** (applied to every ``\\n``-separated line): keep only
      lines that end in a terminal punctuation mark
      (:data:`C4_TERMINAL_PUNCT_RE`), contain at least
      ``min_words_per_line`` words, and do not mention any
      ``line_drop_terms`` entry (C4 drops every line with the word
      "javascript"); the doc's text becomes the kept lines re-joined.
    - **doc level**: drop the document outright if its ORIGINAL text
      contains any ``doc_drop_phrases`` entry ("lorem ipsum") or any
      ``doc_drop_chars`` character ("{" — C4 excises pages that look like
      code), or if fewer than ``min_lines`` lines survive.

    ``stats=True`` appends ``lines_in`` / ``lines_kept`` columns. One
    zero-shuffle ``map_batches`` pass — map-only at any corpus size; all
    other columns ride through unchanged."""

    def f(t: pa.Table) -> pa.Table:
        return c4_clean_table(
            t, text_col, min_words_per_line=min_words_per_line,
            min_lines=min_lines, line_drop_terms=line_drop_terms,
            doc_drop_phrases=doc_drop_phrases,
            doc_drop_chars=doc_drop_chars, stats=stats)

    return ds.map_batches(f, batch_format="pyarrow")


# sentence boundary = terminal punctuation run followed by whitespace, or a
# newline run. RE2 (pyarrow AND DuckDB) has no lookbehind, so both sides
# split via the same replace-then-split trick on a sentinel byte.
SENT_BOUNDARY_RE = r"([.!?]+)\s+"
_SENT_SEP = "\x1e"  # ASCII record separator — chr(30) on the SQL side
_SENT_TRIM = " \t\r\n"


def split_sentences_table(table: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id", *, min_chars: int = 1,
                          out_col: str = "sentence") -> pa.Table:
    """Explode each doc into sentences — one output row per kept sentence:
    ``(id_col, sent_idx, out_col)``. Naive punctuation-run splitting (the
    standard corpus-pipeline heuristic; 'Mr. Smith' splits — documented),
    entirely vectorized: two RE2 rewrites insert a sentinel, one
    ``split_pattern``, trim + length mask on the FLAT sentence array,
    per-doc kept indices by a cumsum gather over the list offsets."""
    col = pc.fill_null(pc.cast(table.column(text_col), pa.string()), "")
    marked = pc.replace_substring_regex(
        col, pattern=SENT_BOUNDARY_RE, replacement="\\1" + _SENT_SEP)
    marked = pc.replace_substring_regex(
        marked, pattern=r"\n+", replacement=_SENT_SEP)
    sents = pc.split_pattern(marked, pattern=_SENT_SEP)
    if isinstance(sents, pa.ChunkedArray):
        sents = sents.combine_chunks()
    flat = pc.utf8_trim(sents.flatten(), characters=_SENT_TRIM)
    off = sents.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    keep = pc.greater_equal(pc.utf8_length(flat), min_chars)
    keep_np = pc.fill_null(keep, False).to_numpy(zero_copy_only=False)
    cs = np.concatenate([[0], np.cumsum(keep_np, dtype=np.int64)])
    doc_idx = np.repeat(np.arange(len(table), dtype=np.int64),
                        (off[1:] - off[:-1]))
    # kept-sentence index within its doc: kept-count before this element
    # minus kept-count before the doc's first element
    sent_idx = (cs[:-1] - cs[off[:-1]][doc_idx])[keep_np]
    ids = table.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({
        id_col: ids.take(pa.array(doc_idx[keep_np])),
        "sent_idx": pa.array(sent_idx),
        out_col: flat.filter(pa.array(keep_np)),
    })


def split_sentences(ds, text_col: str = "text", id_col: str = "doc_id", *,
                    min_chars: int = 1, out_col: str = "sentence"):
    """Sentence explosion over the corpus (one row per sentence, stable
    ``sent_idx`` within each doc) — the unit step before sentence-level
    dedup, per-sentence quality scoring, or boundary-aware chunking.
    Zero-shuffle one-to-many map; at 100 TB it streams like every other
    flat_map-shaped stage."""
    def f(t: pa.Table) -> pa.Table:
        return split_sentences_table(t, text_col, id_col,
                                     min_chars=min_chars, out_col=out_col)

    return ds.map_batches(f, batch_format="pyarrow")


class WordRepetition(Transform):
    """Gopher-style within-document repetition signals over a text column
    (Rae et al. 2021 §A1.1 repetition filters): duplicate-word fraction
    (1 − distinct/total) and top-word fraction (most frequent word / total).

    Fully vectorized across the batch: split once with an Arrow kernel,
    dictionary-encode the flattened words (exact, no hash collisions), then
    one lexsort + segmented boundary counts — no per-row Python. Oracle
    parity: words are ``string_split(text, ' ')`` so DuckDB's
    UNNEST(string_split(...)) GROUP BY counts match exactly.
    """

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        c = cols[0]
        col = table.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pc.split_pattern(col, " ")
        n = len(words)
        flat = words.flatten().dictionary_encode()
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        lens = np.diff(offsets)
        safe = np.maximum(lens, 1)
        T = len(codes)
        if T == 0:
            zeros = np.zeros(n)
            return pa.table({"dup_word_frac": pa.array(zeros), "top_word_frac": pa.array(zeros)})

        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        order = np.lexsort((codes, row_idx))
        rs, cs = row_idx[order], codes[order]
        # a (row, word) group starts where either changes
        new_group = np.empty(T, bool)
        new_group[0] = True
        np.logical_or(rs[1:] != rs[:-1], cs[1:] != cs[:-1], out=new_group[1:])
        # distinct words per row: count group starts in each row segment
        gs = np.cumsum(new_group)
        distinct = gs[offsets[1:] - 1] - gs[offsets[:-1]] + new_group[offsets[:-1]]
        distinct = np.where(lens > 0, distinct, 0)
        # top word count per row: max group length within the row
        starts = np.flatnonzero(new_group)
        glens = np.diff(np.append(starts, T))
        first_group_of_row = gs[offsets[:-1]] - new_group[offsets[:-1]]  # 0-based
        top = np.zeros(n, np.int64)
        nonempty = lens > 0
        if nonempty.any():
            idx = first_group_of_row[nonempty]
            # reduceat needs strictly valid starts; rows are contiguous runs
            # of groups, so per-row max = maximum.reduceat at row-first-group
            top[nonempty] = np.maximum.reduceat(glens, idx)
        dup_frac = 1.0 - distinct / safe
        top_frac = top / safe
        return pa.table(
            {"dup_word_frac": pa.array(dup_frac), "top_word_frac": pa.array(top_frac)}
        )

    def output_names(self, cols: list[str]) -> list[str]:
        return ["dup_word_frac", "top_word_frac"]


# Gopher's 8-stop-word rule (Rae et al. 2021 §A1.1): a doc must contain
# at least 2 of these to survive the quality filter.
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _unit_repetition(col, sep: str):
    """Per-doc duplicate-unit fractions for a ``sep``-delimited unit
    (lines / paragraphs): (dup_frac, dup_char_frac, n_units) where
    dup_frac = 1 − distinct/total and dup_char_frac = 1 − chars-in-
    distinct-units / total-chars (each distinct unit's chars counted
    once). Exact (dictionary-encode, no hashes), one lexsort per batch."""
    parts = pc.split_pattern(col, pattern=sep)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    n = len(parts)
    raw = parts.flatten()
    flat = raw.dictionary_encode()
    codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    plens = pc.utf8_length(raw).to_numpy(zero_copy_only=False).astype(np.int64)
    off = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    counts = np.diff(off)
    T = len(codes)
    if T == 0:
        z = np.zeros(n)
        return z, z.copy(), counts
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((codes, doc_idx))
    ds_, cs_ = doc_idx[order], codes[order]
    first = np.empty(T, bool)
    first[0] = True
    np.logical_or(ds_[1:] != ds_[:-1], cs_[1:] != cs_[:-1], out=first[1:])
    gs = np.cumsum(first)
    distinct = gs[off[1:] - 1] - gs[off[:-1]] + first[off[:-1]]
    distinct = np.where(counts > 0, distinct, 0)
    dchars_sorted = np.where(first, plens[order], 0)
    cchars = np.concatenate([[0], np.cumsum(dchars_sorted)])
    distinct_chars = cchars[off[1:]] - cchars[off[:-1]]
    tchars_cum = np.concatenate([[0], np.cumsum(plens)])
    total_chars = tchars_cum[off[1:]] - tchars_cum[off[:-1]]
    dup = 1.0 - distinct / np.maximum(counts, 1)
    dup_char = np.where(total_chars > 0,
                        1.0 - distinct_chars / np.maximum(total_chars, 1), 0.0)
    return dup, dup_char, counts


class GopherSignals(Transform):
    """The structural half of Gopher's quality rules (Rae et al. 2021
    §A1.1) — the complement of :class:`WordRepetition`'s word-level
    signals, all computed in one vectorized batch pass:

    - ``dup_line_frac`` / ``dup_line_char_frac`` and ``dup_para_frac`` /
      ``dup_para_char_frac``: within-doc duplicate-unit fractions over
      ``\\n`` lines and ``\\n\\n`` paragraphs (exact: 1 − distinct/total,
      char variants count each distinct unit's chars once);
    - ``bullet_line_frac`` / ``ellipsis_line_frac``: fraction of lines
      starting with a bullet (``- * •``) / ending in ``...`` or ``…``
      (Gopher drops docs >90% bullet or >30% ellipsis lines);
    - ``symbol_word_ratio``: (# + … + ...) occurrences per whitespace
      word (Gopher bound 0.1);
    - ``alpha_word_frac``: fraction of whitespace words containing at
      least one alphabetic character (Gopher bound 0.8);
    - ``stop_hits``: how many of Gopher's 8 stop words
      (:data:`GOPHER_STOP_WORDS`) appear (word-boundary, lowercased) —
      the rule requires >= 2;
    - ``punct_line_frac`` / ``short_line_frac``: FineWeb's line signals
      (Penedo et al. 2024 §3.4) — fraction of lines ending in terminal
      punctuation / shorter than ``short_line_chars`` (30) characters;
    - ``n_lines``: line count.

    Formulas are SQL-expressible (string_split / list_filter /
    regexp_extract_all) so every column oracles exactly."""

    def __init__(self, short_line_chars: int = 30):
        self.short_line_chars = short_line_chars

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        c = cols[0]
        col = table.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        col = pc.fill_null(col, "")

        dup_line, dup_line_char, n_lines = _unit_repetition(col, "\n")
        dup_para, dup_para_char, _ = _unit_repetition(col, "\n\n")

        # line-class fractions over the flat line array
        lines = pc.split_pattern(col, pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.flatten()
        off = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        safe_lines = np.maximum(n_lines, 1)

        def _line_frac(pattern: str) -> np.ndarray:
            m = pc.fill_null(pc.match_substring_regex(flat, pattern), False)
            cs = np.concatenate(
                [[0], np.cumsum(m.to_numpy(zero_copy_only=False))])
            return (cs[off[1:]] - cs[off[:-1]]) / safe_lines

        bullet = _line_frac(r"^\s*[-*•]")
        ellipsis = _line_frac(r"(\.\.\.|…)\s*$")
        punct = _line_frac(C4_TERMINAL_PUNCT_RE)
        short_m = pc.less(pc.utf8_length(flat), self.short_line_chars)
        cs_short = np.concatenate(
            [[0], np.cumsum(pc.fill_null(short_m, False)
                            .to_numpy(zero_copy_only=False))])
        short = (cs_short[off[1:]] - cs_short[off[:-1]]) / safe_lines

        # whitespace words: total + alphabetic
        words = pc.count_substring_regex(col, pattern=r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        alpha_words = pc.count_substring_regex(
            col, pattern=r"\S*[A-Za-z]\S*").to_numpy(
            zero_copy_only=False).astype(np.int64)
        safe_words = np.maximum(words, 1)
        alpha_word_frac = np.where(words > 0, alpha_words / safe_words, 0.0)

        symbols = (
            pc.count_substring(col, "#").to_numpy(zero_copy_only=False)
            + pc.count_substring_regex(col, pattern=r"\.\.\.").to_numpy(
                zero_copy_only=False)
            + pc.count_substring(col, "…").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        symbol_word_ratio = np.where(words > 0, symbols / safe_words, 0.0)

        low = pc.utf8_lower(col)
        stop_hits = np.zeros(len(table), np.int64)
        for w in GOPHER_STOP_WORDS:
            stop_hits += pc.match_substring_regex(
                low, rf"\b{w}\b").to_numpy(zero_copy_only=False)

        return pa.table({
            "n_lines": pa.array(n_lines.astype(np.int64)),
            "dup_line_frac": pa.array(dup_line),
            "dup_line_char_frac": pa.array(dup_line_char),
            "dup_para_frac": pa.array(dup_para),
            "dup_para_char_frac": pa.array(dup_para_char),
            "bullet_line_frac": pa.array(bullet),
            "ellipsis_line_frac": pa.array(ellipsis),
            "punct_line_frac": pa.array(punct),
            "short_line_frac": pa.array(short),
            "symbol_word_ratio": pa.array(symbol_word_ratio),
            "alpha_word_frac": pa.array(alpha_word_frac),
            "stop_hits": pa.array(stop_hits),
        })

    def output_names(self, cols: list[str]) -> list[str]:
        return ["n_lines", "dup_line_frac", "dup_line_char_frac",
                "dup_para_frac", "dup_para_char_frac", "bullet_line_frac",
                "ellipsis_line_frac", "punct_line_frac", "short_line_frac",
                "symbol_word_ratio", "alpha_word_frac", "stop_hits"]


# Published Gopher thresholds (Rae et al. 2021 Table A1). n-gram bounds
# are applied to count fractions (NgramRepetition) rather than the paper's
# character fractions — a documented approximation; everything else exact.
GOPHER_THRESHOLDS = {
    "min_words": 50, "max_words": 100_000,
    "min_mean_word_len": 3.0, "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.90, "max_ellipsis_line_frac": 0.30,
    "min_alpha_word_frac": 0.80, "min_stop_hits": 2,
    "max_dup_line_frac": 0.30, "max_dup_para_frac": 0.30,
    "max_dup_line_char_frac": 0.20, "max_dup_para_char_frac": 0.20,
    "max_top_ngram_frac": {2: 0.20, 3: 0.18, 4: 0.16},
    "max_dup_ngram_frac": {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12,
                           9: 0.11, 10: 0.10},
}


def gopher_quality_filter(ds, text_col: str = "text", *,
                          overrides: dict | None = None,
                          ngrams: bool = True,
                          emit_signals: bool = False):
    """The COMPLETE published Gopher quality filter (Rae et al. 2021
    §A1.1 / Table A1) as one fused zero-shuffle pass: word-count and
    mean-word-length bounds (whitespace words), symbol-to-word ratio,
    bullet/ellipsis line fractions, alpha-word fraction, the 8-stop-word
    rule, within-doc duplicate line/paragraph fractions (count AND char
    weighted), and — with ``ngrams=True`` — the top-2/3/4-gram and
    duplicate-5..10-gram repetition bounds (count-fraction approximation
    of the paper's char fractions; see :data:`GOPHER_THRESHOLDS`).

    ``overrides`` patches individual thresholds (set one to ``None`` to
    disable that rule). ``emit_signals=True`` keeps every signal column on
    the survivors for auditing. Map-only: composes with any upstream/
    downstream stage at any corpus size."""
    th = dict(GOPHER_THRESHOLDS)
    if overrides:
        for k in overrides:
            if k not in th:
                raise KeyError(f"unknown Gopher threshold {k!r}")
        th.update(overrides)
    sig = GopherSignals()
    ngram_ts = ([NgramRepetition(n) for n in
                 sorted(set(th["max_top_ngram_frac"]) |
                        set(th["max_dup_ngram_frac"]))]
                if ngrams else [])

    def f(t: pa.Table) -> pa.Table:
        col = pc.fill_null(pc.cast(t.column(text_col), pa.string()), "")
        s = sig.transform_table(pa.table({text_col: col}), [text_col])
        words = pc.count_substring_regex(col, pattern=r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nonspace = pc.utf8_length(pc.replace_substring_regex(
            col, pattern=r"\s", replacement="")).to_numpy(
            zero_copy_only=False).astype(np.float64)
        mean_wlen = np.where(words > 0, nonspace / np.maximum(words, 1), 0.0)

        def _col(name):
            return s.column(name).to_numpy(zero_copy_only=False)

        m = np.ones(len(t), bool)
        if th["min_words"] is not None:
            m &= words >= th["min_words"]
        if th["max_words"] is not None:
            m &= words <= th["max_words"]
        if th["min_mean_word_len"] is not None:
            m &= mean_wlen >= th["min_mean_word_len"]
        if th["max_mean_word_len"] is not None:
            m &= mean_wlen <= th["max_mean_word_len"]
        for key, name in (("max_symbol_word_ratio", "symbol_word_ratio"),
                          ("max_bullet_line_frac", "bullet_line_frac"),
                          ("max_ellipsis_line_frac", "ellipsis_line_frac"),
                          ("max_dup_line_frac", "dup_line_frac"),
                          ("max_dup_para_frac", "dup_para_frac"),
                          ("max_dup_line_char_frac", "dup_line_char_frac"),
                          ("max_dup_para_char_frac", "dup_para_char_frac")):
            if th[key] is not None:
                m &= _col(name) <= th[key]
        if th["min_alpha_word_frac"] is not None:
            m &= _col("alpha_word_frac") >= th["min_alpha_word_frac"]
        if th["min_stop_hits"] is not None:
            m &= _col("stop_hits") >= th["min_stop_hits"]

        ng_tables = []
        for tr in ngram_ts:
            nt = tr.transform_table(pa.table({text_col: col}), [text_col])
            ng_tables.append(nt)
            n = tr.n
            top_th = th["max_top_ngram_frac"].get(n)
            dup_th = th["max_dup_ngram_frac"].get(n)
            if top_th is not None:
                m &= nt.column(f"top_{n}gram_frac").to_numpy(
                    zero_copy_only=False) <= top_th
            if dup_th is not None:
                m &= nt.column(f"dup_{n}gram_frac").to_numpy(
                    zero_copy_only=False) <= dup_th
        out = t
        if emit_signals:
            out = out.append_column("words_ws", pa.array(words))
            out = out.append_column("mean_word_len", pa.array(mean_wlen))
            for name in s.column_names:
                out = out.append_column(name, s.column(name))
            for nt in ng_tables:
                for name in nt.column_names:
                    out = out.append_column(name, nt.column(name))
        return out.filter(pa.array(m))

    return ds.map_batches(f, batch_format="pyarrow")


# FineWeb's three additional heuristics (Penedo et al. 2024 §3.4, applied
# after the C4 and Gopher rule sets). Removal conditions, per the paper:
# punct_line_frac <= 0.12, dup_line_char_frac >= 0.1, short_line_frac >= 0.67.
FINEWEB_THRESHOLDS = {
    "min_punct_line_frac": 0.12,     # keep if strictly greater
    "max_dup_line_char_frac": 0.1,   # keep if strictly smaller
    "max_short_line_frac": 0.67,     # keep if strictly smaller
}


def fineweb_quality_filter(ds, text_col: str = "text", *,
                           overrides: dict | None = None,
                           emit_signals: bool = False):
    """FineWeb's three published custom filters (Penedo et al. 2024 §3.4)
    in one map pass — designed to be layered after :func:`c4_clean` and
    :func:`gopher_quality_filter` exactly as the paper layers them:

    - keep docs where the fraction of lines ending in terminal
      punctuation is > ``min_punct_line_frac`` (0.12);
    - keep docs where the char-weighted duplicate-line fraction is
      < ``max_dup_line_char_frac`` (0.1);
    - keep docs where the fraction of lines shorter than 30 chars is
      < ``max_short_line_frac`` (0.67).

    Set an ``overrides`` entry to ``None`` to disable that rule.
    ``emit_signals=True`` keeps the three signal columns on survivors."""
    th = dict(FINEWEB_THRESHOLDS)
    if overrides:
        for k in overrides:
            if k not in th:
                raise KeyError(f"unknown FineWeb threshold {k!r}")
        th.update(overrides)
    sig = GopherSignals()

    def f(t: pa.Table) -> pa.Table:
        col = pc.fill_null(pc.cast(t.column(text_col), pa.string()), "")
        s = sig.transform_table(pa.table({text_col: col}), [text_col])

        def _col(name):
            return s.column(name).to_numpy(zero_copy_only=False)

        m = np.ones(len(t), bool)
        if th["min_punct_line_frac"] is not None:
            m &= _col("punct_line_frac") > th["min_punct_line_frac"]
        if th["max_dup_line_char_frac"] is not None:
            m &= _col("dup_line_char_frac") < th["max_dup_line_char_frac"]
        if th["max_short_line_frac"] is not None:
            m &= _col("short_line_frac") < th["max_short_line_frac"]
        out = t
        if emit_signals:
            for name in ("punct_line_frac", "dup_line_char_frac",
                         "short_line_frac"):
                out = out.append_column(name, s.column(name))
        return out.filter(pa.array(m))

    return ds.map_batches(f, batch_format="pyarrow")


def block_term_counts(ds, *, text_col: str = "text"):
    """(term, tf) rows pre-aggregated per BLOCK — the combiner for fits
    that need only corpus-wide term totals (unigram/bigram LM tables,
    corpus divergence): the term-keyed exchange then carries Σ
    block-distinct terms instead of Σ doc-distinct terms (one
    dictionary-encode + bincount per block, no id column shipped).
    Totals after ``groupby("term").sum("tf")`` are identical to the
    :func:`doc_term_counts` path by construction."""

    def counts(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        flat = pc.list_flatten(pc.split_pattern(col, " ")).dictionary_encode()
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = np.bincount(codes, minlength=len(flat.dictionary))
        return pa.table({"term": flat.dictionary,
                         "tf": pa.array(tf.astype(np.int64))})

    return ds.select_columns([text_col]).map_batches(
        counts, batch_format="pyarrow")


def doc_term_counts(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(id, term, tf) rows: per-document word counts, split on ' '.

    Each document's rows are emitted COMPLETE within its own batch (a row
    never spans blocks), which downstream passes exploit: per-doc
    reductions can run inside map_batches with no doc-keyed shuffle. The
    kernel is the same batch-wide dictionary-encode + lexsort + segmented
    boundary count as WordRepetition — no per-row Python."""

    def counts(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pc.split_pattern(col, " ")
        n = len(words)
        flat = words.flatten().dictionary_encode()
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        lens = np.diff(offsets)
        T = len(codes)
        ids = t.column(id_col)
        if T == 0:
            return pa.table({id_col: ids.slice(0, 0), "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        order = np.lexsort((codes, row_idx))
        rs, cs = row_idx[order], codes[order]
        new_group = np.empty(T, bool)
        new_group[0] = True
        np.logical_or(rs[1:] != rs[:-1], cs[1:] != cs[:-1], out=new_group[1:])
        starts = np.flatnonzero(new_group)
        glens = np.diff(np.append(starts, T))
        doc_of_group = rs[starts]
        term_codes = cs[starts]
        terms = pa.Array.from_pandas(flat.dictionary.to_pandas().iloc[term_codes].reset_index(drop=True))
        return pa.table({
            id_col: ids.take(pa.array(doc_of_group)),
            "term": terms.cast(pa.string()),
            "tf": pa.array(glens.astype(np.int64)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(counts, batch_format="pyarrow")


def tfidf_top_terms(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    round_to: int | None = 6, max_vocab: int | None = 2_000_000):
    """Top TF-IDF term per document (sklearn smooth idf:
    ``ln((1+N)/(1+df)) + 1``), tie-broken by lexicographically smallest
    term. Two passes, no doc-keyed shuffle anywhere:

    1. DF table: doc-term counts → ``groupby(term).count()`` (each
       (doc, term) appears exactly once, so count = document frequency).
       The table is vocab-sized and broadcast via ``ray.put`` — fine up to
       ~tens of millions of distinct terms; above that swap the merge for
       the repo's hash_join on ``term`` and reduce per-doc maxima with a
       grouped max (documented scale path).
    2. Scoring pass: per-batch doc-term counts again, DF merged in-batch,
       and the per-doc argmax emitted directly — complete without any
       shuffle because a doc's terms never span batches.
    """
    def build(n_docs, avgdl):
        def score(tf, dfs, dl):
            idf = np.log((1.0 + n_docs) / (1.0 + dfs)) + 1.0
            return tf * idf

        return score

    return _top_term_scored(ds, text_col=text_col, id_col=id_col,
                            score_builder=build, round_to=round_to,
                            max_vocab=max_vocab)


def bm25_top_terms(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   k1: float = 1.2, b: float = 0.75, round_to: int | None = 6,
                   max_vocab: int | None = 2_000_000):
    """Top BM25 term per document (Robertson/Spärck Jones Okapi weighting,
    Lucene idf variant ``ln(1 + (N - df + 0.5)/(df + 0.5))`` with length
    normalization by ``dl/avgdl``). Same two-pass, no-doc-keyed-shuffle
    shape as :func:`tfidf_top_terms`; ``avgdl`` comes for free from the
    DF pass (Σtf / N)."""

    def build(n_docs, avgdl):
        def score(tf, dfs, dl):
            idf = np.log1p((n_docs - dfs + 0.5) / (dfs + 0.5))
            return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

        return score

    return _top_term_scored(ds, text_col=text_col, id_col=id_col,
                            score_builder=build, round_to=round_to,
                            max_vocab=max_vocab)


def _top_term_scored(ds, *, text_col: str, id_col: str, score_builder,
                     round_to: int | None, max_vocab: int | None = 2_000_000):
    """Shared top-term kernel: one vocab-keyed DF groupby (broadcast), then
    a per-batch scoring pass emitting each doc's argmax term — no doc-keyed
    shuffle anywhere (a doc's terms never span batches).
    ``score_builder(n_docs, avgdl)`` returns a vectorized ``score(tf, dfs,
    dl)`` over the batch's (doc, term) groups; avgdl (Σtf / N) comes free
    from the DF pass.

    ``max_vocab`` bounds the broadcast: on raw web text the distinct-term
    space grows without bound (URLs, typos, hashes), so when the DF table
    exceeds the cap only the ``max_vocab`` highest-df terms ship to the
    workers and every other term scores as if its df were the cap
    boundary's df (``df_floor`` — by construction an upper bound on any
    dropped term's true df, so dropped-rare-term idf is slightly
    *underestimated*, never inflated). Totals (n_docs, Σtf for avgdl) are
    computed distributed over the FULL table, so kept-term scores are
    exact. ``max_vocab=None`` disables the cap."""
    import ray.data.aggregate as _agg

    dt = doc_term_counts(ds, text_col=text_col, id_col=id_col)
    stats = dt.groupby("term").aggregate(
        _agg.Count(alias_name="df"), _agg.Sum("tf", alias_name="ctf")
    ).materialize()
    n_terms = stats.count()
    ctf_total = stats.aggregate(_agg.Sum("ctf", alias_name="t"))["t"]
    df_floor = 0
    if max_vocab is not None and n_terms > max_vocab:
        df_pdf = stats.sort(["df", "term"], descending=[True, False]).limit(max_vocab).to_pandas()
        df_floor = int(df_pdf["df"].min())
    else:
        df_pdf = stats.to_pandas()
    df_map = dict(zip(df_pdf["term"], df_pdf["df"].astype(np.int64)))
    n_docs = int(ds.count())
    avgdl = float(ctf_total) / max(n_docs, 1)
    score_fn = score_builder(n_docs, avgdl)
    import ray as _ray

    dref = _ray.put(df_map)
    oov_df = df_floor

    def top1(t: pa.Table) -> pa.Table:
        dfm = _ray.get(dref)
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pc.split_pattern(col, " ")
        n = len(words)
        flat = words.flatten().dictionary_encode()
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        lens = np.diff(offsets)
        T = len(codes)
        ids = t.column(id_col)
        if T == 0:
            return pa.table({id_col: ids.slice(0, 0), "top_term": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        order = np.lexsort((codes, row_idx))
        rs, cs = row_idx[order], codes[order]
        new_group = np.empty(T, bool)
        new_group[0] = True
        np.logical_or(rs[1:] != rs[:-1], cs[1:] != cs[:-1], out=new_group[1:])
        starts = np.flatnonzero(new_group)
        glens = np.diff(np.append(starts, T)).astype(np.float64)
        doc_of_group = rs[starts]
        dict_terms = np.asarray(flat.dictionary.to_pandas(), dtype=object)
        terms = dict_terms[cs[starts]]
        # df + doc length per (doc, term) group (vectorized over the
        # batch's dictionary codes / rows)
        dfs = np.array([dfm.get(w, oov_df) for w in dict_terms], np.float64)[cs[starts]]
        dl = lens.astype(np.float64)[doc_of_group]
        score = score_fn(glens, dfs, dl)
        # per-doc argmax with lexicographic tie-break: sort groups by
        # (doc, -score, term) and take each doc's first group
        sel = np.lexsort((terms, -score, doc_of_group))
        first = np.empty(len(sel), bool)
        first[0] = True
        first[1:] = doc_of_group[sel][1:] != doc_of_group[sel][:-1]
        win = sel[first]
        sc = score[win]
        if round_to is not None:
            sc = np.round(sc, round_to)
        return pa.table({
            id_col: ids.take(pa.array(doc_of_group[win])),
            "top_term": pa.array(list(terms[win]), pa.string()),
            "score": pa.array(sc),
        })

    return ds.select_columns([id_col, text_col]).map_batches(top1, batch_format="pyarrow")


def unigram_logprob_scores(ds, *, text_col: str = "text", id_col: str = "doc_id",
                           alpha: float = 0.5, round_to: int | None = 4,
                           max_vocab: int | None = 2_000_000,
                           keep_cols: list[str] | None = None):
    """KenLM-style unigram language-model scoring: per-document total and
    per-word mean log-probability under the corpus's own smoothed unigram
    distribution ``p(w) = (c(w)+alpha) / (total+alpha*vocab)`` — the
    standard cheap fluency/quality signal for corpus filtering (documents
    of gibberish or rare-token spam score far below prose).

    Scale shape (same as tfidf_top_terms): ONE vocab-keyed groupby builds
    the corpus counts, the log-prob table broadcasts via ``ray.put``, and
    the per-doc sums run inside map_batches with no doc-keyed shuffle.

    ``max_vocab`` bounds the broadcast on unbounded raw-text vocabularies:
    only the ``max_vocab`` most frequent terms ship; everything else
    scores as OOV (``log(alpha/denom)`` — the same smoothing floor an
    unseen word gets). ``total`` and the TRUE vocab size stay exact (they
    are distributed scalars, not the dict), so kept-term probabilities
    are identical with or without the cap.

    ``keep_cols`` lists extra input columns to carry through the scoring
    map unchanged — a caller that filters by score can then do it with a
    map-only pass over the scored payload instead of a doc-keyed join
    back onto the corpus."""
    import ray.data.aggregate as _agg

    counts_ds = block_term_counts(
        ds, text_col=text_col).groupby("term").sum("tf").materialize()
    vocab = float(counts_ds.count())  # TRUE vocab size (a scalar, not a collect)
    total = float(counts_ds.aggregate(_agg.Sum("sum(tf)", alias_name="t"))["t"])
    denom = total + alpha * vocab
    if max_vocab is not None and vocab > max_vocab:
        counts = counts_ds.sort(["sum(tf)", "term"], descending=[True, False]).limit(max_vocab).to_pandas()
    else:
        counts = counts_ds.to_pandas()
    logp = dict(zip(counts["term"], np.log((counts["sum(tf)"].to_numpy(np.float64) + alpha) / denom)))
    import ray as _ray

    lref = _ray.put(logp)
    oov = float(np.log(alpha / denom))

    def score(t: pa.Table) -> pa.Table:
        lp = _ray.get(lref)
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pc.split_pattern(col, " ")
        n = len(words)
        flat = words.flatten().dictionary_encode()
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        lens = np.diff(offsets)
        safe = np.maximum(lens, 1)
        ids = t.column(id_col)
        extra = {c: t.column(c) for c in (keep_cols or [])}
        if len(codes) == 0:
            z = np.zeros(n)
            return pa.table({id_col: ids, **extra,
                             "logprob": pa.array(z), "mean_logprob": pa.array(z)})
        dict_terms = np.asarray(flat.dictionary.to_pandas(), dtype=object)
        code_lp = np.array([lp.get(w, oov) for w in dict_terms], np.float64)
        per_tok = code_lp[codes]
        cs = np.empty(len(per_tok) + 1, np.float64)
        cs[0] = 0.0
        np.cumsum(per_tok, out=cs[1:])
        tot = cs[offsets[1:]] - cs[offsets[:-1]]
        out_tot, out_mean = tot, tot / safe
        if round_to is not None:
            out_tot = np.round(out_tot, round_to)
            out_mean = np.round(out_mean, round_to)
        return pa.table({id_col: ids, **extra, "logprob": pa.array(out_tot),
                         "mean_logprob": pa.array(out_mean)})

    in_cols = [id_col, text_col] + [c for c in (keep_cols or [])
                                    if c not in (id_col, text_col)]
    return ds.select_columns(in_cols).map_batches(score, batch_format="pyarrow")


class NgramRepetition(Transform):
    """Duplicate / top n-gram fractions per document (the rest of the
    Gopher repetition family beyond WordRepetition's unigrams — Rae et al.
    2021 §A1.1 uses top 2–4-gram and duplicate 5–10-gram fractions).

    Exact and vectorized: words are dictionary-encoded once per batch and
    an n-gram is the base-V integer of its n consecutive codes, so counts
    are over int64 keys (bijective with the word n-grams within the batch
    — no hash collisions). When V**n would overflow int64 (large vocab ×
    large n), the key is built by iterative pairwise re-encoding — compact
    the running prefix key to [0, #distinct) with np.unique before each
    Horner step, so every intermediate fits 2^62 and exactness is
    preserved (at the cost of n-1 extra sorts). Documents with fewer than
    n words emit 0 for both fractions."""

    def __init__(self, n: int = 2):
        if n < 2:
            raise ValueError("use WordRepetition for unigrams")
        self.n = n

    def transform_table(self, table: pa.Table, cols: list[str]) -> pa.Table:
        c = cols[0]
        n_ = self.n
        col = table.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pc.split_pattern(col, " ")
        nrows = len(words)
        flat = words.flatten().dictionary_encode()
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(max(len(flat.dictionary), 1))
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        lens = np.diff(offsets)
        T = len(codes)
        glens = np.maximum(lens - (n_ - 1), 0)  # n-grams per row
        zeros = np.zeros(nrows)
        if T == 0 or glens.sum() == 0:
            return pa.table({f"dup_{n_}gram_frac": pa.array(zeros),
                             f"top_{n_}gram_frac": pa.array(zeros)})
        # valid n-gram start positions: drop each row's last n-1 positions
        # (short rows' spill-over indices land on positions the previous
        # boundary already invalidated; negative wraps land on the global
        # tail, which the last boundary invalidates)
        valid = np.ones(T, bool)
        for j in range(1, n_):
            valid[offsets[1:] - j] = False
        starts = np.flatnonzero(valid)
        keys = codes[starts].copy()
        import math

        if n_ * math.log2(max(int(V), 2)) < 62:
            for j in range(1, n_):
                keys *= V
                keys += codes[starts + j]
        else:
            # V**n overflows int64 — re-encode the running prefix key to a
            # dense range before each step; both factors stay < 2^31 so the
            # product is exact (no wraparound, no hashing)
            for j in range(1, n_):
                _, keys = np.unique(keys, return_inverse=True)
                keys = keys.astype(np.int64) * V + codes[starts + j]
        row_of = np.repeat(np.arange(nrows, dtype=np.int64), glens)
        order = np.lexsort((keys, row_of))
        rs, ks = row_of[order], keys[order]
        m = len(ks)
        new_group = np.empty(m, bool)
        new_group[0] = True
        np.logical_or(rs[1:] != rs[:-1], ks[1:] != ks[:-1], out=new_group[1:])
        goffsets = np.concatenate([[0], np.cumsum(glens)])
        gs = np.cumsum(new_group)
        distinct = np.zeros(nrows, np.int64)
        nz = glens > 0
        distinct[nz] = (gs[goffsets[1:][nz] - 1] - gs[goffsets[:-1][nz]]
                        + new_group[goffsets[:-1][nz]])
        gstarts = np.flatnonzero(new_group)
        runlens = np.diff(np.append(gstarts, m))
        first_group_of_row = gs[goffsets[:-1][nz]] - new_group[goffsets[:-1][nz]]
        top = np.zeros(nrows, np.int64)
        top[nz] = np.maximum.reduceat(runlens, first_group_of_row)
        safe = np.maximum(glens, 1)
        return pa.table({
            f"dup_{n_}gram_frac": pa.array(np.where(nz, 1.0 - distinct / safe, 0.0)),
            f"top_{n_}gram_frac": pa.array(np.where(nz, top / safe, 0.0)),
        })

    def output_names(self, cols: list[str]) -> list[str]:
        return [f"dup_{self.n}gram_frac", f"top_{self.n}gram_frac"]


def bigram_logprob_scores(ds, *, text_col: str = "text", id_col: str = "doc_id",
                          lam: float = 0.8, alpha: float = 0.5,
                          round_to: int | None = 4,
                          max_vocab: int | None = 2_000_000,
                          max_bigrams: int | None = 5_000_000,
                          keep_cols: list[str] | None = None):
    """CCNet-style perplexity filter: per-document log-probability and
    perplexity under an interpolated bigram language model fit on the
    corpus itself —
    ``P(w₂|w₁) = λ·c(w₁w₂)/c(w₁) + (1−λ)·(c(w₂)+α)/(T+αV)``
    (MLE bigram interpolated with the add-α unigram; the standard cheap
    stand-in for the KenLM 5-gram CCNet uses — gibberish and shuffled-word
    spam score far below fluent text even at n=2).

    Scale shape (same as :func:`unigram_logprob_scores`): ONE term-keyed
    groupby per model table (unigram, bigram), both broadcast via
    ``ray.put`` behind top-K caps (``max_vocab`` / ``max_bigrams``);
    scoring is one shuffle-free ``map_batches`` pass (dictionary-encode,
    look up distinct grams only, one segment-sum per doc). Dropped/unseen
    bigrams back off to the ``(1−λ)``·unigram term; dropped unigrams score
    at the OOV smoothing floor — T and the TRUE vocab size V stay exact
    (distributed scalars), so kept-gram probabilities are identical with
    or without the caps.

    Output per doc: ``logprob`` (Σ over positions 2..n), ``mean_logprob``
    (/(n−1)), ``ppl`` (exp(−mean)). Single-word docs emit 0/0/1.
    ``keep_cols``: extra input columns carried through the scoring map
    unchanged (join-free filter-by-score, as in unigram_logprob_scores).
    """
    import ray as _ray
    import ray.data.aggregate as _agg

    uni_ds = block_term_counts(
        ds, text_col=text_col).groupby("term").sum("tf").materialize()
    vocab = float(uni_ds.count())
    total = float(uni_ds.aggregate(_agg.Sum("sum(tf)", alias_name="t"))["t"])
    denom = total + alpha * vocab
    if max_vocab is not None and vocab > max_vocab:
        uni = uni_ds.sort(["sum(tf)", "term"], descending=[True, False]).limit(max_vocab).to_pandas()
    else:
        uni = uni_ds.to_pandas()
    uni_c = dict(zip(uni["term"], uni["sum(tf)"].to_numpy(np.float64)))

    def bigram_counts(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pc.split_pattern(col, " ")
        flat = words.flatten()
        if len(flat) < 2:
            return pa.table({"bg": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        bi = pc.binary_join_element_wise(flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        valid = np.ones(len(flat) - 1, dtype=bool)
        ends = offsets[1:] - 1
        valid[ends[(ends >= 0) & (ends < len(valid))]] = False
        bi = bi.filter(pa.array(valid))
        d = bi.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False)
        return pa.table({"bg": d.dictionary,
                         "n": pa.array(np.bincount(codes, minlength=len(d.dictionary)).astype(np.int64))})

    bi_ds = (ds.select_columns([text_col])
             .map_batches(bigram_counts, batch_format="pyarrow")
             .groupby("bg").sum("n").materialize())
    if max_bigrams is not None and bi_ds.count() > max_bigrams:
        bi = bi_ds.sort(["sum(n)", "bg"], descending=[True, False]).limit(max_bigrams).to_pandas()
    else:
        bi = bi_ds.to_pandas()
    # a corpus of single-word docs has NO bigrams; the empty dataset loses
    # its schema, so guard the column access
    bi_c = (dict(zip(bi["bg"], bi["sum(n)"].to_numpy(np.float64)))
            if len(bi) else {})

    uref, bref = _ray.put(uni_c), _ray.put(bi_c)
    floor = alpha / denom

    def score(t: pa.Table) -> pa.Table:
        uc, bc = _ray.get(uref), _ray.get(bref)
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pc.split_pattern(col, " ")
        n = len(words)
        flat = words.flatten()
        ids = t.column(id_col)
        extra = {c: t.column(c) for c in (keep_cols or [])}
        zeros = np.zeros(n)
        if len(flat) < 2:
            return pa.table({id_col: ids, **extra,
                             "logprob": pa.array(zeros),
                             "mean_logprob": pa.array(zeros),
                             "ppl": pa.array(np.ones(n))})
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        lens = np.diff(offsets)
        # distinct-word lookups: c(w) and p_uni(w)
        dw = flat.dictionary_encode()
        wcodes = dw.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dwords = np.asarray(dw.dictionary.to_pandas(), dtype=object)
        cw = np.array([uc.get(w, 0.0) for w in dwords], np.float64)
        p_uni = np.where(cw > 0, (cw + alpha) / denom, floor)
        # per-pair bigram counts
        bi_str = pc.binary_join_element_wise(flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        valid = np.ones(len(flat) - 1, dtype=bool)
        ends = offsets[1:] - 1
        valid[ends[(ends >= 0) & (ends < len(valid))]] = False
        db = bi_str.dictionary_encode()
        bcodes = db.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dbi = np.asarray(db.dictionary.to_pandas(), dtype=object)
        cbi = np.array([bc.get(g, 0.0) for g in dbi], np.float64)
        c2 = cbi[bcodes]                     # c(w1 w2) per position pair
        c1 = cw[wcodes[:-1]]                 # c(w1) per pair
        p2 = p_uni[wcodes[1:]]               # unigram backoff of w2
        mle = np.divide(c2, c1, out=np.zeros_like(c2), where=c1 > 0)
        logp = np.log(lam * mle + (1.0 - lam) * p2)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        pair_doc = doc_idx[:-1][valid]
        # astype: bincount with an EMPTY weights array returns int64 (a
        # block of only single-word docs has no valid pairs) — the divide
        # below needs a float out buffer
        tot = np.bincount(pair_doc, weights=logp[valid], minlength=n).astype(np.float64)
        npairs = np.maximum(lens - 1, 0)
        mean = np.divide(tot, npairs, out=np.zeros_like(tot), where=npairs > 0)
        out_tot, out_mean, out_ppl = tot, mean, np.exp(-mean)
        if round_to is not None:
            out_tot = np.round(out_tot, round_to)
            out_mean = np.round(out_mean, round_to)
            out_ppl = np.round(out_ppl, round_to)
        return pa.table({id_col: ids, **extra, "logprob": pa.array(out_tot),
                         "mean_logprob": pa.array(out_mean), "ppl": pa.array(out_ppl)})

    in_cols = [id_col, text_col] + [c for c in (keep_cols or [])
                                    if c not in (id_col, text_col)]
    return ds.select_columns(in_cols).map_batches(score, batch_format="pyarrow")


def corpus_divergence(ds_a, ds_b, *, text_col: str = "text", id_col: str = "doc_id",
                      alpha: float = 0.5):
    """Distribution-shift monitor between two corpus snapshots: KL(A‖B),
    KL(B‖A) and Jensen-Shannon divergence of their Laplace-smoothed
    unigram distributions (the standard drift alarm between crawl
    snapshots / before-after a filter change).

    Scale shape — fully distributed, NOTHING vocab-sized touches the
    driver: one vocab-keyed groupby per side, a full-outer hash join of
    the two (term, count) tables, then per-batch partial divergence sums
    tree-reduced to three scalars. The r3 version collected both count
    tables into driver dicts (unbounded on raw web text); this one is
    exact at any vocabulary size. Smoothing puts mass ``alpha`` on every
    word of the UNION vocab, so both distributions are absolutely
    continuous and the KLs are finite.

    Returns a single-row pyarrow Table (kl_ab, kl_ba, js).
    """
    import ray.data.aggregate as _agg

    from ballet_ray.stages.joins import (
        default_join_partitions,
        hash_join,
        scrub_empty_blocks,
    )

    def side_counts(ds, name):
        def rn(t: pa.Table) -> pa.Table:
            return t.rename_columns(["term", name])

        side = block_term_counts(ds, text_col=text_col).groupby("term").sum(
            "tf").map_batches(rn, batch_format="pyarrow")
        # empty-corpus side: a zero-row join input leaves the aggregator
        # partition tables schema-less; scrub gives the join typed blocks
        return scrub_empty_blocks(side, schema=pa.schema(
            [pa.field("term", pa.string()), pa.field(name, pa.int64())]
        ))

    joined = hash_join(
        side_counts(ds_a, "ca"),
        side_counts(ds_b, "cb"),
        on="term",
        how="full_outer",
        num_partitions=default_join_partitions(None),
    ).materialize()

    # pass 1: union vocab size + per-side totals (three scalars)
    tot = joined.aggregate(
        _agg.Count(alias_name="v"),
        _agg.Sum("ca", alias_name="na"),
        _agg.Sum("cb", alias_name="nb"),
    )
    V = float(tot["v"])
    A = float(tot["na"] or 0) + alpha * V
    B = float(tot["nb"] or 0) + alpha * V

    # pass 2: per-batch partial sums of the three divergences
    def partials(t: pa.Table) -> pa.Table:
        ca = pc.fill_null(t.column("ca"), 0).to_numpy(zero_copy_only=False).astype(np.float64) + alpha
        cb = pc.fill_null(t.column("cb"), 0).to_numpy(zero_copy_only=False).astype(np.float64) + alpha
        p = ca / A
        q = cb / B
        m = (p + q) / 2.0
        return pa.table({
            "kl_ab": [float(np.sum(p * np.log(p / q)))],
            "kl_ba": [float(np.sum(q * np.log(q / p)))],
            "js": [float(0.5 * np.sum(p * np.log(p / m)) + 0.5 * np.sum(q * np.log(q / m)))],
        })

    sums = joined.map_batches(partials, batch_format="pyarrow").aggregate(
        _agg.Sum("kl_ab", alias_name="kl_ab"),
        _agg.Sum("kl_ba", alias_name="kl_ba"),
        _agg.Sum("js", alias_name="js"),
    )
    import pyarrow as _pa

    return _pa.table({"kl_ab": [float(sums["kl_ab"])],
                      "kl_ba": [float(sums["kl_ba"])],
                      "js": [float(sums["js"])]})


def winnow_fingerprints(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 5, window: int = 4):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 —
    the MOSS scheme): hash every word k-gram, then keep the MINIMUM hash
    of each sliding window of ``window`` k-grams (rightmost on ties),
    deduplicating repeated selections. Guarantee: any shared run of at
    least ``window + k − 1`` words between two documents yields at least
    one shared fingerprint, while only ~2/(window+1) of all k-gram hashes
    are kept — a density/recall dial for plagiarism-style matching.

    Fully vectorized and shuffle-free: k-gram keys are Horner hashes over
    the batch's dictionary codes (same kernel family as
    duplicate_passages), window minima via a sliding-window view, and the
    per-doc selections aggregate through Arrow list offsets. Output:
    ``(id_col, fingerprints list<int64>, n_fp)``. Docs with fewer than
    ``k`` words emit an empty list.
    """
    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")
    from numpy.lib.stride_tricks import sliding_window_view

    from ballet_ray.functions.hashing import splitmix64

    def fp(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pc.split_pattern(col, " ")
        n = len(words)
        flat = words.flatten().dictionary_encode()
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
        # stable per-word hash (dictionary values hashed once per batch)
        from ballet_ray.functions.partition import stable_hash_array

        wordhash = stable_hash_array(
            np.asarray(flat.dictionary.to_pandas(), dtype=object)
        )
        h_tok = wordhash[codes.astype(np.int64)]
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        lens = np.diff(offsets)
        ids = t.column(id_col)
        if not len(h_tok):
            empty = pa.array([[]] * n, pa.list_(pa.int64()))
            return pa.table({id_col: ids, "fingerprints": empty,
                             "n_fp": pa.array(np.zeros(n, np.int32))})

        # Horner k-gram hash over the flat token-hash buffer (cross-doc
        # windows are masked out below)
        PRIME = np.uint64(1099511628211)
        m = len(h_tok)
        n_kg = max(m - k + 1, 0)
        kg = np.zeros(max(n_kg, 1), np.uint64)
        if n_kg > 0:
            acc = np.zeros(n_kg, np.uint64)
            with np.errstate(over="ignore"):
                for j in range(k):
                    acc = acc * PRIME + h_tok[j: j + n_kg]
            kg = splitmix64(acc)

        out_fps, out_offsets = [], [0]
        for d in range(n):
            a, b = offsets[d], offsets[d + 1]
            nk = int(lens[d]) - k + 1
            if nk < 1:
                out_offsets.append(out_offsets[-1])
                continue
            h = kg[a: a + nk]
            w = min(window, nk)
            wins = sliding_window_view(h, w)
            # rightmost minimum per window (the winnowing tie rule)
            rev = wins[:, ::-1]
            idx = (w - 1) - np.argmin(rev, axis=1)
            pos = np.arange(len(wins)) + idx
            keep = np.unique(pos)  # dedupe repeated selections
            sel = h[keep].astype(np.int64)
            out_fps.append(sel)
            out_offsets.append(out_offsets[-1] + len(sel))
        flat_out = (np.concatenate(out_fps) if out_fps
                    else np.empty(0, np.int64))
        lst = pa.ListArray.from_arrays(
            pa.array(np.asarray(out_offsets, np.int64).astype(np.int32)),
            pa.array(flat_out),
        )
        n_fp = np.diff(np.asarray(out_offsets, np.int64)).astype(np.int32)
        return pa.table({id_col: ids, "fingerprints": lst, "n_fp": pa.array(n_fp)})

    return ds.select_columns([id_col, text_col]).map_batches(fp, batch_format="pyarrow")


def winnow_similarity_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                            k: int = 5, window: int = 4, min_shared: int = 2,
                            max_bucket: int = 1000):
    """Document pairs sharing at least ``min_shared`` winnowing
    fingerprints — the MOSS matching step. Bucketed, never all-pairs:
    fingerprints explode to (fp, id) rows, each fp-bucket emits its pairs
    (buckets above ``max_bucket`` ids are dropped — a fingerprint shared
    by thousands of documents is boilerplate, not plagiarism signal, and
    the cap is the documented recall trade), and one keyed count keeps
    pairs reaching the threshold. Returns (id_a, id_b, shared) with
    id_a < id_b."""
    import pandas as pd

    fps = winnow_fingerprints(ds, text_col=text_col, id_col=id_col,
                              k=k, window=window)

    def explode(t: pa.Table) -> pa.Table:
        col = t.column("fingerprints")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = col.flatten()
        ids = t.column(id_col).take(
            pa.array(np.repeat(np.arange(len(t), dtype=np.int64), np.diff(offs)))
        )
        return pa.table({"fp": flat, id_col: ids})

    # coarse-partition bucket kernel (the minhash/dedup pattern): the
    # fingerprint space is corpus-scale, so a per-fp map_groups would pay
    # Ray's per-group frame plumbing for every DISTINCT fingerprint.
    # Hash-partition fps and emit all of a partition's pairs in one pass.
    from ballet_ray.functions.partition import default_coarse_parts

    n_parts = default_coarse_parts()

    def add_part(t: pa.Table) -> pa.Table:
        from ballet_ray.functions.partition import stable_hash_array

        h = stable_hash_array(t.column("fp").to_numpy(zero_copy_only=False))
        return t.append_column(
            "__part", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"id_a": [], "id_b": []})
        df = df.sort_values(["fp", id_col], kind="mergesort")
        f = df["fp"].to_numpy()
        ids = df[id_col].to_numpy()
        # distinct (fp, id): consecutive after the sort
        keep = np.concatenate([[True], (f[1:] != f[:-1]) | (ids[1:] != ids[:-1])])
        f, ids = f[keep], ids[keep]
        new = np.concatenate([[True], f[1:] != f[:-1]])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(f)]])
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            m = int(e - s)
            if m < 2 or m > max_bucket:
                continue
            iu = np.triu_indices(m, 1)
            a_out.append(ids[s:e][iu[0]])
            b_out.append(ids[s:e][iu[1]])
        if not a_out:
            return pd.DataFrame({"id_a": [], "id_b": []})
        return pd.DataFrame({"id_a": np.concatenate(a_out),
                             "id_b": np.concatenate(b_out)})

    pairs = (fps.map_batches(explode, batch_format="pyarrow")
             .map_batches(add_part, batch_format="pyarrow")
             .groupby("__part").map_groups(part_pairs, batch_format="pandas"))
    counted = pairs.groupby(["id_a", "id_b"]).count()

    def threshold(t: pa.Table) -> pa.Table:
        cnt = t.column("count()")
        keep = pc.greater_equal(cnt, min_shared)
        t = t.filter(keep)
        return pa.table({"id_a": t.column("id_a"), "id_b": t.column("id_b"),
                         "shared": t.column("count()")})

    return counted.map_batches(threshold, batch_format="pyarrow")
