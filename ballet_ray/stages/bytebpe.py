"""Byte-level BPE tokenizer (GPT-2 family, Radford et al. 2019): BPE over
UTF-8 BYTES instead of characters, so the base alphabet is exactly 256
symbols, every possible input encodes without any UNK, and
``decode(encode(text)) == text`` byte-for-byte for arbitrary unicode —
the property that made byte-level BPE the de-facto LLM tokenizer.

Ray-Data-first split, same shape as :mod:`ballet_ray.stages.bpe`:

- **Fit** (:func:`train_byte_bpe`): one distributed term-keyed
  ``groupby().sum()`` to the bounded pretoken-frequency table (capped at
  ``max_words`` with a deterministic (count, term) tie-break), then the
  shared incremental merge loop (:func:`ballet_ray.stages.bpe.merge_loop`)
  on the driver. Pretokenization is the vectorized space-attach rule
  (:func:`ballet_ray.stages.bpe.attach_spaces`): the separating space
  travels with the FOLLOWING pretoken (`` world`` not ``world``), GPT-2's
  dominant pretoken shape, so word-boundary information lives inside the
  tokens and plain concatenation inverts tokenization. (GPT-2's full
  regex additionally splits letter/digit/punct runs within a pretoken;
  that refinement trades the zero-copy Arrow split for per-row Python and
  is intentionally not taken — the byte-level/no-UNK/roundtrip semantics
  are identical.)
- **Apply**: the tokenizer-generic actor-pool encoder
  (:class:`ballet_ray.stages.bpe.BpeEncoder`) — the artifact's
  ``space_attach`` attribute switches the encoder's splitter, so byte-level
  artifacts ride the exact same distinct-word-memo machinery as the other
  three tokenizer families, including ``jobs/run.py --tokenizer``.

Id layout (reproducible): ids 0..255 are the byte symbols in byte order,
then one id per merge in training order — ``vocab_size = 256 + merges``.
There is no UNK id; byte fallback covers everything.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ballet_ray.stages.bpe import attach_spaces, greedy_merge, merge_loop


def bytes_to_unicode() -> dict:
    """The published GPT-2 byte↔unicode bijection: every byte value maps
    to a PRINTABLE unicode codepoint (printable latin bytes keep their own
    char; the 68 non-printable/whitespace bytes shift up past 255), so
    merge symbols are plain strings with no escaping and the merge table
    stays human-readable. Returns {byte_value: unicode_char}."""
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(ord("\xa1"), ord("\xac") + 1))
            + list(range(ord("\xae"), ord("\xff") + 1)))
    mapping = {}
    shift = 0
    for b in range(256):
        if b in keep:
            mapping[b] = chr(b)
        else:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


_B2U = bytes_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}


class ByteBpeTokenizer:
    """Fitted artifact: the ordered merge list alone (the 256-symbol base
    is implied). Picklable and tiny — broadcast once via ``ray.put``,
    used by every encoder actor. ``space_attach`` tells the generic
    :class:`~ballet_ray.stages.bpe.BpeEncoder` to use the byte-level
    pretokenizer."""

    space_attach = True

    def __init__(self, merges: list):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {m: r for r, m in enumerate(self.merges)}
        base = [_B2U[b] for b in range(256)]
        toks = base + [a + b for a, b in self.merges]
        self.token_to_id = {t: i for i, t in enumerate(toks)}
        self.id_to_token = toks

    def vocab_size(self) -> int:
        return len(self.id_to_token)

    @staticmethod
    def _symbols(word: str) -> list:
        return [_B2U[b] for b in word.encode("utf-8")]

    def encode_word(self, word: str) -> list:
        """UTF-8 bytes → mapped unicode symbols → greedy lowest-rank
        merging. Every symbol is in-vocab by construction (no UNK)."""
        syms = greedy_merge(self._symbols(word), self.ranks)
        t2i = self.token_to_id
        return [t2i[s] for s in syms]

    def decode(self, ids) -> str:
        """Exact inverse of encode: concatenate token strings, map each
        char back to its byte, UTF-8-decode. Ids outside the vocab raise
        (there is no UNK to hide them behind)."""
        s = "".join(self.id_to_token[i] for i in ids)
        return bytes(_U2B[c] for c in s).decode("utf-8", errors="replace")


def train_byte_bpe(ds, *, text_col: str = "text", num_merges: int = 1000,
                   max_words: int = 1_000_000) -> ByteBpeTokenizer:
    """Fit byte-level BPE merges on the corpus's pretoken-frequency table:
    one distributed term-keyed groupby (per-batch bincount combiners), a
    deterministic (count desc, term asc) cap at ``max_words``, then the
    shared sequential merge loop over that bounded table on the driver."""

    def word_counts(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pc.split_pattern(pc.fill_null(col, ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = attach_spaces(words).flatten().dictionary_encode()
        codes = flat.indices.to_numpy(zero_copy_only=False)
        if not len(codes):
            return pa.table({"term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        return pa.table({
            "term": flat.dictionary,
            "tf": pa.array(np.bincount(codes, minlength=len(flat.dictionary)).astype(np.int64)),
        })

    counts_ds = (ds.select_columns([text_col])
                 .map_batches(word_counts, batch_format="pyarrow")
                 .groupby("term").sum("tf").materialize())
    if counts_ds.count() > max_words:
        counts = counts_ds.sort(["sum(tf)", "term"], descending=[True, False]).limit(max_words).to_pandas()
    else:
        counts = counts_ds.to_pandas()

    vocab = {tuple(ByteBpeTokenizer._symbols(w)): int(f)
             for w, f in zip(counts["term"], counts["sum(tf)"]) if w}
    return ByteBpeTokenizer(merge_loop(vocab, num_merges))


def apply_byte_bpe(ds, tokenizer: ByteBpeTokenizer, *, text_col: str = "text",
                   id_col: str = "doc_id", out_col: str = "bpe_tokens",
                   concurrency: int | None = None):
    """Tokenize the corpus with a fitted byte-level artifact — delegates to
    the tokenizer-generic actor-pool encoder (``space_attach`` on the
    artifact selects the byte-level splitter)."""
    from ballet_ray.stages.bpe import apply_bpe

    return apply_bpe(ds, tokenizer, text_col=text_col, id_col=id_col,
                     out_col=out_col, concurrency=concurrency)
