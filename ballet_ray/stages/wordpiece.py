"""Trainable WordPiece tokenizer (Schuster & Nakajima 2012; the BERT
tokenizer, Devlin 2019) — the third canonical subword scheme beside BPE
(`stages/bpe.py`) and unigram-LM (`stages/unigram.py`).

Ray-Data-first split, matching the other two trainers:

- **Fit** (:func:`train_wordpiece`): WordPiece training, like BPE, runs
  over the corpus's WORD-FREQUENCY table — the distributed part is the
  same one term-keyed ``groupby().sum()`` (per-batch dictionary-encode
  combiners), capped at ``max_words`` rows before it ships to the driver.
  The driver merge loop differs from BPE only in the winning-pair rule:
  the pair maximizing ``count(ab) / (count(a) * count(b))`` (the
  likelihood gain of a unigram LM over the symbol stream) merges, not the
  most frequent pair — scores are compared by exact integer
  cross-multiplication so the fit is partition- and float-order-
  independent. Continuation symbols carry the ``##`` prefix.
- **Apply** (:func:`apply_wordpiece`): greedy longest-match-first
  ("MaxMatch") over the fitted vocab; a word with any uncoverable
  position encodes as one UNK, per BERT. The stage itself REUSES
  :class:`~ballet_ray.stages.bpe.BpeEncoder` (it is generic over any
  tokenizer exposing ``encode_word``): stateful actor-pool map_batches,
  vocab loaded once per actor, distinct-word memo across batches,
  vectorized gather back to ``list<int32>``.

Reference scope note: the reference engine (ballet v0.19.5) has no
tokenizer; this operator exists for the tokens-axis pipelines (chunk /
pack / token dedup) that consume ``list<int32>`` columns.
"""

from __future__ import annotations

UNK_ID = 0
CONT = "##"  # continuation-piece marker, as in BERT vocab files


def _word_symbols(word: str) -> tuple:
    """BERT convention: first character bare, the rest ##-prefixed."""
    return (word[0],) + tuple(CONT + c for c in word[1:])


def _merge_symbol(a: str, b: str) -> str:
    """Pair product: b is always a continuation symbol within a word."""
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


class WordPieceTokenizer:
    """Fitted artifact: the ordered piece vocabulary. Picklable and tiny
    (≤ vocab_size entries) — broadcast once, used by every encoder actor.

    Id order: 0 = UNK, then base symbols (sorted), then merge products in
    training order — reproducible across runs and partitionings."""

    def __init__(self, merges: list, base_symbols: list):
        self.merges = [tuple(m) for m in merges]
        toks = ["[UNK]"] + list(base_symbols) + [
            _merge_symbol(a, b) for a, b in self.merges]
        self.id_to_piece = toks
        self.piece_to_id = {t: i for i, t in enumerate(toks)}
        self.max_piece_chars = max(
            (len(p) - (len(CONT) if p.startswith(CONT) else 0)
             for p in toks[1:]), default=1)

    @classmethod
    def from_pieces(cls, pieces: list) -> "WordPieceTokenizer":
        """Rebuild from an ordered piece list (the BERT ``vocab.txt``
        shape — id 0 must be ``[UNK]``). Encoding needs only the piece
        set, so the merge history is empty on the rebuilt object."""
        if not pieces or pieces[0] != "[UNK]":
            raise ValueError("piece list must start with [UNK] at id 0")
        tok = cls.__new__(cls)
        tok.merges = []
        tok.id_to_piece = list(pieces)
        tok.piece_to_id = {t: i for i, t in enumerate(tok.id_to_piece)}
        tok.max_piece_chars = max(
            (len(p) - (len(CONT) if p.startswith(CONT) else 0)
             for p in tok.id_to_piece[1:]), default=1)
        return tok

    def vocab_size(self) -> int:
        return len(self.id_to_piece)

    def encode_word(self, word: str) -> list:
        """Greedy longest-match-first. Any uncoverable position makes the
        WHOLE word one UNK id (BERT's rule — not a partial segmentation)."""
        if not word:
            return []
        p2i = self.piece_to_id
        ids = []
        i, L = 0, len(word)
        while i < L:
            j = min(L, i + self.max_piece_chars)
            pid = None
            while j > i:
                piece = word[i:j] if i == 0 else CONT + word[i:j]
                pid = p2i.get(piece)
                if pid is not None:
                    break
                j -= 1
            if pid is None:
                return [UNK_ID]
            ids.append(pid)
            i = j
        return ids

    def decode(self, ids) -> str:
        """ids → text; word-initial pieces start a new space-separated
        word, ``##`` continuations append to the current one."""
        toks = self.id_to_piece
        parts = []
        for i in ids:
            p = toks[i] if 0 <= i < len(toks) else toks[UNK_ID]
            if p.startswith(CONT):
                parts.append(p[len(CONT):])
            else:
                if parts:
                    parts.append(" ")
                parts.append(p)
        return "".join(parts)


def train_wordpiece(ds, *, text_col: str = "text", vocab_size: int = 8000,
                    max_words: int = 1_000_000) -> WordPieceTokenizer:
    """Fit a WordPiece vocab of ≤ ``vocab_size`` pieces on the corpus's
    word-frequency table (one distributed term-keyed groupby, top
    ``max_words`` rows to the driver), then the sequential merge loop over
    that bounded table.

    Winning pair per step: max ``count(ab)/(count(a)·count(b))``, ties →
    lexicographically smallest pair. Scores compare by integer
    cross-multiplication (``c_ab·ca'·cb' > c_ab'·ca·cb``), so the result
    is exact and deterministic. Base characters are always kept (any word
    over the seen alphabet stays segmentable), so the effective floor is
    ``1 + |alphabet|`` pieces."""
    from ballet_ray.stages.unigram import _word_freq_table

    counts = _word_freq_table(ds, text_col, max_words).to_pandas()
    vocab = {w: int(f) for w, f in zip(counts["term"], counts["sum(tf)"]) if w}

    words = [_word_symbols(w) for w in vocab]       # word id -> symbols
    freqs = list(vocab.values())
    base = sorted({s for syms in words for s in syms})

    # incremental trainer (same shape as train_bpe): pair→words index so a
    # merge rewrites only the words containing it; symbol totals update by
    # the same deltas — O(Σ rewritten-word lengths) per merge.
    pair_counts: dict = {}
    pair_words: dict = {}
    sym_counts: dict = {}
    for wid, syms in enumerate(words):
        f = freqs[wid]
        for s in syms:
            sym_counts[s] = sym_counts.get(s, 0) + f
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wid)

    merges: list = []
    n_vocab = 1 + len(base)
    while n_vocab < vocab_size and pair_counts:
        # argmax of c_ab/(c_a*c_b) by exact cross-multiplication; ties →
        # lexicographically smallest pair
        best_pair = None
        best_num = best_den = 1
        for p, c in pair_counts.items():
            den = sym_counts[p[0]] * sym_counts[p[1]]
            if best_pair is None:
                best_pair, best_num, best_den = p, c, den
                continue
            lhs = c * best_den
            rhs = best_num * den
            if lhs > rhs or (lhs == rhs and p < best_pair):
                best_pair, best_num, best_den = p, c, den
        pair = best_pair
        merges.append(pair)
        n_vocab += 1
        a, b = pair
        ab = _merge_symbol(a, b)
        for wid in list(pair_words.get(pair, ())):
            syms = words[wid]
            f = freqs[wid]
            for s in syms:
                sym_counts[s] -= f
                if sym_counts[s] <= 0:
                    del sym_counts[s]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wid)
                    if not ws:
                        del pair_words[p]
            new = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(ab)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = tuple(new)
            words[wid] = syms
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + f
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wid)
        # a merged-away pair key may survive in sym_counts deltas only; the
        # merge product participates in future pairs via the rewrites above
    return WordPieceTokenizer(merges, base)


def apply_wordpiece(ds, tokenizer: WordPieceTokenizer, *,
                    text_col: str = "text", id_col: str = "doc_id",
                    out_col: str = "wp_tokens",
                    concurrency: int | None = None):
    """Tokenize the corpus with a fitted WordPiece vocab: broadcast the
    tokenizer once, encode in the shared actor-pool stage (the
    :class:`~ballet_ray.stages.bpe.BpeEncoder` machinery is tokenizer-
    generic: distinct-word memo, vectorized token gather)."""
    import ray

    from ballet_ray.stages.bpe import BpeEncoder

    ref = ray.put(tokenizer)
    kwargs = dict(tokenizer_ref=ref, text_col=text_col, id_col=id_col,
                  out_col=out_col)
    if concurrency:
        return ds.select_columns([id_col, text_col]).map_batches(
            BpeEncoder, fn_constructor_kwargs=kwargs,
            concurrency=concurrency, batch_format="pyarrow",
        )
    return ds.select_columns([id_col, text_col]).map_batches(
        BpeEncoder(**kwargs), batch_format="pyarrow"
    )
