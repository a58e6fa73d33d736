"""Trainable unigram-LM tokenizer (Kudo 2018, "Subword Regularization";
the SentencePiece unigram model) — the other canonical subword tokenizer
beside BPE (`stages/bpe.py`), trained top-down by EM + pruning instead of
bottom-up merges.

Ray-Data-first split of the published algorithm:

- **Seed** : candidate pieces are the most frequent substrings (length ≤
  ``max_piece_len``) of the corpus's words. Both passes are distributed:
  one term-keyed ``groupby().sum()`` builds the word-frequency table (the
  same shape as `train_bpe`), then a ``map_batches`` over THAT table emits
  per-word substring counts into a second piece-keyed groupby, capped at
  the ``seed_size`` most frequent pieces before anything ships to the
  driver. Every single character is force-kept so any word stays
  segmentable.
- **EM** : the E-step is data-parallel over words — each task runs
  forward–backward over its words' segmentation lattices against a
  broadcast piece→logp table and emits per-block pre-combined
  (piece, expected_count) partials; one vocab-bounded groupby later the
  driver runs the M-step (normalize) and the prune step (drop the
  lowest-expected-count ``1−shrink`` fraction, never single characters —
  the standard approximation of SentencePiece's likelihood-loss prune).
  Rounds repeat until the vocabulary reaches ``vocab_size``. The driver
  only ever holds the piece table (≤ seed_size rows), never the corpus
  and never the full word table.
- **Apply** (:func:`apply_unigram`): a STATEFUL ACTOR-POOL ``map_batches``
  stage — :class:`UnigramEncoder` holds the fitted piece table once per
  actor and memoizes Viterbi segmentations of distinct words across
  batches, exactly like `BpeEncoder` (Zipf: steady-state work is O(new
  words), not O(tokens)).

Words carry SentencePiece's ``▁`` word-boundary marker, so
``decode(encode(text))`` recovers the space-normalized text whenever no
UNK was emitted. Output is ``list<int32>`` ids (0 = UNK; piece ids sorted
by descending probability then lexicographically — reproducible) plus
``n_tok``.

Reference scope note: the reference engine (ballet v0.19.5) has no
tokenizer; this operator exists for the tokens-axis pipelines (chunk /
pack / token dedup) that consume ``list<int32>`` columns.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

UNK_ID = 0
WORD_MARK = "▁"  # '▁' — SentencePiece word-boundary marker
_UNK_LOGP = -20.0  # lattice penalty for a character outside the alphabet


class UnigramTokenizer:
    """Fitted artifact: piece → (id, logp). Picklable and vocab-bounded —
    broadcast once via ``ray.put``, used by every encoder actor."""

    def __init__(self, pieces: dict):
        # deterministic id order: descending logp, then lexicographic
        order = sorted(pieces, key=lambda p: (-pieces[p], p))
        self.id_to_piece = ["<unk>"] + order
        self.piece_to_id = {p: i + 1 for i, p in enumerate(order)}
        self.logp = dict(pieces)
        self.max_piece_len = max((len(p) for p in pieces), default=1)

    def vocab_size(self) -> int:
        return len(self.id_to_piece)

    def encode_word(self, word: str) -> list:
        """Viterbi segmentation of ``▁word`` maximizing Σ logp. A character
        covered by no piece contributes one UNK id."""
        w = WORD_MARK + word
        L = len(w)
        K = self.max_piece_len
        logp, p2i = self.logp, self.piece_to_id
        best = [-math.inf] * (L + 1)
        back = [0] * (L + 1)  # start index of the piece ending at i
        best[0] = 0.0
        for i in range(1, L + 1):
            for j in range(max(0, i - K), i):
                if best[j] == -math.inf:
                    continue
                lp = logp.get(w[j:i])
                if lp is None:
                    if i - j != 1:
                        continue
                    lp = _UNK_LOGP  # unknown single char -> UNK arc
                s = best[j] + lp
                if s > best[i]:
                    best[i], back[i] = s, j
        ids = []
        i = L
        while i > 0:
            j = back[i]
            ids.append(p2i.get(w[j:i], UNK_ID))
            i = j
        ids.reverse()
        return ids

    def decode(self, ids) -> str:
        toks = self.id_to_piece
        s = "".join(toks[i] if 0 < i < len(toks) else toks[UNK_ID] for i in ids)
        return s.replace(WORD_MARK, " ").lstrip(" ")


def _word_freq_table(ds, text_col: str, max_words: int):
    """(term, tf) Dataset via per-batch dictionary-encoded combiners + one
    term-keyed groupby; capped at the top ``max_words`` (count desc, term
    asc — deterministic at the boundary)."""

    def word_counts(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        flat = pc.split_pattern(col, " ").flatten().dictionary_encode()
        codes = flat.indices.to_numpy(zero_copy_only=False)
        if not len(codes):
            return pa.table({"term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        return pa.table({
            "term": flat.dictionary,
            "tf": pa.array(np.bincount(codes, minlength=len(flat.dictionary)).astype(np.int64)),
        })

    counts = (ds.select_columns([text_col])
              .map_batches(word_counts, batch_format="pyarrow")
              .groupby("term").sum("tf").materialize())
    if counts.count() > max_words:
        counts = (counts.sort(["sum(tf)", "term"], descending=[True, False])
                  .limit(max_words).materialize())
    return counts


def _marked(term: str) -> str:
    return WORD_MARK + term


def train_unigram(ds, *, text_col: str = "text", vocab_size: int = 8000,
                  max_piece_len: int = 8, seed_size: int = 100_000,
                  shrink: float = 0.75, em_rounds: int = 2,
                  max_words: int = 1_000_000) -> UnigramTokenizer:
    """Fit a unigram-LM tokenizer. All corpus- and word-table-sized work is
    distributed; the driver holds only the piece table (≤ ``seed_size``
    rows after seeding, shrinking every round)."""
    import ray

    if not 0.0 < shrink < 1.0:
        raise ValueError("shrink must be in (0, 1)")
    if vocab_size < 2 or max_piece_len < 1:
        raise ValueError("need vocab_size >= 2 and max_piece_len >= 1")

    words_ds = _word_freq_table(ds, text_col, max_words)

    # ---- seed: top substrings of the (marked) words, all chars force-kept
    def substr_counts(t: pa.Table, K=max_piece_len) -> pa.Table:
        acc: dict = {}
        terms = t.column("term").to_pylist()
        tfs = t.column("sum(tf)").to_numpy(zero_copy_only=False)
        for term, f in zip(terms, tfs):
            if not term:
                continue
            w = _marked(term)
            f = int(f)
            L = len(w)
            for j in range(L):
                for i in range(j + 1, min(L, j + K) + 1):
                    p = w[j:i]
                    acc[p] = acc.get(p, 0) + f
        if not acc:
            return pa.table({"piece": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"piece": pa.array(list(acc.keys()), pa.string()),
                         "c": pa.array(list(acc.values()), pa.int64())})

    seed_ds = (words_ds.map_batches(substr_counts, batch_format="pyarrow")
               .groupby("piece").sum("c").materialize())
    top = (seed_ds.sort(["sum(c)", "piece"], descending=[True, False])
           .limit(seed_size).to_pandas())
    # alphabet (single chars) always survives — any word stays segmentable

    def char_rows(t: pa.Table) -> pa.Table:
        m = pc.equal(pc.utf8_length(t.column("piece")), 1)
        return t.filter(m)

    chars = seed_ds.map_batches(char_rows, batch_format="pyarrow").to_pandas()
    counts: dict = {p: int(c) for p, c in zip(chars["piece"], chars["sum(c)"])}
    for p, c in zip(top["piece"], top["sum(c)"]):
        counts[p] = int(c)
    alphabet = set(chars["piece"])
    total = sum(counts.values())
    pieces = {p: math.log(c) - math.log(total) for p, c in counts.items()}

    # ---- EM + prune rounds (E-step distributed over the word table)
    def e_step(pieces_now: dict) -> dict:
        ref = ray.put((pieces_now, max(len(p) for p in pieces_now)))

        def expected_counts(t: pa.Table, ref=ref) -> pa.Table:
            logp, K = ray.get(ref)
            acc: dict = {}
            terms = t.column("term").to_pylist()
            tfs = t.column("sum(tf)").to_numpy(zero_copy_only=False)
            for term, f in zip(terms, tfs):
                if not term:
                    continue
                w = _marked(term)
                f = float(f)
                L = len(w)
                # forward
                a = [-math.inf] * (L + 1)
                a[0] = 0.0
                for i in range(1, L + 1):
                    lo = max(0, i - K)
                    vals = []
                    for j in range(lo, i):
                        if a[j] == -math.inf:
                            continue
                        lp = logp.get(w[j:i])
                        if lp is None:
                            if i - j != 1:
                                continue
                            lp = _UNK_LOGP
                        vals.append(a[j] + lp)
                    if vals:
                        m = max(vals)
                        a[i] = m + math.log(sum(math.exp(v - m) for v in vals))
                if a[L] == -math.inf:
                    continue
                # backward
                b = [-math.inf] * (L + 1)
                b[L] = 0.0
                for j in range(L - 1, -1, -1):
                    vals = []
                    for i in range(j + 1, min(L, j + K) + 1):
                        if b[i] == -math.inf:
                            continue
                        lp = logp.get(w[j:i])
                        if lp is None:
                            if i - j != 1:
                                continue
                            lp = _UNK_LOGP
                        vals.append(lp + b[i])
                    if vals:
                        m = max(vals)
                        b[j] = m + math.log(sum(math.exp(v - m) for v in vals))
                z = a[L]
                for j in range(L):
                    for i in range(j + 1, min(L, j + K) + 1):
                        lp = logp.get(w[j:i])
                        if lp is None or a[j] == -math.inf or b[i] == -math.inf:
                            continue
                        g = math.exp(a[j] + lp + b[i] - z)
                        if g > 1e-12:
                            p = w[j:i]
                            acc[p] = acc.get(p, 0.0) + f * g
            if not acc:
                return pa.table({"piece": pa.array([], pa.string()),
                                 "e": pa.array([], pa.float64())})
            return pa.table({"piece": pa.array(list(acc.keys()), pa.string()),
                             "e": pa.array(list(acc.values()), pa.float64())})

        e = (words_ds.map_batches(expected_counts, batch_format="pyarrow")
             .groupby("piece").sum("e").to_pandas())
        return {p: float(c) for p, c in zip(e["piece"], e["sum(e)"]) if c > 0}

    target_core = max(vocab_size - 1, len(alphabet))  # excl. the UNK slot
    while True:
        for _ in range(em_rounds):
            e = e_step(pieces)
            tot = sum(e.values())
            # M-step; a piece with zero expected count drops out (unless alphabet)
            new = {}
            for p in pieces:
                c = e.get(p, 0.0)
                if c > 0:
                    new[p] = math.log(c) - math.log(tot)
                elif p in alphabet:
                    new[p] = _UNK_LOGP
            pieces = new
        if len(pieces) <= target_core:
            break
        # prune: lowest expected count first (never the alphabet),
        # deterministic tie-break on the piece string
        keep_n = max(target_core,
                     min(len(pieces) - 1, int(math.ceil(len(pieces) * shrink))))
        prunable = sorted((p for p in pieces if p not in alphabet),
                          key=lambda p: (e.get(p, 0.0), p))
        n_drop = len(pieces) - keep_n
        for p in prunable[:max(0, n_drop)]:
            del pieces[p]
        if len(pieces) <= target_core:
            # one final M-step over the pruned vocab
            e = e_step(pieces)
            tot = sum(e.values())
            pieces = {p: (math.log(e[p]) - math.log(tot)) if e.get(p, 0.0) > 0
                      else _UNK_LOGP
                      for p in pieces if e.get(p, 0.0) > 0 or p in alphabet}
            break
    return UnigramTokenizer(pieces)


class UnigramEncoder:
    """Actor-pool Viterbi encode stage (mirror of `BpeEncoder`): piece
    table held once per actor, distinct-word segmentations memoized across
    batches. Use via :func:`apply_unigram`."""

    def __init__(self, tokenizer_ref=None, tokenizer=None, *, text_col: str = "text",
                 id_col: str = "doc_id", out_col: str = "uni_tokens",
                 memo_cap: int = 2_000_000):
        import ray

        self.tok = tokenizer if tokenizer is not None else ray.get(tokenizer_ref)
        self.text_col, self.id_col, self.out_col = text_col, id_col, out_col
        self.memo_cap = int(memo_cap)
        self._memo: dict = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.text_col)
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
        if not len(codes):
            empty = pa.array([[]] * n, pa.list_(pa.int32()))
            return pa.table({self.id_col: t.column(self.id_col), self.out_col: empty,
                             "n_tok": pa.array(np.zeros(n, np.int32))})
        if len(self._memo) > self.memo_cap:
            self._memo = {}
        memo, enc = self._memo, self.tok.encode_word
        per_code = []
        for w in flat.dictionary.to_pylist():
            ids = memo.get(w)
            if ids is None:
                ids = np.asarray(enc(w), np.int32)
                memo[w] = ids
            per_code.append(ids)
        code_lens = np.fromiter((len(x) for x in per_code), np.int64, len(per_code))
        tok_flat = np.concatenate(per_code) if per_code else np.empty(0, np.int32)
        code_starts = np.concatenate(([0], np.cumsum(code_lens)))[:-1]
        occ_lens = code_lens[codes]
        out_starts = np.concatenate(([0], np.cumsum(occ_lens)))[:-1]
        idx = (np.arange(int(occ_lens.sum())) - np.repeat(out_starts, occ_lens)
               + np.repeat(code_starts[codes], occ_lens))
        all_toks = tok_flat[idx]
        word_lens = np.diff(offsets)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), word_lens)
        doc_ntok = np.bincount(doc_idx, weights=occ_lens, minlength=n).astype(np.int64)
        doc_offsets = np.concatenate(([0], np.cumsum(doc_ntok))).astype(np.int32)
        out = pa.ListArray.from_arrays(pa.array(doc_offsets, pa.int32()),
                                       pa.array(all_toks, pa.int32()))
        return pa.table({self.id_col: t.column(self.id_col), self.out_col: out,
                         "n_tok": pa.array(doc_ntok.astype(np.int32))})


def apply_unigram(ds, tokenizer: UnigramTokenizer, *, text_col: str = "text",
                  id_col: str = "doc_id", out_col: str = "uni_tokens",
                  concurrency: int | None = None):
    """Tokenize the corpus with a fitted unigram model: broadcast once,
    Viterbi-encode in an actor pool (piece table + distinct-word memo
    persist across batches)."""
    import ray

    ref = ray.put(tokenizer)
    kwargs = dict(tokenizer_ref=ref, text_col=text_col, id_col=id_col, out_col=out_col)
    if concurrency:
        return ds.select_columns([id_col, text_col]).map_batches(
            UnigramEncoder, fn_constructor_kwargs=kwargs,
            concurrency=concurrency, batch_format="pyarrow",
        )
    return ds.select_columns([id_col, text_col]).map_batches(
        UnigramEncoder(**kwargs), batch_format="pyarrow"
    )
