"""Trainable byte-pair-encoding tokenizer (Sennrich/Haddow/Birch 2016) —
the canonical tokens-axis operator: turn raw text into the int32 token
arrays every other pipeline in this engine consumes.

Ray-Data-first split of the classic algorithm:

- **Fit** (:func:`train_bpe`): BPE training operates on the WORD-FREQUENCY
  table, not the corpus — so the distributed part is one term-keyed
  ``groupby().sum()`` (with per-batch combiners, the same shape as every
  text-model fit in `stages/text.py`), capped at the ``max_words`` most
  frequent words before it ships to the driver. The merge loop itself is
  inherently sequential (each merge changes the pair counts) and runs on
  the driver over that bounded table — exactly how reference BPE trainers
  work (they all train on a word-count dict). Deterministic: ties break on
  the lexicographically smallest pair.
- **Apply** (:func:`apply_bpe`): a STATEFUL ACTOR-POOL ``map_batches``
  stage — :class:`BpeEncoder` builds the rank table once per actor in
  ``__init__`` and keeps a word→tokens memo across batches (Zipf: the
  distinct-word stream collapses, so per-batch work is O(new words), not
  O(tokens)). Batches dictionary-encode, encode DISTINCT words only, and
  gather token ids back through the codes — no per-token Python in the
  steady state.

Output is ``list<int32>`` token ids over the trained vocab (id order =
base symbols sorted, then merges in training order — reproducible), plus
``n_tok``; unknown characters map to the reserved UNK id 0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

UNK_ID = 0
EOW = "</w>"  # end-of-word marker, as in the original BPE formulation


def _word_symbols(word: str) -> tuple:
    return tuple(word) + (EOW,)


class BpeTokenizer:
    """Fitted artifact: ordered merge list + id table. Picklable and tiny
    (≤ vocab entries) — broadcast once, used by every encoder actor."""

    def __init__(self, merges: list, base_symbols: list):
        self.merges = list(merges)
        self.ranks = {tuple(m): r for r, m in enumerate(self.merges)}
        # id 0 = UNK; then base symbols (sorted), then merge products in order
        toks = ["<unk>"] + list(base_symbols) + [a + b for a, b in self.merges]
        self.token_to_id = {t: i for i, t in enumerate(toks)}
        self.id_to_token = toks

    def vocab_size(self) -> int:
        return len(self.id_to_token)

    def decode(self, ids) -> str:
        """ids → text (tokens concatenate; EOW marks word boundaries).
        Unknown ids render as the UNK token."""
        toks = self.id_to_token
        s = "".join(toks[i] if 0 <= i < len(toks) else toks[UNK_ID] for i in ids)
        return s.replace(EOW, " ").rstrip(" ")

    def encode_word(self, word: str) -> list:
        """Greedy lowest-rank pair merging (the standard BPE encode)."""
        syms = greedy_merge(list(_word_symbols(word)), self.ranks)
        t2i = self.token_to_id
        return [t2i.get(s, UNK_ID) for s in syms]


def train_bpe(ds, *, text_col: str = "text", num_merges: int = 1000,
              max_words: int = 1_000_000) -> BpeTokenizer:
    """Fit BPE merges on the corpus's word-frequency table (one
    distributed term-keyed groupby, top-``max_words`` rows to the driver),
    then the sequential merge loop over that bounded table. Deterministic:
    the winning pair is (max count, then lexicographically smallest)."""
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
        return pa.table({"term": flat.dictionary,
                         "tf": pa.array(np.bincount(codes, minlength=len(flat.dictionary)).astype(np.int64))})

    counts_ds = (ds.select_columns([text_col])
                 .map_batches(word_counts, batch_format="pyarrow")
                 .groupby("term").sum("tf").materialize())
    if counts_ds.count() > max_words:
        counts = counts_ds.sort(["sum(tf)", "term"], descending=[True, False]).limit(max_words).to_pandas()
    else:
        counts = counts_ds.to_pandas()

    vocab = {_word_symbols(w): int(f) for w, f in zip(counts["term"], counts["sum(tf)"]) if w}
    base = sorted({s for syms in vocab for s in syms})
    return BpeTokenizer(merge_loop(vocab, num_merges), base)


def merge_loop(vocab: dict, num_merges: int) -> list:
    """The sequential BPE merge loop over a bounded {symbol-tuple: freq}
    word table — shared by :func:`train_bpe` (char symbols + EOW) and
    :func:`ballet_ray.stages.bytebpe.train_byte_bpe` (byte symbols).

    Incremental trainer (Sennrich's original optimization): only words
    CONTAINING the winning pair are rewritten, and pair counts update by
    deltas through a pair→words index — O(Σ rewritten-word lengths) per
    merge instead of a full vocabulary rescan (the naive loop is
    O(merges × vocab): intractable at 1M words × 50k merges).
    Deterministic: the winning pair is (max count, then lexicographically
    smallest)."""
    words = list(vocab.keys())           # word id -> symbol tuple
    freqs = [vocab[w] for w in words]
    pair_counts: dict = {}
    pair_words: dict = {}                # pair -> set of word ids
    for wid, syms in enumerate(words):
        f = freqs[wid]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wid)

    merges = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic: max count, tie -> lexicographically smallest pair
        top = max(pair_counts.values())
        pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(pair)
        a, b = pair
        ab = a + b
        for wid in list(pair_words.get(pair, ())):
            syms = words[wid]
            f = freqs[wid]
            # remove the word's current pair contributions
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wid)
                    if not ws:
                        del pair_words[p]
            # rewrite
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
            # add the rewritten word's pair contributions
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wid)
    return merges


def greedy_merge(syms: list, ranks: dict) -> list:
    """Standard BPE encode: repeatedly merge the lowest-rank adjacent pair
    until none applies. Shared by the char-level and byte-level tokenizers."""
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def attach_spaces(words: pa.ListArray) -> pa.ListArray:
    """Byte-level pretokenization helper: given the space-split word lists
    of a text column, prepend ``' '`` to every NON-INITIAL word of each row
    so the separating space travels with the following pretoken (GPT-2's
    dominant pretoken shape, Radford et al. 2019). Plain concatenation of
    the rewritten pretokens reconstructs each text byte-for-byte —
    consecutive / leading spaces survive as the empty-string pretokens
    ``split_pattern`` emits, which the rewrite turns into ``" "`` (or
    leaves ``""`` at position 0). Fully vectorized (one mask + one
    element-wise concat); no per-row Python."""
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    flat = words.flatten()
    if not len(flat):
        return words
    mask = np.ones(len(flat), bool)
    starts = offs[:-1][np.diff(offs) > 0]   # first word of each non-empty row
    mask[starts] = False
    pref = pa.array(np.where(mask, " ", ""))
    flat2 = pc.binary_join_element_wise(pref, flat, "")
    return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat2)


class BpeEncoder:
    """Actor-pool encode stage: rank table built once per actor, distinct
    words memoized across batches. Use as
    ``ds.map_batches(BpeEncoder, fn_constructor_kwargs=dict(tokenizer_ref=ref,
    text_col=..., id_col=...), concurrency=N, batch_format="pyarrow")``."""

    def __init__(self, tokenizer_ref=None, tokenizer=None, *, text_col: str = "text",
                 id_col: str = "doc_id", out_col: str = "bpe_tokens",
                 memo_cap: int = 2_000_000):
        import ray

        self.tok = tokenizer if tokenizer is not None else ray.get(tokenizer_ref)
        self.text_col, self.id_col, self.out_col = text_col, id_col, out_col
        # Zipf bounds the memo's GROWTH RATE, not its total over an
        # unbounded stream (URLs/typos/hashes): reset at memo_cap so a
        # long-lived actor's heap stays bounded (~100 MB at the default).
        self.memo_cap = int(memo_cap)
        self._memo: dict = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        # null rows encode to the EMPTY sequence (contract shared with the
        # null-typed-block guard above): fill to keep split_pattern happy,
        # then drop the filler rows' word occurrences below
        null_rows = pc.is_null(col).to_numpy(zero_copy_only=False)
        col = pc.fill_null(col, "")
        words = pc.split_pattern(col, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        if getattr(self.tok, "space_attach", False):
            # byte-level artifacts carry the separating space on the
            # following pretoken (see attach_spaces) — same offsets, so
            # everything downstream is unchanged
            words = attach_spaces(words)
        n = len(words)
        flat = words.flatten().dictionary_encode()
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        if null_rows.any() and len(codes):
            wl = np.diff(offsets)
            codes = codes[~null_rows[np.repeat(np.arange(n, dtype=np.int64), wl)]]
            wl = np.where(null_rows, 0, wl)
            offsets = np.concatenate(([0], np.cumsum(wl)))
        if not len(codes):
            empty = pa.array([[]] * n, pa.list_(pa.int32()))
            return pa.table({self.id_col: t.column(self.id_col), self.out_col: empty,
                             "n_tok": pa.array(np.zeros(n, np.int32))})
        if len(self._memo) > self.memo_cap:
            self._memo = {}
        memo, enc = self._memo, self.tok.encode_word
        dwords = flat.dictionary.to_pylist()
        per_code = []
        for w in dwords:  # distinct words only; memo carries across batches
            ids = memo.get(w)
            if ids is None:
                ids = np.asarray(enc(w), np.int32)
                memo[w] = ids
            per_code.append(ids)
        code_lens = np.fromiter((len(x) for x in per_code), np.int64, len(per_code))
        tok_flat = np.concatenate(per_code) if per_code else np.empty(0, np.int32)
        code_starts = np.concatenate(([0], np.cumsum(code_lens)))[:-1]
        # gather each word occurrence's token run, then re-segment by doc
        occ_lens = code_lens[codes]
        out_starts = np.concatenate(([0], np.cumsum(occ_lens)))[:-1]
        idx = (np.arange(int(occ_lens.sum())) - np.repeat(out_starts, occ_lens)
               + np.repeat(code_starts[codes], occ_lens))
        all_toks = tok_flat[idx]
        # doc token counts: sum of occurrence lens per doc
        word_lens = np.diff(offsets)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), word_lens)
        doc_ntok = np.bincount(doc_idx, weights=occ_lens, minlength=n).astype(np.int64)
        doc_offsets = np.concatenate(([0], np.cumsum(doc_ntok))).astype(np.int32)
        out = pa.ListArray.from_arrays(pa.array(doc_offsets, pa.int32()),
                                       pa.array(all_toks, pa.int32()))
        return pa.table({self.id_col: t.column(self.id_col), self.out_col: out,
                         "n_tok": pa.array(doc_ntok.astype(np.int32))})


def apply_bpe(ds, tokenizer: BpeTokenizer, *, text_col: str = "text",
              id_col: str = "doc_id", out_col: str = "bpe_tokens",
              concurrency: int | None = None):
    """Tokenize the corpus: broadcast the fitted tokenizer once, encode in
    an actor pool (``concurrency`` actors) so the rank table and the
    word→tokens memo persist across batches."""
    import ray

    ref = ray.put(tokenizer)
    kwargs = dict(tokenizer_ref=ref, text_col=text_col, id_col=id_col, out_col=out_col)
    if concurrency:
        return ds.select_columns([id_col, text_col]).map_batches(
            BpeEncoder, fn_constructor_kwargs=kwargs,
            concurrency=concurrency, batch_format="pyarrow",
        )
    return ds.select_columns([id_col, text_col]).map_batches(
        BpeEncoder(**kwargs), batch_format="pyarrow"
    )
