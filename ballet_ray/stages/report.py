"""One-call corpus report — the "what is in my corpus?" summary every
ingest run wants, composed from this package's mergeable sketches so the
driver never sees rows:

- size: documents, total words, words-per-doc quantiles (KLL sketch)
- duplication: exact-duplicate fraction estimate (KMV distinct over a
  content hash vs the exact doc count)
- mixture: rows per value of each ``group_cols`` entry (Misra-Gries
  top-k — exact when the cardinality is below the capacity, which
  lang/source columns are)
- vocabulary: approximate distinct words (KMV over the flattened word
  stream) and the top-k words (Misra-Gries)

Every component is one streaming pass with a tiny tree-reduced or
capacity-bounded exchange; nothing materializes the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def corpus_report(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: tuple = ("lang", "source"),
    top_words: int = 10,
    quantiles: tuple = (0.1, 0.5, 0.9, 0.99),
) -> dict:
    from ballet_ray.stages.dedup import add_content_hash
    from ballet_ray.stages.sketches import (
        approx_distinct,
        approx_quantiles,
        approx_top_k,
    )

    schema_names = set()
    try:
        schema_names = set(ds.schema().names)
    except Exception:
        pass

    n_docs = ds.count()
    report: dict = {"documents": int(n_docs)}

    # words-per-doc + flattened word stream stats from one derived pass
    def word_stats(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        words = pc.split_pattern(col, " ")
        lens = np.diff(words.offsets.to_numpy(zero_copy_only=False))
        return pa.table({"words": pa.array(lens.astype(np.int64))})

    lens_ds = ds.select_columns([text_col]).map_batches(
        word_stats, batch_format="pyarrow"
    ).materialize()
    import ray.data.aggregate as _agg

    report["total_words"] = int(lens_ds.aggregate(_agg.Sum("words", alias_name="t"))["t"] or 0)
    qs = approx_quantiles(lens_ds, "words", list(quantiles))
    report["words_per_doc_quantiles"] = {
        str(q): float(v) for q, v in zip(quantiles, qs)
    }

    # exact-duplicate fraction: distinct content hashes vs rows
    # (add_content_hash emits a 128-bit pair; the KMV estimate over one
    # 64-bit half is fine — estimation error dwarfs collision error)
    hashed = add_content_hash(ds.select_columns([text_col]), text_col)
    distinct_docs = approx_distinct(hashed, "content_h1")
    report["approx_duplicate_fraction"] = round(
        max(0.0, 1.0 - distinct_docs / n_docs), 4
    ) if n_docs else 0.0

    # vocabulary
    def flat_words(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        return pa.table({"w": pc.split_pattern(col, " ").flatten()})

    words_ds = ds.select_columns([text_col]).map_batches(flat_words, batch_format="pyarrow")
    report["approx_distinct_words"] = int(approx_distinct(words_ds, "w"))
    top = approx_top_k(words_ds, "w", k=top_words).to_pandas()
    report["top_words"] = list(zip(top["w"], top["cnt"].astype(int)))

    # mixture per grouping column (exact below the MG capacity)
    mixture = {}
    for g in group_cols:
        if g not in schema_names:
            continue
        t = approx_top_k(ds.select_columns([g]), g, k=64, capacity=512).to_pandas()
        mixture[g] = {str(k): int(v) for k, v in zip(t[g], t["cnt"])}
    report["mixture"] = mixture
    return report


def tokenizer_report(ds, tokenizer, *, text_col: str = "text",
                     id_col: str = "doc_id", unk_id: int = 0) -> dict:
    """Evaluate a FITTED tokenizer over the corpus — the numbers a user
    compares before committing a corpus to one of the three trainable
    tokenizers (BPE / WordPiece / unigram-LM; anything exposing
    ``encode_word`` works):

    - ``fertility``: tokens per word (lower = better morphology fit)
    - ``chars_per_token``: compression (text chars / tokens)
    - ``unk_rate``: UNK tokens / all tokens
    - ``doc_unk_fraction``: docs containing ≥1 UNK
    - ``tokens_per_doc``

    One streaming actor-free map pass: each batch encodes through the
    tokenizer-generic :class:`~ballet_ray.stages.bpe.BpeEncoder` (built
    once per task, distinct-word memo) and emits ONE six-counter partial
    row; the driver reduces partials with a distributed sum — nothing
    corpus-sized ships anywhere."""
    import ray

    from ballet_ray.stages.bpe import BpeEncoder

    ref = ray.put(tokenizer)
    holder: dict = {}

    def partials(t: pa.Table) -> pa.Table:
        enc = holder.get("e")
        if enc is None:
            enc = holder["e"] = BpeEncoder(
                tokenizer_ref=ref, text_col=text_col, id_col=id_col)
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        pieces = pc.split_pattern(col, " ").flatten()
        n_words = int(pc.sum(pc.greater(pc.utf8_length(pieces), 0)).as_py()
                      or 0)
        n_chars = int(pc.sum(pc.utf8_length(col)).as_py() or 0)
        out = enc(t)
        toks = out.column(out.column_names[1])  # the list<int32> column
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        n_tok = len(flat)
        unk_mask = pc.equal(flat, unk_id)
        n_unk = int(pc.sum(unk_mask).as_py() or 0)
        ntok_arr = out.column("n_tok").to_numpy(zero_copy_only=False)
        # docs with >=1 UNK: segment the flat unk mask by the list offsets
        unk_np = unk_mask.to_numpy(zero_copy_only=False).astype(np.int64)
        ends = np.cumsum(ntok_arr.astype(np.int64))
        csum = np.concatenate(([0], np.cumsum(unk_np)))
        per_doc_unk = csum[ends] - csum[ends - ntok_arr.astype(np.int64)]
        return pa.table({
            "docs": pa.array([len(t)], pa.int64()),
            "words": pa.array([n_words], pa.int64()),
            "chars": pa.array([n_chars], pa.int64()),
            "tokens": pa.array([n_tok], pa.int64()),
            "unks": pa.array([n_unk], pa.int64()),
            "docs_unk": pa.array([int((per_doc_unk > 0).sum())], pa.int64()),
        })

    part = ds.select_columns([id_col, text_col]).map_batches(
        partials, batch_format="pyarrow")
    cols = ("docs", "words", "chars", "tokens", "unks", "docs_unk")
    sums = part.sum(list(cols)) or {}
    tot = {c: int(sums.get(f"sum({c})") or 0) for c in cols}
    return {
        "documents": tot["docs"],
        "words": tot["words"],
        "tokens": tot["tokens"],
        "vocab_size": int(tokenizer.vocab_size()),
        "fertility": round(tot["tokens"] / tot["words"], 4)
        if tot["words"] else 0.0,
        "chars_per_token": round(tot["chars"] / tot["tokens"], 4)
        if tot["tokens"] else 0.0,
        "tokens_per_doc": round(tot["tokens"] / tot["docs"], 2)
        if tot["docs"] else 0.0,
        "unk_rate": round(tot["unks"] / tot["tokens"], 6)
        if tot["tokens"] else 0.0,
        "doc_unk_fraction": round(tot["docs_unk"] / tot["docs"], 4)
        if tot["docs"] else 0.0,
    }
