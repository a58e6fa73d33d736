"""Cluster job entrypoint — `ray job submit -- python jobs/run.py ...`.

Runs the checkpoint-resumable backfill over a token corpus on whatever
cluster Ray is attached to (on a real multi-node cluster, submit with
`ray job submit --working-dir .`; in this sandbox it runs local). Designed
for the north rule's two-cluster-size runs: identical invocations on N and
4N nodes, throughput reported on stdout as one JSON line.

Usage:
  python jobs/run.py --input /path/corpus --out /path/out \
      [--partitions 256] [--skew-threshold 1000000]
  python jobs/run.py --mode pack --input /path/corpus --out /path/out \
      [--max-len 512] [--pack-len 2048]   # tokens -> packed examples

Resume is implicit: re-running the same command skips every partition
whose lineage manifest already exists (the summary reports
``partitions_resumed``); delete the output dir for a clean run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python jobs/run.py` puts jobs/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipeline():
    from ballet_ray.feature import Feature
    from ballet_ray.pipeline import FeatureEngineeringPipeline
    from ballet_ray.stages.core import Log1p, TokenCount
    from ballet_ray.stages.encoders import StandardScaler
    from ballet_ray.stages.groupwise import GroupwiseTransform
    from ballet_ray.stages.windows import Lag, RollingMean, Sessionize

    return FeatureEngineeringPipeline(
        [
            Feature("tokens", TokenCount(), output="token_count"),
            Feature("n_tok", Log1p(), output="log_n_tok"),
            Feature("n_tok", GroupwiseTransform(StandardScaler(), groupby="source"), output="n_tok_z"),
            Feature("n_tok", Lag(1, key="doc_id", order_by="event_ts")),
            Feature("n_tok", RollingMean(3, key="doc_id", order_by="event_ts")),
            Feature("event_ts", Sessionize(3600, key="doc_id", order_by="event_ts")),
        ]
    )


def _load_corpus(input_path: str, input_format: str, columns: list[str]):
    """Corpus front end for both jobs: ``parquet`` reads the canonical
    (doc_id, text, …) table with the columns pruned at the read;
    ``warc`` reads crawl archives (see sources/warc.py) and maps them to
    the same shape in one map-only prep stage — doc_id = stable uint64
    hash of WARC-Record-ID (folded to non-negative int64), text =
    HtmlToText of the HTTP body, source = apex domain of the target URI
    (the mixture/dedup group key); ``wet`` reads Common Crawl's
    pre-extracted plain-text distribution (conversion records) the same
    way minus the HTML strip — the payload IS the page text. No shuffle,
    no state: at 100 TB the prep parallelizes per-archive like every
    other map stage."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    if input_format == "parquet":
        return rd.read_parquet(input_path, columns=columns)

    from ballet_ray.functions.partition import stable_hash_array
    from ballet_ray.sources.warc import read_warc, read_wet
    from ballet_ray.stages.text import HtmlToText, extract_domain

    html = HtmlToText() if input_format == "warc" else None

    def prep(t: pa.Table) -> pa.Table:
        rid = t.column("record_id").to_numpy(zero_copy_only=False)
        doc_id = (stable_hash_array(rid) >> np.uint64(1)).astype(np.int64)
        text = pc.cast(t.column("payload"), pa.string())
        if html is not None:
            # transform_table returns only its outputs (the pipeline
            # machinery normally handles passthrough) — reassemble the
            # canonical shape
            text = html.transform_table(
                pa.table({"page": text}), ["page"]).column("page_text")
        dom = extract_domain(
            pa.table({"url": t.column("target_uri")}),
            url_col="url", out_col="source", apex=True).column("source")
        return pa.table({
            "doc_id": pa.array(doc_id),
            "text": text,
            "source": dom,
        })

    reader = read_warc if input_format == "warc" else read_wet
    ds = reader(input_path).map_batches(prep, batch_format="pyarrow")
    return ds.select_columns(columns)


def _apply_blocklist(ds, args, have_cols: list[str]):
    """Optional UT1-style domain blocklist (``--block-domains <file>``, one
    domain per line, ``#`` comments): map-only filter on the corpus's
    domain column (``--block-domains-col``, default ``source`` — the apex
    domain under ``--input-format warc``; with parquet input the column's
    own values are matched, so blocking a plain source label like ``web``
    also works). Returns the dataset trimmed back to ``have_cols``."""
    if not getattr(args, "block_domains", None):
        return ds
    from ballet_ray.stages.text import filter_by_domain

    with open(args.block_domains) as f:
        domains = {ln.strip().lower() for ln in f
                   if ln.strip() and not ln.startswith("#")}
    ds = filter_by_domain(ds, domains,
                          domain_col=getattr(args, "block_domains_col",
                                             "source"),
                          mode="block")
    return ds.select_columns(have_cols)


def _objective_kwargs(args) -> dict:
    """CheckpointedPack objective plumbing (ingest / curate / pack modes):
    ``--objective fim|prefix_lm|span`` applies that transform per context
    window between chunking and packing — FIM reorders to PSM with
    sentinel triples, prefix_lm marks a split point (n_prefix member
    column, tokens unchanged), span emits the T5 corruption in decoder
    layout (inputs ⊕ targets, n_in member column). ``--fim-rate R`` is
    shorthand for ``--objective fim --objective-rate R``."""
    obj = getattr(args, "objective", None)
    r = getattr(args, "fim_rate", None)
    if r is not None:
        if obj not in (None, "fim"):
            raise SystemExit("--fim-rate conflicts with --objective " + obj)
        return {"objective": "fim", "objective_rate": float(r)}
    if obj is None:
        return {}
    kw: dict = {"objective": obj}
    if args.objective_rate is not None:
        kw["objective_rate"] = float(args.objective_rate)
    if obj == "span":
        kw["noise_density"] = float(args.noise_density)
        kw["mean_span_len"] = float(args.mean_span_len)
    return kw


def _tokenizer_fn(args, vocab, keep=()):
    """Per-batch tokenize function for the jobs: hash tokenization by
    default, or — with ``--tokenizer <artifact.pkl>`` — a persisted fitted
    tokenizer (``BpeTokenizer`` / ``UnigramTokenizer`` from
    ``state/persist.save_artifact``), so an expensive distributed fit runs
    once and every later ingest/curate job reuses it. The artifact is
    broadcast via ``ray.put`` and deserialized once per task (not per
    batch); ``keep`` columns ride through unchanged (encoders preserve row
    order). Output columns: (doc_id, tokens, n_tok, *keep)."""
    art = getattr(args, "tokenizer", None)
    if not art:
        from ballet_ray.stages.text import hash_tokenize

        def fn(t):
            return hash_tokenize(t, text_col="text", vocab=vocab).select(
                ["doc_id", "tokens", "n_tok", *keep]
            )

        return fn

    import ray

    from ballet_ray.state.persist import load_artifact

    tok = load_artifact(art)
    cls = type(tok).__name__
    if cls in ("BpeTokenizer", "WordPieceTokenizer", "ByteBpeTokenizer"):
        # BpeEncoder is tokenizer-generic (anything exposing encode_word;
        # a ByteBpeTokenizer's space_attach attribute flips its splitter)
        from ballet_ray.stages.bpe import BpeEncoder as Enc
    elif cls == "UnigramTokenizer":
        from ballet_ray.stages.unigram import UnigramEncoder as Enc
    else:
        raise ValueError(
            f"--tokenizer artifact holds {cls}; expected BpeTokenizer, "
            f"ByteBpeTokenizer, WordPieceTokenizer or UnigramTokenizer"
        )
    ref = ray.put(tok)
    holder: dict = {}

    def fn(t):
        enc = holder.get("enc")
        if enc is None:
            enc = holder["enc"] = Enc(tokenizer_ref=ref, out_col="tokens")
        out = enc(t)
        for k in keep:
            out = out.append_column(k, t.column(k))
        return out

    return fn


def run_ingest(args) -> None:
    """End-to-end corpus ingest: streaming exact dedup (sharded Bloom
    index, state checkpointed under <out>/bloom_state so a later run of
    NEW data suppresses everything already ingested) → Gopher-style fused
    quality filter → hash tokenization to the canonical (doc_id, tokens,
    n_tok) shape → resumable chunk+pack (CheckpointedPack manifests).
    Everything up to the pack phase is one map-only streaming chain —
    zero shuffles; the pack phase resumes per shard-group."""
    import ray

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ballet_ray.feature import Feature
    from ballet_ray.pipeline import FeatureEngineeringPipeline
    from ballet_ray.stages.streaming_dedup import make_bloom_index, streaming_exact_dedup
    from ballet_ray.stages.text import QualityScore, WordRepetition
    from ballet_ray.state.checkpoint import CheckpointedPack

    t0 = time.time()
    out = args.out
    state_dir = os.path.join(out, "bloom_state")
    tokens_dir = os.path.join(out, "tokens")
    handles = make_bloom_index(args.bloom_shards, bits=args.bloom_bits)
    restored = False
    if os.path.isdir(state_dir):
        blobs = []
        for s in range(args.bloom_shards):
            p = os.path.join(state_dir, f"shard-{s}.bin")
            blobs.append(open(p, "rb").read() if os.path.exists(p) else None)
        if all(b is not None for b in blobs):
            ray.get([h.restore.remote(b) for h, b in zip(handles, blobs)])
            restored = True

    load_cols = ["doc_id", "text"]
    if getattr(args, "block_domains", None):
        load_cols.append(getattr(args, "block_domains_col", "source"))
    ds = _load_corpus(args.input,
                      getattr(args, "input_format", "parquet"),
                      load_cols)
    ds = _apply_blocklist(ds, args, ["doc_id", "text"])
    docs_in = ds.count()

    pipe = FeatureEngineeringPipeline(
        [Feature("text", QualityScore()), Feature("text", WordRepetition())]
    )
    scored = pipe.fit_transform(ds)

    min_words = args.min_words

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("words"), min_words),
                pc.less_equal(t.column("dup_word_frac"), 0.6),
            ),
            pc.less_equal(t.column("top_word_frac"), 0.13),
        )
        return t.filter(m).select(["doc_id", "text"])

    vocab = args.vocab
    tokenize = _tokenizer_fn(args, vocab)

    # the stateful Bloom stage goes LAST, immediately before the one
    # consuming write: any earlier placement lets a downstream schema
    # probe (ds.schema(fetch_if_missing=True), a pipeline fit, hash_join's
    # _prep) execute the lazy insert chain a first time, after which the
    # real execution sees every hash as already-present and silently
    # suppresses the whole corpus. Quality-filter-then-dedup also shrinks
    # what the index must absorb.
    deduped = streaming_exact_dedup(
        scored.map_batches(keep, batch_format="pyarrow"), col="text", handles=handles
    )
    kept = deduped.map_batches(tokenize, batch_format="pyarrow")
    # intermediate tokens parquet = the pack phase's resume substrate
    if os.path.isdir(tokens_dir):
        import shutil

        shutil.rmtree(tokens_dir)
    kept.write_parquet(tokens_dir)
    os.makedirs(tokens_dir, exist_ok=True)  # empty stream writes no files
    has_tokens = any(f.endswith(".parquet") for f in os.listdir(tokens_dir))
    docs_kept = (
        rd.read_parquet(tokens_dir, columns=["doc_id"]).count() if has_tokens else 0
    )

    # token-level benchmark decontamination (PaLM rule on token n-grams):
    # applied AT the tokens-parquet materialization boundary — the corpus
    # side of find_contaminated_tokens re-reads the already-written tokens
    # dir, so neither the hits pass nor the filtered rewrite can replay
    # the stateful Bloom chain (the probe hazard documented above).
    docs_decon = 0
    if has_tokens and getattr(args, "decontam_tokens", None):
        from ballet_ray.stages.dedup import find_contaminated_tokens
        from ballet_ray.stages.joins import semi_join_filter

        eval_ds = rd.read_parquet(args.decontam_tokens, columns=["tokens"])
        tok_ds = rd.read_parquet(tokens_dir)
        hits = find_contaminated_tokens(
            tok_ds, eval_ds, n=int(getattr(args, "decontam_n", 8) or 8),
            with_fraction=True)
        frac = float(getattr(args, "decontam_frac", 0.7) or 0.7)
        bad = hits.map_batches(
            lambda t, f=frac: t.filter(
                pc.greater_equal(t.column("hit_frac"), f)
            ).select(["doc_id"]),
            batch_format="pyarrow",
        ).to_pandas()
        docs_decon = int(len(bad))
        if docs_decon:
            import shutil

            clean_dir = os.path.join(out, "tokens_clean")
            if os.path.isdir(clean_dir):
                shutil.rmtree(clean_dir)
            semi_join_filter(tok_ds, bad["doc_id"].to_numpy(),
                             key="doc_id", invert=True).write_parquet(clean_dir)
            os.makedirs(clean_dir, exist_ok=True)
            tokens_dir = clean_dir
            has_tokens = any(f.endswith(".parquet")
                             for f in os.listdir(tokens_dir))

    if has_tokens:
        pack_summary = CheckpointedPack(
            os.path.join(out, "packs"), max_len=args.max_len, stride=args.stride,
            pack_len=args.pack_len, files_per_part=args.files_per_part,
            sep_token=args.sep_token, **_objective_kwargs(args),
        ).run(tokens_dir)
    else:  # everything suppressed by the index (a pure replay) or filtered
        pack_summary = {"partitions_total": 0, "partitions_processed": 0,
                        "partitions_resumed": 0, "packs": 0, "tokens_out": 0}

    os.makedirs(state_dir, exist_ok=True)
    for s, blob in enumerate(ray.get([h.state.remote() for h in handles])):
        tmp = os.path.join(state_dir, f".shard-{s}.tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(state_dir, f"shard-{s}.bin"))

    dt = time.time() - t0
    summary = {
        "mode": "ingest",
        "docs_in": int(docs_in),
        "docs_kept": int(docs_kept),
        "docs_decontaminated": docs_decon,
        "bloom_restored": restored,
        "pack": pack_summary,
        "wall_s_total": round(dt, 3),
    }
    if getattr(args, "report", False):
        from ballet_ray.stages.report import corpus_report

        # full-schema read: the mixture section needs lang/source columns
        # the ingest path prunes away (warc input carries doc_id/text/source)
        rpt = (rd.read_parquet(args.input)
               if getattr(args, "input_format", "parquet") == "parquet"
               else _load_corpus(args.input, "warc",
                                 ["doc_id", "text", "source"]))
        summary["input_report"] = corpus_report(
            rpt, text_col="text", id_col="doc_id"
        )
    print(json.dumps(summary))


def _stage_done(manifest_dir: str, name: str):
    p = os.path.join(manifest_dir, f"stage-{name}.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def _stage_mark(manifest_dir: str, name: str, info: dict) -> None:
    os.makedirs(manifest_dir, exist_ok=True)
    tmp = os.path.join(manifest_dir, f".stage-{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(info, f)
    os.replace(tmp, os.path.join(manifest_dir, f"stage-{name}.json"))


def _fresh_dir(path: str) -> None:
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


def _write_stage(ds, path: str) -> int:
    """Materialize a stage's output as partitioned parquet; returns rows."""
    import ray.data as rd

    _fresh_dir(path)
    ds.write_parquet(path)
    os.makedirs(path, exist_ok=True)  # empty stream writes nothing
    if not any(f.endswith(".parquet") for f in os.listdir(path)):
        return 0
    return rd.read_parquet(path, columns=["doc_id"]).count()


def run_tag(args) -> None:
    """Dolma-architecture attribute tagging (Soldaini et al. 2024: taggers
    write per-doc ATTRIBUTE files beside the corpus; the filter/mix policy
    is a separate, cheaply re-runnable decision over those sidecars — no
    re-scan of the text when a threshold changes). One fused map pass
    computes quality + word-repetition + Gopher structural + PII-count
    signals, one actor-pool pass adds language id, and ``--tag-ppl`` adds
    corpus-fit bigram-LM perplexity (one distributed LM fit, shuffle-free
    scoring). Output: <out>/attributes parquet keyed by doc_id — every
    signal column, never the text."""
    import ray.data as rd

    import pyarrow as pa

    from ballet_ray.feature import Feature
    from ballet_ray.pipeline import FeatureEngineeringPipeline
    from ballet_ray.stages.text import (GopherSignals, LangId, PiiSignals,
                                        PiiSpans, QualityScore,
                                        WordRepetition)

    t0 = time.time()
    ds = _load_corpus(args.input, getattr(args, "input_format", "parquet"),
                      ["doc_id", "text"])
    docs_in = ds.count()

    feats = [
        Feature("text", QualityScore()),
        Feature("text", WordRepetition()),
        Feature("text", GopherSignals()),
        Feature("text", PiiSignals()),
    ]
    if getattr(args, "tag_spans", False):
        # Dolma span taggers: character offsets per detector ride the
        # sidecar so --mode mix can REDACT (apply_spans) without ever
        # re-scanning the text for matches
        feats.append(Feature("text", PiiSpans()))
    pipe = FeatureEngineeringPipeline(feats)
    tagged = pipe.fit_transform(ds)
    # task-based LangId instance: a fixed actor pool can reserve every CPU
    # on a small cluster and starve the upstream stage (the same deadlock
    # the minhash signing stage hit); the per-task table build is tiny
    tagged = tagged.map_batches(LangId(), batch_format="pyarrow")

    if getattr(args, "tag_ppl", False):
        from ballet_ray.stages.text import bigram_logprob_scores

        attr_cols = [c for c in tagged.schema().names
                     if c not in ("doc_id", "text")]
        tagged = bigram_logprob_scores(tagged, round_to=6,
                                       keep_cols=attr_cols)
    else:
        tagged = tagged.map_batches(
            lambda t: t.drop_columns(["text"]), batch_format="pyarrow")

    rows = _write_stage(tagged, os.path.join(args.out, "attributes"))
    summary = {
        "mode": "tag",
        "docs_in": int(docs_in),
        "rows_out": int(rows),
        "ppl": bool(getattr(args, "tag_ppl", False)),
        "wall_s_total": round(time.time() - t0, 3),
    }
    print(json.dumps(summary))


def run_mix(args) -> None:
    """Dolma-architecture mixer (the policy half of ``--mode tag``): apply
    ``--policy`` — a pandas-query boolean expression over attribute
    columns, e.g. ``"quality >= 0.3 and dup_line_frac <= 0.3 and
    pred_lang == 'en'"`` — to the attribute sidecars, then keep exactly
    the passing docs from the corpus via one distributed id-keyed join.
    The text is never re-scanned for signals (thresholds can be iterated
    over the cheap sidecars), the keep set never lands on the driver, and
    only the attribute columns the policy references leave storage."""
    import io
    import keyword
    import tokenize

    import ray.data as rd

    from ballet_ray.stages.joins import hash_join

    t0 = time.time()
    policy = args.policy
    if not policy:
        raise SystemExit("--mode mix requires --policy")
    attrs_path = getattr(args, "attributes", None) or os.path.join(
        args.input, "..", "attributes")
    have = set(rd.read_parquet(attrs_path).schema().names)
    names = {tok.string
             for tok in tokenize.generate_tokens(io.StringIO(policy).readline)
             if tok.type == tokenize.NAME and not keyword.iskeyword(tok.string)}
    use = sorted((names & have) - {"doc_id"})
    if not use:
        raise SystemExit(
            f"--policy references no attribute column; have: {sorted(have)}")
    attrs = rd.read_parquet(attrs_path, columns=["doc_id", *use])

    def flt(df):
        return df.query(policy, engine="python")[["doc_id"]]

    kept_ids = attrs.map_batches(flt, batch_format="pandas")
    ds = _load_corpus(args.input, getattr(args, "input_format", "parquet"),
                      ["doc_id", "text"])
    docs_in = ds.count()
    mixed = hash_join(ds, kept_ids, on="doc_id")
    span_cols = [c.strip()
                 for c in (getattr(args, "apply_spans", None) or "").split(",")
                 if c.strip()]
    if span_cols:
        # Dolma redaction half: span offsets ride one more column-pruned
        # sidecar join; only rows with >=1 span pay the splice
        from ballet_ray.stages.text import apply_spans

        missing = [c for c in span_cols if c not in have]
        if missing:
            raise SystemExit(
                f"--apply-spans column(s) {missing} not in attributes; "
                f"have: {sorted(have)}")
        spans = rd.read_parquet(attrs_path, columns=["doc_id", *span_cols])
        mixed = apply_spans(hash_join(mixed, spans, on="doc_id"),
                            span_cols=span_cols,
                            repl=getattr(args, "span_repl", "") or "")
    rows = _write_stage(mixed, os.path.join(args.out, "mixed"))
    print(json.dumps({
        "mode": "mix",
        "docs_in": int(docs_in),
        "docs_kept": int(rows),
        "policy": policy,
        "wall_s_total": round(time.time() - t0, 3),
    }))


def run_curate(args) -> None:
    """The composed curation flagship — what a 100-TB corpus user actually
    runs, chaining the individually-oracled stages end to end:

      clean   line dedup (corpus-wide boilerplate removal) → near-dedup
              (batch MinHash-LSH cluster dedup by default — deterministic
              canonical winner; ``--dedup streaming`` switches to the
              sharded-Bloom online index with state checkpointed under
              <out>/bloom_state for append-only ingest) → Gopher fused
              quality filter; the mixing group column is re-joined through
              one narrow (id, group) hash join.
      lm      corpus-self-trained LM fluency filter: keep the best
              --ppl-keep quantile by unigram mean log-prob (default;
              vocab-bounded model table) or bigram perplexity
              (``--lm bigram``, CCNet-style); optional ``--quality-model``
              artifact applies the fastText-shape classifier filter on
              top.
      mix     temperature-flattened mixture over the group column
              (default), DSIR importance resampling toward --target, or
              passthrough.
      tokens  deterministic global shuffle index (epoch order reproducible
              across runs/partitionings) + hash tokenization to the
              canonical (doc_id, tokens, n_tok, shuffle_idx) shape.
      pack    resumable context-window chunk + best-fit packing
              (CheckpointedPack manifests).

    Every stage materializes partitioned parquet under <out>/<stage>/ and
    records a lineage manifest under <out>/manifests/; re-running the same
    command skips completed stages, so a failed run resumes at the first
    unfinished stage and a resumed run's final packs are byte-identical to
    a clean run's (all selection is hash-priority deterministic).
    ``--stop-after <stage>`` checkpoints a partial run on purpose.
    """
    import ray
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ballet_ray.feature import Feature
    from ballet_ray.pipeline import FeatureEngineeringPipeline
    from ballet_ray.stages.joins import hash_join
    from ballet_ray.stages.text import QualityScore, WordRepetition

    t0 = time.time()
    out = args.out
    man = os.path.join(out, "manifests")
    group_col = args.mix_group
    stages_summary: dict[str, dict] = {}
    order = ["clean", "lm", "mix", "tokens", "pack"]
    stop_ix = order.index(args.stop_after) if args.stop_after else len(order) - 1

    def finish():
        summary = {
            "mode": "curate",
            "stages": stages_summary,
            "stopped_after": order[stop_ix],
            "wall_s_total": round(time.time() - t0, 3),
        }
        print(json.dumps(summary))

    # ---- clean ----------------------------------------------------------
    clean_dir = os.path.join(out, "clean")
    info = _stage_done(man, "clean")
    if info is None:
        ts = time.time()
        carry = [group_col] if group_col else []
        load_cols = ["doc_id", "text", *carry]
        bcol = getattr(args, "block_domains_col", "source")
        if getattr(args, "block_domains", None) and bcol not in load_cols:
            load_cols.append(bcol)
        ds = _load_corpus(args.input,
                          getattr(args, "input_format", "parquet"),
                          load_cols)
        ds = _apply_blocklist(ds, args, ["doc_id", "text", *carry])
        docs_in = ds.count()
        from ballet_ray.stages.dedup import remove_duplicate_lines

        # the group column rides the payload side of line dedup's one
        # id-keyed join (carry_cols) — no second corpus-wide meta re-join
        cleaned = remove_duplicate_lines(
            ds, text_col="text", id_col="doc_id", carry_cols=tuple(carry)
        ).select_columns(["doc_id", "text", *carry])

        if getattr(args, "c4", False):
            # C4 line/doc heuristics BEFORE dedup: cleaned lines give the
            # signatures a boilerplate-free view (map-only, zero shuffle)
            from ballet_ray.stages.text import c4_clean

            cleaned = c4_clean(cleaned, stats=False)

        restored = False
        # batch dedup modes are STATELESS transforms — safe anywhere in the
        # chain, so they run early (dedup-then-score, fewer docs scored)
        if args.dedup == "minhash":
            from ballet_ray.stages.dedup import dedup_by_minhash

            kw = {}
            if getattr(args, "dedup_keep", "min_id") == "longest":
                # keep-the-longest-copy retention: near-duplicate cluster
                # members differ in length (boilerplate trims, truncations);
                # the longest copy is the canonical choice. The length
                # column is computed map-only and dropped right after —
                # only (id, len) rides cluster_losers' membership join.
                def _with_len(t: pa.Table) -> pa.Table:
                    return t.append_column(
                        "__len", pc.utf8_length(t.column("text"))
                    )

                cleaned = cleaned.map_batches(_with_len, batch_format="pyarrow")
                kw = {"keep_col": "__len", "keep": "max"}
            cleaned = dedup_by_minhash(
                cleaned, text_col="text", id_col="doc_id", resolve="broadcast",
                **kw,
            )
            if kw:
                cleaned = cleaned.select_columns(["doc_id", "text", *carry])
        elif args.dedup == "exact":
            from ballet_ray.stages.dedup import exact_dedup

            cleaned = exact_dedup(cleaned, col="text", id_col="doc_id")

        if getattr(args, "gopher_full", False):
            # the complete published rule set (Rae 2021 Table A1) in one
            # fused map pass; min_words still honored via override
            from ballet_ray.stages.text import gopher_quality_filter

            kept = gopher_quality_filter(
                cleaned, overrides={"min_words": args.min_words},
            ).map_batches(
                lambda t: t.select(["doc_id", "text", *carry]),
                batch_format="pyarrow")
        else:
            pipe = FeatureEngineeringPipeline(
                [Feature("text", QualityScore()), Feature("text", WordRepetition())]
            )
            scored = pipe.fit_transform(cleaned)
            min_words = args.min_words

            def keep(t: pa.Table) -> pa.Table:
                m = pc.and_(
                    pc.and_(
                        pc.greater_equal(t.column("words"), min_words),
                        pc.less_equal(t.column("dup_word_frac"), 0.6),
                    ),
                    pc.less_equal(t.column("top_word_frac"), 0.13),
                )
                # carry (the group column) rode line dedup's carry_cols and
                # the pipeline's passthrough — no meta re-join needed
                return t.filter(m).select(["doc_id", "text", *carry])

            kept = scored.map_batches(keep, batch_format="pyarrow")
        if getattr(args, "decontaminate", None):
            # benchmark decontamination (GPT-3/PaLM appendix rule): drop a
            # doc when >= --decontam-frac of its n-gram windows appear in
            # the eval set. Eval windows broadcast once; the corpus pass
            # is shuffle-free; the contaminated-id set is small by
            # definition, so the drop is a broadcast anti-filter.
            from ballet_ray.stages.dedup import find_contaminated
            from ballet_ray.stages.joins import semi_join_filter

            eval_ds = rd.read_parquet(args.decontaminate,
                                      columns=["doc_id", "text"])
            hits = find_contaminated(
                kept, eval_ds, n=int(getattr(args, "decontam_n", 8) or 8),
                key="hash", with_fraction=True)
            frac = float(getattr(args, "decontam_frac", 0.7) or 0.7)
            bad = hits.map_batches(
                lambda t, f=frac: t.filter(
                    pc.greater_equal(t.column("hit_frac"), f)
                ).select(["doc_id"]),
                batch_format="pyarrow",
            ).to_pandas()
            if len(bad):
                kept = semi_join_filter(kept, bad["doc_id"].to_numpy(),
                                        key="doc_id", invert=True)
        if getattr(args, "redact_pii", False):
            # Dolma-style PII scrub (emails/URLs/IPs/long digit runs →
            # placeholder tokens) on the SURVIVING docs — before the
            # streaming dedup stage so the Bloom index hashes exactly the
            # text that lands in the output (replay suppression stays
            # consistent across runs). One vectorized RE2 pass per
            # pattern, zero shuffle.
            from ballet_ray.stages.text import RegexRedactor

            _red = RegexRedactor()

            def scrub(t: pa.Table) -> pa.Table:
                red = _red.transform_table(t, ["text"])
                i = t.column_names.index("text")
                return t.set_column(i, "text", red.column("text_redacted"))

            kept = kept.map_batches(scrub, batch_format="pyarrow")
        if args.dedup == "streaming":
            # the stateful Bloom stage goes LAST, immediately before the one
            # consuming write: any earlier placement lets a downstream probe
            # (pipeline fit's schema fetch, hash_join's _prep) execute the
            # lazy insert chain once, after which the real run sees every
            # hash as already-present and suppresses the entire corpus.
            from ballet_ray.stages.streaming_dedup import (
                make_bloom_index,
                streaming_minhash_dedup,
            )

            state_dir = os.path.join(out, "bloom_state")
            handles = make_bloom_index(args.bloom_shards, bits=args.bloom_bits)
            if os.path.isdir(state_dir):
                blobs = [
                    open(os.path.join(state_dir, f"shard-{s}.bin"), "rb").read()
                    for s in range(args.bloom_shards)
                    if os.path.exists(os.path.join(state_dir, f"shard-{s}.bin"))
                ]
                if len(blobs) == args.bloom_shards:
                    ray.get([h.restore.remote(b) for h, b in zip(handles, blobs)])
                    restored = True
            kept = streaming_minhash_dedup(
                kept, handles=handles, id_col="doc_id", text_col="text"
            )
        rows = _write_stage(kept, clean_dir)
        if args.dedup == "streaming":
            state_dir = os.path.join(out, "bloom_state")
            os.makedirs(state_dir, exist_ok=True)
            for s, blob in enumerate(ray.get([h.state.remote() for h in handles])):
                tmp = os.path.join(state_dir, f".shard-{s}.tmp")
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, os.path.join(state_dir, f"shard-{s}.bin"))
        info = {"docs_in": int(docs_in), "rows_out": int(rows),
                "bloom_restored": restored, "wall_s": round(time.time() - ts, 3)}
        _stage_mark(man, "clean", info)
    else:
        info = {**info, "resumed": True}
    stages_summary["clean"] = info
    if stop_ix == 0:
        return finish()

    # ---- lm (perplexity + optional classifier filter) --------------------
    lm_dir = os.path.join(out, "lm")
    info = _stage_done(man, "lm")
    if info is None:
        ts = time.time()
        ds = rd.read_parquet(clean_dir)
        thr = None
        ppl_buckets = getattr(args, "ppl_buckets", None)
        if stages_summary["clean"]["rows_out"] == 0:
            rows = _write_stage(ds, lm_dir)
        elif ppl_buckets or args.ppl_keep < 1.0:
            from ballet_ray.stages.sketches import approx_quantiles

            # unigram default: its model table is vocab-bounded (one tiny
            # term groupby + broadcast), so the stage's cost is two streaming
            # scans at ANY corpus size. --lm bigram upgrades to the CCNet-
            # style interpolated model — Zipfian real text keeps the bigram
            # table tractable, but its term-keyed groupby is the one part of
            # this job whose exchange grows with corpus size (a uniform-
            # random stress corpus makes nearly every bigram distinct).
            # the payload rides the scoring map (keep_cols) so the
            # below-threshold filter is map-only over the materialized
            # scored corpus — no doc-keyed join back
            carry = [c for c in ds.schema().names if c != "doc_id"]
            if args.lm in ("bigram", "kn"):
                if args.lm == "kn":
                    # the real CCNet filter shape: interpolated Kneser-Ney
                    # trigram (KenLM's family) — its trigram-keyed fit
                    # exchange is the largest of the three LM options
                    from ballet_ray.stages.knlm import kn_logprob_scores as _lm
                else:
                    from ballet_ray.stages.text import bigram_logprob_scores as _lm

                scored = _lm(
                    ds, text_col="text", id_col="doc_id", round_to=None,
                    keep_cols=carry,
                ).materialize()
                # ascending ppl: the best-scoring (lowest-ppl) third ranks
                # first — CCNet's 'head'
                vcol, asc_labels = "ppl", ("head", "middle", "tail")
            else:
                from ballet_ray.stages.text import unigram_logprob_scores

                scored = unigram_logprob_scores(
                    ds, text_col="text", id_col="doc_id", round_to=None,
                    keep_cols=carry,
                ).materialize()
                # ascending mean_logprob: HIGHER is better, so the label
                # order reverses — the top-ranked third is 'head'
                vcol, asc_labels = "mean_logprob", ("tail", "middle", "head")
            if ppl_buckets:
                # CCNet's head/middle/tail selection (Wenzek 2020 §3.3):
                # rank every doc by LM score WITHIN its mixture group and
                # cut the ranking into thirds; keep the named buckets.
                # Replaces the global --ppl-keep quantile threshold.
                from ballet_ray.stages.windows import rank_buckets

                keep_set = {b.strip() for b in ppl_buckets.split(",")
                            if b.strip()}
                if not keep_set or keep_set - {"head", "middle", "tail"}:
                    raise SystemExit(
                        f"--ppl-buckets must be a comma list of "
                        f"head/middle/tail, got {ppl_buckets!r}")
                gcol = (group_col if group_col
                        and group_col in scored.schema().names else None)
                bucketed = rank_buckets(scored, value_col=vcol,
                                        group_col=gcol, labels=asc_labels,
                                        out_col="ppl_bucket")
                keep_arr = pa.array(sorted(keep_set))
                filtered = bucketed.map_batches(
                    lambda t, ka=keep_arr: t.filter(
                        pc.is_in(t.column("ppl_bucket"), value_set=ka)),
                    batch_format="pyarrow",
                )
                thr = ppl_buckets
            elif args.lm in ("bigram", "kn"):
                thr = float(approx_quantiles(scored, "ppl", [args.ppl_keep])[0])
                filtered = scored.map_batches(
                    lambda t, thr=thr: t.filter(
                        pc.less_equal(t.column("ppl"), thr)),
                    batch_format="pyarrow",
                )
            else:
                thr = float(
                    approx_quantiles(scored, "mean_logprob",
                                     [1.0 - args.ppl_keep])[0])
                filtered = scored.map_batches(
                    lambda t, thr=thr: t.filter(
                        pc.greater_equal(t.column("mean_logprob"), thr)),
                    batch_format="pyarrow",
                )
            if args.quality_model:
                from ballet_ray.state.persist import load_artifact
                from ballet_ray.stages.classifier import quality_filter_by_model

                model = load_artifact(args.quality_model)
                filtered = quality_filter_by_model(
                    filtered, model, threshold=args.quality_threshold
                )
            rows = _write_stage(filtered, lm_dir)
        else:
            rows = _write_stage(ds, lm_dir)
        info = {"rows_out": int(rows), "lm_threshold": thr,
                "wall_s": round(time.time() - ts, 3)}
        _stage_mark(man, "lm", info)
    else:
        info = {**info, "resumed": True}
    stages_summary["lm"] = info
    if stop_ix == 1:
        return finish()

    # ---- mix -------------------------------------------------------------
    mix_dir = os.path.join(out, "mix")
    info = _stage_done(man, "mix")
    if info is None:
        ts = time.time()
        ds = rd.read_parquet(lm_dir)
        if stages_summary["lm"]["rows_out"] == 0 or args.mix == "none":
            rows = _write_stage(ds, mix_dir)
        elif args.mix == "temperature":
            from ballet_ray.stages.sampling import temperature_sample

            mixed = temperature_sample(
                ds, group_col=group_col, key_col="doc_id", alpha=args.alpha,
                target_total=args.mix_total, salt="curate",
            )
            rows = _write_stage(mixed, mix_dir)
        elif args.mix == "unimax":
            from ballet_ray.stages.sampling import unimax_sample

            if not args.mix_total:
                raise SystemExit("--mix unimax requires --mix-total (the budget)")
            # max_epochs pinned to 1 inside the job: epoch expansion
            # duplicates doc_ids, which the downstream shuffle/tokenize
            # stages key on — up-sampling is a library-level op
            # (unimax_sample(max_epochs>1)), not a curate stage. At cap 1
            # this is the fair water-fill DOWN-sampler: every group gets
            # the same allocation unless it is smaller than the level.
            cols = ds.schema().names
            mixed = unimax_sample(
                ds, group_col=group_col, key_col="doc_id",
                budget=args.mix_total, max_epochs=1.0, salt="curate",
            ).select_columns(cols)
            rows = _write_stage(mixed, mix_dir)
        elif args.mix == "dsir":
            from ballet_ray.stages.dsir import dsir_resample

            if not args.target:
                raise SystemExit("--mix dsir requires --target")
            target = rd.read_parquet(args.target, columns=["doc_id", "text"])
            k = args.dsir_k or max(1, stages_summary["lm"]["rows_out"] // 2)
            sel = dsir_resample(
                ds, target, k=k, text_col="text", id_col="doc_id"
            ).select_columns(["doc_id"]).materialize()
            # winner ids broadcast below the membership gate (same ladder
            # as cap_per_group) — the payload only shuffles above it
            if sel.count() <= 2_000_000:
                from ballet_ray.stages.joins import semi_join_filter

                ids = sel.to_pandas()["doc_id"].to_numpy()
                mixed = semi_join_filter(ds, ids, key="doc_id")
            else:
                mixed = hash_join(ds, sel, on="doc_id")
            rows = _write_stage(mixed, mix_dir)
        else:
            raise SystemExit(f"unknown --mix {args.mix}")
        info = {"rows_out": int(rows), "wall_s": round(time.time() - ts, 3)}
        _stage_mark(man, "mix", info)
    else:
        info = {**info, "resumed": True}
    stages_summary["mix"] = info
    if stop_ix == 2:
        return finish()

    # ---- tokens (global shuffle order + tokenize) --------------------------
    # Deterministic sharded layout: shard = shuffle_idx range, ONE sorted
    # file per shard written inside the task (tmp + atomic rename). The
    # file count and every file's contents depend only on (input, salt,
    # rows_per_shard) — never on block boundaries or scheduling — so a
    # resumed run's packs are identical to a clean run's, and each shard
    # is an independent resume unit for the pack phase.
    tokens_dir = os.path.join(out, "tokens")
    info = _stage_done(man, "tokens")
    if info is None:
        import math

        import pyarrow.parquet as _pq

        ts = time.time()
        rows = 0
        n_mix = stages_summary["mix"]["rows_out"]
        if n_mix > 0:
            from ballet_ray.stages.sampling import global_shuffle_index

            _fresh_dir(tokens_dir)
            ds = rd.read_parquet(mix_dir, columns=["doc_id", "text"])
            ordered = global_shuffle_index(ds, key_col="doc_id", salt="curate")
            vocab = args.vocab
            P = max(1, math.ceil(n_mix / args.rows_per_shard))

            tok_fn = _tokenizer_fn(args, vocab, keep=("shuffle_idx",))

            def tokenize(t: pa.Table) -> pa.Table:
                out_t = tok_fn(t)
                idx = out_t.column("shuffle_idx").to_numpy(zero_copy_only=False)
                part = (idx * P // n_mix).astype("int64")
                return out_t.append_column("__part", pa.array(part))

            def write_part(t: pa.Table) -> pa.Table:
                part = int(t.column("__part")[0].as_py())
                t = t.sort_by("shuffle_idx").drop_columns(["__part"])
                tmp = os.path.join(tokens_dir, f".part-{part:05d}.tmp")
                _pq.write_table(t, tmp)
                os.replace(tmp, os.path.join(tokens_dir, f"part-{part:05d}.parquet"))
                return pa.table({"n": pa.array([len(t)], type=pa.int64())})

            counts = (
                ordered.map_batches(tokenize, batch_format="pyarrow")
                .groupby("__part")
                .map_groups(write_part, batch_format="pyarrow")
            )
            rows = int(sum(sum(b["n"].to_pylist()) for b in
                           counts.iter_batches(batch_format="pyarrow")))
        else:
            _fresh_dir(tokens_dir)
        info = {"rows_out": int(rows), "wall_s": round(time.time() - ts, 3)}
        _stage_mark(man, "tokens", info)
    else:
        info = {**info, "resumed": True}
    stages_summary["tokens"] = info
    if stop_ix == 3:
        return finish()

    # ---- pack (natively resumable per partition) ---------------------------
    from ballet_ray.state.checkpoint import CheckpointedPack

    ts = time.time()
    if stages_summary["tokens"]["rows_out"] > 0:
        pack_summary = CheckpointedPack(
            os.path.join(out, "packs"), max_len=args.max_len, stride=args.stride,
            pack_len=args.pack_len, files_per_part=args.files_per_part,
            sep_token=args.sep_token, **_objective_kwargs(args),
        ).run(tokens_dir)
    else:
        pack_summary = {"partitions_total": 0, "partitions_processed": 0,
                        "partitions_resumed": 0, "packs": 0, "tokens_out": 0}
    pack_summary["wall_s"] = round(time.time() - ts, 3)
    stages_summary["pack"] = pack_summary
    finish()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--skew-threshold", type=int, default=None)
    ap.add_argument("--slice-target", type=int, default=250_000)
    ap.add_argument("--hot-sample-frac", type=float, default=0.05)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--input-format", choices=["parquet", "warc", "wet"],
                    default="parquet",
                    help="warc: read crawl archives (sources/warc.py) and map "
                         "them to the canonical (doc_id, text, source) shape "
                         "— doc_id from WARC-Record-ID, text via HtmlToText, "
                         "source = apex domain; wet: Common Crawl extracted "
                         "plain text (conversion records), same shape without "
                         "the HTML strip (ingest/curate modes)")
    ap.add_argument("--gopher-full", action="store_true",
                    help="curate: replace the 3-signal fused quality filter "
                         "with the COMPLETE published Gopher rule set "
                         "(word/mean-length bounds, symbol ratio, bullet/"
                         "ellipsis lines, alpha words, stop words, dup "
                         "line/para fractions, n-gram repetition bounds)")
    ap.add_argument("--c4", action="store_true",
                    help="curate: apply C4's line/doc heuristics (terminal-"
                         "punctuation lines with >=5 words, drop javascript "
                         "lines, drop lorem-ipsum/brace docs) after line "
                         "dedup, before near-dedup")
    ap.add_argument("--block-domains", default=None,
                    help="path to a domain blocklist file (one per line, # "
                         "comments): map-only drop before any other stage "
                         "(ingest/curate modes)")
    ap.add_argument("--block-domains-col", default="source",
                    help="column the blocklist matches against (apex domain "
                         "under --input-format warc)")
    ap.add_argument("--mode", choices=["backfill", "pack", "ingest", "curate", "tag", "mix"],
                    default="backfill")
    ap.add_argument("--dedup", choices=["minhash", "exact", "streaming", "none"],
                    default="minhash",
                    help="curate mode: near-dedup strategy (minhash = batch "
                         "LSH cluster dedup, deterministic; streaming = "
                         "sharded-Bloom online index with checkpointed state)")
    ap.add_argument("--dedup-keep", choices=["min_id", "longest"],
                    default="min_id",
                    help="curate mode, --dedup minhash: which near-dup "
                         "cluster member survives (min_id = deterministic "
                         "representative; longest = keep the longest copy, "
                         "min-id tiebreak)")
    ap.add_argument("--ppl-keep", type=float, default=0.9,
                    help="curate mode: keep the best this-fraction of docs by "
                         "LM score (1.0 disables the filter)")
    ap.add_argument("--decontaminate", default=None,
                    help="curate mode: eval-set parquet (doc_id, text); "
                         "docs whose contaminated n-gram window fraction "
                         "reaches --decontam-frac are dropped in the clean "
                         "stage")
    ap.add_argument("--decontam-n", type=int, default=8,
                    help="decontamination window size in words")
    ap.add_argument("--decontam-frac", type=float, default=0.7,
                    help="drop threshold on the contaminated-window "
                         "fraction (PaLM uses 0.7)")
    ap.add_argument("--decontam-tokens", default=None,
                    help="ingest mode: eval-set parquet of pre-tokenized "
                         "sequences (tokens: list<int32>); docs whose "
                         "contaminated TOKEN-window fraction reaches "
                         "--decontam-frac are dropped after tokenization, "
                         "before chunk+pack (window size --decontam-n, "
                         "counted in tokens)")
    ap.add_argument("--redact-pii", action="store_true",
                    help="curate mode: scrub PII (emails/URLs/IPs/long "
                         "digit runs -> placeholder tokens) from surviving "
                         "docs in the clean stage")
    ap.add_argument("--ppl-buckets", default=None,
                    help="curate mode: CCNet head/middle/tail selection — "
                         "rank docs by LM score within the mixture group, "
                         "cut into thirds, keep this comma list of buckets "
                         "(e.g. 'head,middle'); replaces --ppl-keep")
    ap.add_argument("--lm", choices=["unigram", "bigram", "kn"],
                    default="unigram",
                    help="curate mode: perplexity-filter model (unigram = "
                         "vocab-bounded model table, scale-safe default; "
                         "bigram = CCNet-style interpolated model; kn = "
                         "interpolated Kneser-Ney trigram, the KenLM family "
                         "CCNet actually uses)")
    ap.add_argument("--quality-model", default=None,
                    help="curate mode: path to a persisted fit_text_logreg "
                         "artifact; applies the classifier filter after the "
                         "perplexity filter")
    ap.add_argument("--quality-threshold", type=float, default=0.5)
    ap.add_argument("--mix", choices=["temperature", "dsir", "unimax", "none"],
                    default="temperature")
    ap.add_argument("--mix-group", default="source",
                    help="curate mode: mixture group column (re-joined from "
                         "the input after dedup)")
    ap.add_argument("--alpha", type=float, default=0.3)
    ap.add_argument("--mix-total", type=float, default=None)
    ap.add_argument("--target", default=None,
                    help="curate mode: DSIR target-domain parquet")
    ap.add_argument("--dsir-k", type=int, default=None)
    ap.add_argument("--stop-after", choices=["clean", "lm", "mix", "tokens"],
                    default=None,
                    help="curate mode: checkpoint a partial run after this "
                         "stage (a rerun resumes from the next one)")
    ap.add_argument("--rows-per-shard", type=int, default=100_000,
                    help="curate mode: rows per deterministic token shard "
                         "file (bounds the per-task working set; the file "
                         "layout depends only on this and the row count)")
    ap.add_argument("--bloom-shards", type=int, default=4)
    ap.add_argument("--bloom-bits", type=int, default=1 << 24)
    ap.add_argument("--vocab", type=int, default=50_257)
    ap.add_argument("--attributes", default=None,
                    help="mix mode: attribute sidecar dir from --mode tag")
    ap.add_argument("--policy", default=None,
                    help="mix mode: pandas-query boolean expression over "
                         "attribute columns")
    ap.add_argument("--tag-spans", action="store_true",
                    help="tag mode: add per-detector PII span offsets "
                         "(Dolma span-tagger shape) to the attribute set")
    ap.add_argument("--apply-spans", default=None,
                    help="mix mode: comma list of span attribute columns "
                         "(from --tag-spans) to redact out of the mixed "
                         "text")
    ap.add_argument("--span-repl", default="",
                    help="mix mode: replacement string for --apply-spans "
                         "(default: remove)")
    ap.add_argument("--tag-ppl", action="store_true",
                    help="tag mode: add corpus-fit bigram-LM perplexity "
                         "to the attribute set (one distributed LM fit)")
    ap.add_argument("--tokenizer", default=None,
                    help="persisted fitted tokenizer artifact (BpeTokenizer "
                         "or UnigramTokenizer, from state/persist."
                         "save_artifact); replaces hash tokenization in "
                         "ingest/curate")
    ap.add_argument("--min-words", type=int, default=20)
    ap.add_argument("--report", action="store_true",
                    help="ingest mode: include a sketch-backed corpus_report "
                         "of the INPUT in the summary JSON")
    ap.add_argument("--pipeline", default=None,
                    help="path to a saved pipeline artifact (state/persist.py); "
                         "backfill mode applies it instead of the built-in pipeline")
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--stride", type=int, default=None)
    ap.add_argument("--pack-len", type=int, default=2048)
    ap.add_argument("--files-per-part", type=int, default=2)
    ap.add_argument("--sep-token", type=int, default=None)
    ap.add_argument("--fim-rate", type=float, default=None,
                    help="apply the fill-in-the-middle transform to this "
                         "fraction of context windows between chunking and "
                         "packing (ingest/curate/pack modes); shorthand for "
                         "--objective fim --objective-rate R")
    ap.add_argument("--objective", choices=["fim", "prefix_lm", "span"],
                    default=None,
                    help="objective transform applied per context window "
                         "between chunking and packing: fim (PSM sentinel "
                         "reorder), prefix_lm (n_prefix loss boundary per "
                         "pack member, tokens unchanged), span (T5 span "
                         "corruption in decoder layout with n_in per member)")
    ap.add_argument("--objective-rate", type=float, default=None,
                    help="fraction of windows the fim/prefix_lm objective "
                         "transforms (default 0.5)")
    ap.add_argument("--noise-density", type=float, default=0.15,
                    help="span objective: fraction of tokens masked")
    ap.add_argument("--mean-span-len", type=float, default=3.0,
                    help="span objective: mean corrupted-span length")
    args = ap.parse_args()
    if args.input_format != "parquet" and args.mode not in ("ingest", "curate"):
        ap.error(f"--input-format {args.input_format} is supported by --mode "
                 "ingest/curate (backfill/pack consume the canonical parquet "
                 "shapes)")

    import ray

    if not ray.is_initialized():
        # RAY_ADDRESS=<host:port|auto> attaches the job to a running cluster
        # (the `ray start --head` / `ray job submit` deployment shape);
        # unset or "local" starts a private single-node instance. num_cpus
        # is only valid when WE own the instance — a cluster's size is the
        # cluster's.
        addr = os.environ.get("RAY_ADDRESS") or "local"
        kw = ({"num_cpus": args.num_cpus}
              if addr == "local" and args.num_cpus else {})
        ray.init(address=addr, include_dashboard=False,
                 logging_level="ERROR", **kw)
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    if args.mode == "ingest":
        run_ingest(args)
        ray.shutdown()
        return

    if args.mode == "curate":
        run_curate(args)
        ray.shutdown()
        return

    if args.mode == "tag":
        run_tag(args)
        ray.shutdown()
        return

    if args.mode == "mix":
        run_mix(args)
        ray.shutdown()
        return

    if args.mode == "pack":
        from ballet_ray.state.checkpoint import CheckpointedPack

        t0 = time.time()
        summary = CheckpointedPack(
            args.out, max_len=args.max_len, stride=args.stride,
            pack_len=args.pack_len, files_per_part=args.files_per_part,
            sep_token=args.sep_token, **_objective_kwargs(args),
        ).run(args.input)
        dt = time.time() - t0
        summary["wall_s_total"] = round(dt, 3)
        if summary.get("tokens_out"):
            summary["tokens_per_sec"] = round(summary["tokens_out"] / dt)
        print(json.dumps(summary))
        ray.shutdown()
        return

    from ballet_ray.state.checkpoint import CheckpointedBackfill

    if args.pipeline:
        from ballet_ray.state.persist import load_pipeline

        pipeline = load_pipeline(args.pipeline)
    else:
        pipeline = build_pipeline()

    t0 = time.time()
    summary = CheckpointedBackfill(
        args.out,
        key=args.key,
        num_partitions=args.partitions,
        skew_threshold=args.skew_threshold,
        slice_target=args.slice_target,
        hot_sample_frac=args.hot_sample_frac,
        fit_columns=["doc_id", "event_ts", "n_tok", "source"],
    ).run(args.input, pipeline)
    dt = time.time() - t0
    summary["wall_s_total"] = round(dt, 3)
    if summary.get("rows_processed"):
        summary["rows_per_sec"] = round(summary["rows_processed"] / dt)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
