"""Tokenizer interop: export / import fitted BPE artifacts in the
published GPT-2 two-file format (Radford et al. 2019; the format
HuggingFace `tokenizers`' BPE model reads):

- ``vocab.json`` — ``{token: id}`` in id order, UTF-8, no ASCII escaping
- ``merges.txt`` — ``#version: 0.2`` header then one ``left right`` pair
  per line in training order

:class:`~ballet_ray.stages.bytebpe.ByteBpeTokenizer` symbols already live
in GPT-2's printable byte↔unicode alphabet (``bytes_to_unicode``), so its
export is byte-identical to what GPT-2-family tools expect; the
char-level :class:`~ballet_ray.stages.bpe.BpeTokenizer` writes the same
shape over its own symbol set (``<unk>`` + chars + ``</w>``-terminated
products), which round-trips through :func:`load_bpe_files` and any
reader of the generic HF BPE format.

This is interchange for the fitted ARTIFACT only (a driver-side file
pair, KBs); corpora never pass through here. The Ray-side persistence
envelope (versioned, hash-backend-stamped) stays
``state/persist.save_artifact`` — this module is the bridge out of / into
that world.
"""

from __future__ import annotations

import json
import os

from ballet_ray.stages.bpe import BpeTokenizer
from ballet_ray.stages.bytebpe import ByteBpeTokenizer

_HEADER = "#version: 0.2"


def export_bpe_files(tok, out_dir: str) -> tuple[str, str]:
    """Write ``vocab.json`` + ``merges.txt`` for a fitted
    :class:`BpeTokenizer` or :class:`ByteBpeTokenizer`. Returns the two
    paths. Symbols containing a literal space or newline cannot be
    represented in the line-oriented merge format and raise (byte-level
    symbols never do — space maps to a printable codepoint)."""
    if not isinstance(tok, (BpeTokenizer, ByteBpeTokenizer)):
        raise TypeError(
            f"GPT-2 two-file export covers the BPE families only, got "
            f"{type(tok).__name__} (persist others via state/persist)")
    for a, b in tok.merges:
        if any(ch in s for s in (a, b) for ch in (" ", "\n")):
            raise ValueError(
                f"merge pair {(a, b)!r} contains a space/newline and cannot "
                "be written to merges.txt")
    os.makedirs(out_dir, exist_ok=True)
    vpath = os.path.join(out_dir, "vocab.json")
    mpath = os.path.join(out_dir, "merges.txt")
    with open(vpath, "w", encoding="utf-8") as fh:
        json.dump(tok.token_to_id, fh, ensure_ascii=False)
    with open(mpath, "w", encoding="utf-8") as fh:
        fh.write(_HEADER + "\n")
        for a, b in tok.merges:
            fh.write(f"{a} {b}\n")
    return vpath, mpath


def load_bpe_files(in_dir: str, *, byte_level: bool | None = None):
    """Reconstruct a tokenizer from a ``vocab.json`` + ``merges.txt``
    directory. ``byte_level=None`` autodetects: a 256-symbol base whose
    id order is exactly GPT-2's byte alphabet loads as
    :class:`ByteBpeTokenizer`, anything else as :class:`BpeTokenizer`
    (id 0 must be ``<unk>`` there — this repo's char-level layout).
    The rebuilt vocabulary must reproduce ``vocab.json`` exactly or the
    load fails loudly (a truncated/reordered file must not silently
    produce a different tokenizer)."""
    with open(os.path.join(in_dir, "vocab.json"), encoding="utf-8") as fh:
        vocab = json.load(fh)
    with open(os.path.join(in_dir, "merges.txt"), encoding="utf-8") as fh:
        lines = [l.rstrip("\n") for l in fh]
    if lines and lines[0].startswith("#"):
        lines = lines[1:]
    merges = []
    for l in lines:
        if not l:
            continue
        a, sep, b = l.partition(" ")
        if not sep or " " in b:
            raise ValueError(f"malformed merges.txt line: {l!r}")
        merges.append((a, b))

    n_base = len(vocab) - len(merges)
    by_id = sorted(vocab, key=vocab.get)
    if byte_level is None:
        from ballet_ray.stages.bytebpe import bytes_to_unicode

        gpt2_base = [bytes_to_unicode()[b] for b in range(256)]
        byte_level = n_base == 256 and by_id[:256] == gpt2_base
    if byte_level:
        tok = ByteBpeTokenizer(merges)
    else:
        if n_base < 1 or by_id[0] != "<unk>":
            raise ValueError(
                "char-level vocab.json must have <unk> at id 0 "
                f"(got {by_id[0]!r}); not a layout this loader knows")
        tok = BpeTokenizer(merges, by_id[1:n_base])
    if tok.token_to_id != vocab:
        raise ValueError(
            "vocab.json does not match the vocabulary rebuilt from "
            "merges.txt — files are inconsistent or from an unsupported "
            "layout")
    return tok

def export_wordpiece_vocab(tok, out_dir: str) -> str:
    """Write a fitted :class:`~ballet_ray.stages.wordpiece.WordPieceTokenizer`
    as BERT's ``vocab.txt`` (one piece per line, line number = id — the
    format BERT-family tools read). Returns the path. Pieces containing a
    newline cannot be represented and raise."""
    from ballet_ray.stages.wordpiece import WordPieceTokenizer

    if not isinstance(tok, WordPieceTokenizer):
        raise TypeError(
            f"vocab.txt export covers WordPiece only, got {type(tok).__name__}")
    if any("\n" in p for p in tok.id_to_piece):
        raise ValueError("a piece contains a newline and cannot be written")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "vocab.txt")
    with open(path, "w", encoding="utf-8") as fh:
        for p in tok.id_to_piece:
            fh.write(p + "\n")
    return path


def load_wordpiece_vocab(in_dir: str):
    """Rebuild a WordPiece tokenizer from a ``vocab.txt`` directory (or a
    direct file path). Encoding depends only on the piece set, so the
    rebuilt object segments identically to the exporter."""
    from ballet_ray.stages.wordpiece import WordPieceTokenizer

    path = in_dir if in_dir.endswith(".txt") else os.path.join(in_dir, "vocab.txt")
    with open(path, encoding="utf-8") as fh:
        pieces = [l.rstrip("\n") for l in fh]
    while pieces and pieces[-1] == "":
        pieces.pop()
    return WordPieceTokenizer.from_pieces(pieces)

def export_unigram_vocab(tok, out_dir: str) -> str:
    """Write a fitted :class:`~ballet_ray.stages.unigram.UnigramTokenizer`
    as SentencePiece's text ``.vocab`` shape: one ``piece<TAB>logprob``
    line per id, in id order (``<unk>`` at id 0 with score 0, as
    SentencePiece prints it). Scores use ``repr`` so float64 round-trips
    exactly. Returns the path."""
    from ballet_ray.stages.unigram import UnigramTokenizer

    if not isinstance(tok, UnigramTokenizer):
        raise TypeError(
            f".vocab export covers Unigram only, got {type(tok).__name__}")
    if any("\n" in p or "\t" in p for p in tok.id_to_piece):
        raise ValueError("a piece contains a tab/newline and cannot be written")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "unigram.vocab")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("<unk>\t0\n")
        for p in tok.id_to_piece[1:]:
            fh.write(f"{p}\t{tok.logp[p]!r}\n")
    return path


def load_unigram_vocab(in_dir: str):
    """Rebuild a Unigram tokenizer from a ``unigram.vocab`` directory (or
    direct file path). The constructor re-derives ids from (logp, piece);
    the rebuilt order must reproduce the file's id order exactly or the
    load fails loudly (a reordered/edited file must not silently shift
    ids)."""
    from ballet_ray.stages.unigram import UnigramTokenizer

    path = (in_dir if in_dir.endswith(".vocab")
            else os.path.join(in_dir, "unigram.vocab"))
    pieces = {}
    order = []
    with open(path, encoding="utf-8") as fh:
        for ln, l in enumerate(fh):
            l = l.rstrip("\n")
            if not l:
                continue
            p, sep, s = l.partition("\t")
            if not sep:
                raise ValueError(f"malformed .vocab line {ln}: {l!r}")
            if ln == 0:
                if p != "<unk>":
                    raise ValueError("first .vocab line must be <unk>")
                continue
            pieces[p] = float(s)
            order.append(p)
    tok = UnigramTokenizer(pieces)
    if tok.id_to_piece[1:] != order:
        raise ValueError(
            ".vocab id order does not match the (logp, piece) order the "
            "constructor derives — file is edited or from an unsupported "
            "layout")
    return tok
