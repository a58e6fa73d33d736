"""``python -m ballet_ray`` — CLI entry points.

Reference surface: ``ballet validate`` (reference ballet/cli.py:80-116):
per-stage flags (each defaulting off, overridable by the same
``BALLET_*`` environment variables) plus ``--check-all/-A``. The
reference loads its project from the cwd; this engine has no git project
machinery (SURVEY §2.6 keeps that out of scope), so the config comes
from a Python file or dotted module exposing ``get_config() -> dict`` or
a ``CONFIG`` dict in the shape ``ballet_ray.validation.main.validate``
documents (the dataset may be given as a parquet path under
``data.path`` for convenience).

Exit status: 0 when every requested stage passes, 1 on a validation
failure (the reference's exception types), 2 on a usage/config error.
"""

from __future__ import annotations

import argparse
import importlib
import importlib.util
import json
import os
import sys


def _env_flag(name: str) -> bool:
    v = os.environ.get(name, "")
    return v.lower() in ("1", "true", "yes", "on")


def _load_config(spec: str) -> dict:
    # a ballet.yml path, or a project directory containing one, routes
    # through the project facade (reference `ballet validate` loads the
    # project from cwd; ballet_ray/project.py parses the same YAML shape)
    if spec.endswith((".yml", ".yaml")) or (
        os.path.isdir(spec) and os.path.isfile(os.path.join(spec, "ballet.yml"))
    ):
        from ballet_ray.project import Project

        return Project.from_path(spec).validate_config()
    if os.path.exists(spec):
        mod_name = "_ballet_ray_cli_config"
        s = importlib.util.spec_from_file_location(mod_name, spec)
        mod = importlib.util.module_from_spec(s)
        s.loader.exec_module(mod)
    else:
        mod = importlib.import_module(spec)
    if hasattr(mod, "get_config"):
        cfg = mod.get_config()
    elif hasattr(mod, "CONFIG"):
        cfg = dict(mod.CONFIG)
    else:
        raise SystemExit(f"config {spec!r} defines neither get_config() nor CONFIG")
    data = cfg.get("data", {})
    if "dataset" not in data and "path" in data:
        import ray.data as rd

        data = dict(data)
        data["dataset"] = rd.read_parquet(data.pop("path"))
        cfg = {**cfg, "data": data}
    return cfg


def _jsonable(x):
    if isinstance(x, dict):
        return {str(k): _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (str, int, float, bool)) or x is None:
        return x
    return repr(x)


def cmd_validate(args) -> int:
    from ballet_ray.exc import BalletRayError
    from ballet_ray.validation.main import validate

    from ballet_ray.project import ConfigurationError

    import ray

    if not ray.is_initialized():  # the driver may own the session already
        ncpu = os.environ.get("BALLET_RAY_NUM_CPUS")
        kw = {"num_cpus": int(ncpu)} if ncpu else {}
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", **kw)

    # after ray.init: both config forms may build Dataset read plans
    try:
        cfg = _load_config(args.config)
    except (ImportError, OSError, SystemExit, ConfigurationError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    try:
        report = validate(
            cfg,
            check_project_structure=args.check_project_structure or args.check_all,
            check_feature_api=args.check_feature_api or args.check_all,
            evaluate_feature_acceptance=args.evaluate_feature_acceptance or args.check_all,
            evaluate_feature_pruning=args.evaluate_feature_pruning or args.check_all,
        )
    except BalletRayError as e:
        print(json.dumps({"ok": False, "error": type(e).__name__, "detail": str(e)}))
        return 1
    print(json.dumps({"ok": True, "report": _jsonable(report)}))
    return 0


def cmd_report(args) -> int:
    import ray

    if not ray.is_initialized():
        ncpu = os.environ.get("BALLET_RAY_NUM_CPUS")
        kw = {"num_cpus": int(ncpu)} if ncpu else {}
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", **kw)
    import ray.data as rd

    from ballet_ray.stages.report import corpus_report

    if getattr(args, "tokenizer", None):
        # evaluate a persisted fitted tokenizer instead of summarizing
        # the corpus (fertility / compression / UNK rate)
        from ballet_ray.stages.report import tokenizer_report
        from ballet_ray.state.persist import load_artifact

        rep = tokenizer_report(
            rd.read_parquet(args.input, columns=[args.id_col, args.text_col]),
            load_artifact(args.tokenizer),
            text_col=args.text_col,
            id_col=args.id_col,
        )
        print(json.dumps(_jsonable(rep)))
        return 0

    rep = corpus_report(
        rd.read_parquet(args.input),
        text_col=args.text_col,
        id_col=args.id_col,
        group_cols=tuple(args.group_cols.split(",")) if args.group_cols else (),
        top_words=args.top_words,
    )
    print(json.dumps(_jsonable(rep)))
    return 0


def cmd_export_tokenizer(args) -> int:
    """Persisted BPE artifact → GPT-2 two-file format (vocab.json +
    merges.txt) for interop with external tooling. No Ray session — the
    artifact is a driver-side file."""
    from ballet_ray.stages.tokenizer_io import (
        export_bpe_files,
        export_unigram_vocab,
        export_wordpiece_vocab,
    )
    from ballet_ray.stages.unigram import UnigramTokenizer
    from ballet_ray.stages.wordpiece import WordPieceTokenizer
    from ballet_ray.state.persist import load_artifact

    tok = load_artifact(args.artifact)
    try:
        if isinstance(tok, WordPieceTokenizer):
            path = export_wordpiece_vocab(tok, args.out_dir)
            print(json.dumps({"ok": True, "vocab": path}))
            return 0
        if isinstance(tok, UnigramTokenizer):
            path = export_unigram_vocab(tok, args.out_dir)
            print(json.dumps({"ok": True, "vocab": path}))
            return 0
        vpath, mpath = export_bpe_files(tok, args.out_dir)
    except (TypeError, ValueError) as e:
        print(json.dumps({"ok": False, "error": type(e).__name__, "detail": str(e)}))
        return 1
    print(json.dumps({"ok": True, "vocab": vpath, "merges": mpath}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ballet_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("report", help="sketch-backed corpus summary of a parquet table")
    r.add_argument("input", help="parquet file or directory")
    r.add_argument("--text-col", default="text")
    r.add_argument("--id-col", default="doc_id")
    r.add_argument("--group-cols", default="lang,source")
    r.add_argument("--top-words", type=int, default=10)
    r.add_argument("--tokenizer", default=None,
                   help="persisted fitted tokenizer artifact: print its "
                        "evaluation report (fertility/compression/UNK) "
                        "over the corpus instead of the corpus summary")
    r.set_defaults(fn=cmd_report)

    v = sub.add_parser("validate", help="validate project changes (reference `ballet validate`)")
    v.add_argument("config", help="python file or dotted module with get_config()/CONFIG")
    v.add_argument("--check-all", "-A", action="store_true", default=False)
    for flag, env in [
        ("check-project-structure", "BALLET_CHECK_PROJECT_STRUCTURE"),
        ("check-feature-api", "BALLET_CHECK_FEATURE_API"),
        ("evaluate-feature-acceptance", "BALLET_EVALUATE_FEATURE_ACCEPTANCE"),
        ("evaluate-feature-pruning", "BALLET_EVALUATE_FEATURE_PRUNING"),
    ]:
        dest = flag.replace("-", "_")
        v.add_argument(f"--{flag}", dest=dest, action="store_true", default=_env_flag(env))
        v.add_argument(f"--no-{flag}", dest=dest, action="store_false")
    v.set_defaults(fn=cmd_validate)

    x = sub.add_parser("export-tokenizer",
                       help="persisted tokenizer artifact → published format: "
                            "BPE families write vocab.json + merges.txt "
                            "(GPT-2), WordPiece writes vocab.txt (BERT), "
                            "Unigram writes unigram.vocab (SentencePiece "
                            "piece<TAB>logprob)")
    x.add_argument("artifact", help="persisted fitted tokenizer artifact (.pkl)")
    x.add_argument("out_dir")
    x.set_defaults(fn=cmd_export_tokenizer)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
