"""Feature acceptance / pruning policies — the reference's validation-side
"query" workload (SURVEY.md §2.5), re-expressed for Ray.

Distributed parts (variance, moments) run as Dataset aggregates; the
information-theoretic kernels run on driver-side samples (as in the
reference, which subsamples anyway). Semantics mirrored from
ballet/validation/feature_acceptance/validator.py and
ballet/validation/gfssf.py (GFSSF: Li, Wu, Li & Ding, "Group Feature
Selection with Streaming Features", ICDM 2013):

- GFSSF accepter = lines 1–8: accept candidate x if for some omitted
  feature f, I(x; y | Z∖{x,f}) − I(f; y | Z∖{x,f}) ≥ λ₁ + λ₂·(cols(x) −
  cols(f));
- GFSSF pruner = lines 12–13: prune accepted f when I(f; y | Z∖f) <
  λ₁ + λ₂·cols(f);
- λᵢ default to H(y)/64, then λ₁ /= #features, λ₂ /= #feature-columns
  (ballet/validation/gfssf.py:36-59,110-125).
"""

from __future__ import annotations

import random

import numpy as np

from ballet_ray.validation.entropy import (
    asarray2d,
    estimate_conditional_information,
    estimate_entropy,
    estimate_mutual_information,
)

RANDOM_STATE = 1754
LAMBDA_ADJUSTMENT = 64


class NeverAccepter:
    def judge(self, *a, **kw) -> bool:
        return False


class AlwaysAccepter:
    def judge(self, *a, **kw) -> bool:
        return True


class RandomAccepter:
    """Accept with probability p (seeded — reference RandomAccepter)."""

    def __init__(self, p: float = 0.3, seed: int = RANDOM_STATE):
        self.p = p
        self.seed = seed

    def judge(self, *a, **kw) -> bool:
        rng = random.Random(self.seed)
        return rng.uniform(0, 1) < self.p


class VarianceThresholdAccepter:
    """Accept iff every column's variance exceeds the threshold
    (reference :136-164). ``judge`` takes a numpy matrix or a Ray Dataset
    plus column names (variance then computed as a distributed aggregate,
    ddof=0 like np.var)."""

    def __init__(self, threshold: float = 0.05):
        self.threshold = threshold

    def judge(self, z, cols: list[str] | None = None) -> bool:
        if cols is not None:  # Ray Dataset path
            from ray.data.aggregate import Std

            row = z.aggregate(*[Std(c, ddof=0, alias_name=c) for c in cols])
            var = np.array([row[c] ** 2 for c in cols])
        else:
            var = np.var(asarray2d(z), axis=0)
        return bool(np.all(var - self.threshold > 0))


def _skipna_left(y: np.ndarray, z: np.ndarray):
    keep = ~np.isnan(y).any(axis=1)
    return y[keep], z[keep]


class MutualInformationAccepter:
    """Accept iff I(z; y) > threshold (reference :167-219); NaN targets
    either fail validation or are dropped row-wise."""

    def __init__(self, threshold: float = 0.05, handle_nan_targets: str = "fail"):
        self.threshold = threshold
        self.handle_nan_targets = handle_nan_targets

    def judge(self, z, y) -> bool:
        z, y = asarray2d(np.asarray(z, dtype=float)), asarray2d(np.asarray(y, dtype=float))
        if np.isnan(y).any():
            if self.handle_nan_targets == "fail":
                return False
            if self.handle_nan_targets == "ignore":
                y, z = _skipna_left(y, z)
            else:
                raise ValueError(self.handle_nan_targets)
        return estimate_mutual_information(z, y) - self.threshold > 0


class CompoundAccepter:
    """any/all combination of accepters (reference :222-274).

    Members may be instances OR config specs (``"pkg.mod.Class"`` strings /
    ``{"name": ..., "params": ...}`` dicts, resolved via ``load_spec`` —
    reference ballet/validation/common.py:295-309); mixed member signatures
    are handled by ``call_judge``'s name-based adaptation."""

    def __init__(self, accepters: list, agg: str = "all"):
        if agg not in ("any", "all"):
            raise ValueError(agg)
        resolved = []
        for a in accepters:
            if isinstance(a, (str, dict)):
                from ballet_ray.validation.spec import instantiate

                a = instantiate(a)
            resolved.append(a)
        self.accepters = resolved
        self.agg = agg

    def judge(self, *args, **kwargs) -> bool:
        results = [a.judge(*args, **kwargs) for a in self.accepters]
        return any(results) if self.agg == "any" else all(results)


def call_judge(accepter, *, candidate, accepted, y) -> bool:
    """Adapt the engine's kernel-shaped accepter signatures to one
    canonical call: candidate matrix, accepted {name: matrix}, target.
    Parameter names select what each accepter receives (``z``/
    ``candidate_df`` → candidate, ``y``/``y_val`` → target, ``accepted`` →
    the accepted dict); only default-less params are passed."""
    import inspect

    if isinstance(accepter, CompoundAccepter):
        results = [
            call_judge(a, candidate=candidate, accepted=accepted, y=y)
            for a in accepter.accepters
        ]
        return any(results) if accepter.agg == "any" else all(results)
    fn = accepter.judge
    params = list(inspect.signature(fn).parameters.values())
    if any(p.kind == p.VAR_POSITIONAL for p in params):
        return fn()
    aliases = {
        "z": candidate, "candidate": candidate, "candidate_df": candidate,
        "accepted": accepted, "y": y, "y_val": y,
    }
    kwargs = {
        p.name: aliases[p.name]
        for p in params
        if p.default is p.empty and p.name in aliases
    }
    return fn(**kwargs)


def _compute_lmbdas(l1: float, l2: float, feature_dfs: dict) -> tuple[float, float]:
    num_features = len(feature_dfs)
    num_cols = sum(asarray2d(v).shape[1] for v in feature_dfs.values())
    return l1 / max(num_features, 1), l2 / max(num_cols, 1)


def _concat_omitting(feature_dfs: dict, n_samples: int, omit: set) -> np.ndarray:
    mats = [asarray2d(v) for k, v in feature_dfs.items() if k not in omit]
    if not mats:
        return np.zeros((n_samples, 1))
    return np.concatenate(mats, axis=1)


class GFSSFAccepter:
    """Streaming-feature-selection accept (GFSSF lines 1–8).

    ``judge(candidate_df, accepted: dict[name, matrix], y_val)``.
    """

    def __init__(self, lmbda_1: float = 0.0, lmbda_2: float = 0.0,
                 lambda_1_adjustment: float = LAMBDA_ADJUSTMENT,
                 lambda_2_adjustment: float = LAMBDA_ADJUSTMENT):
        self.lmbda_1 = lmbda_1
        self.lmbda_2 = lmbda_2
        self.l1_adj = lambda_1_adjustment
        self.l2_adj = lambda_2_adjustment

    def _lambdas(self, y_val) -> tuple[float, float]:
        l1, l2 = self.lmbda_1, self.lmbda_2
        if l1 <= 0:
            l1 = estimate_entropy(y_val) / self.l1_adj
        if l2 <= 0:
            l2 = estimate_entropy(y_val) / self.l2_adj
        return l1, l2

    def judge(self, candidate_df, accepted: dict, y_val) -> bool:
        candidate_df = asarray2d(candidate_df)
        y_val = asarray2d(y_val)
        if np.isnan(y_val).any():
            raise ValueError("GFSSFAccepter does not support missing targets")
        n_samples, n_cand_cols = candidate_df.shape
        feature_dfs = {**accepted, "__candidate__": candidate_df}
        l1_raw, l2_raw = self._lambdas(y_val)
        l1, l2 = _compute_lmbdas(l1_raw, l2_raw, feature_dfs)
        for omitted in [None, *accepted.keys()]:
            z = _concat_omitting(feature_dfs, n_samples, {"__candidate__", omitted})
            cmi = estimate_conditional_information(candidate_df, y_val, z)
            if omitted is not None:
                omit_df = asarray2d(accepted[omitted])
                cmi_omit = estimate_conditional_information(omit_df, y_val, z)
                n_omit_cols = omit_df.shape[1]
            else:
                cmi_omit, n_omit_cols = 0.0, 0
            statistic = cmi - cmi_omit
            threshold = l1 + l2 * (n_cand_cols - n_omit_cols)
            if statistic - threshold >= 0:
                return True
        return False


class GFSSFPruner(GFSSFAccepter):
    """Prune redundant accepted features (GFSSF lines 12–13).

    ``prune(accepted: dict[name, matrix], y_val) -> list[name]``.
    """

    def prune(self, accepted: dict, y_val) -> list:
        y_val = asarray2d(y_val)
        if np.isnan(y_val).any():
            raise ValueError("GFSSFPruner does not support missing targets")
        feature_dfs = dict(accepted)
        l1_raw, l2_raw = self._lambdas(y_val)
        l1, l2 = _compute_lmbdas(l1_raw, l2_raw, feature_dfs)
        redundant = []
        for name in list(accepted.keys()):
            cand = asarray2d(feature_dfs[name])
            z = _concat_omitting(feature_dfs, cand.shape[0], {name})
            cmi = estimate_conditional_information(cand, y_val, z)
            threshold = l1 + l2 * cand.shape[1]
            if cmi < threshold:
                del feature_dfs[name]
                redundant.append(name)
        return redundant


class NoOpPruner:
    def prune(self, *a, **kw) -> list:
        return []


class RandomPruner:
    """Prune each feature with probability p (seeded)."""

    def __init__(self, p: float = 0.2, seed: int = RANDOM_STATE):
        self.p = p
        self.seed = seed

    def prune(self, accepted: dict, *a, **kw) -> list:
        rng = random.Random(self.seed)
        return [name for name in accepted if rng.uniform(0, 1) < self.p]
