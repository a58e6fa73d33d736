"""Interactive client facade — reference ``ballet.client.Client``
(ballet/client.py:35-117): convenience wrappers over the engine for
notebook-style use: validate a feature's API, check acceptance, discover
feature statistics, and run the full engineer-features path.
"""

from __future__ import annotations

from typing import Any

from ballet_ray.feature import Feature
from ballet_ray.pipelines.engineer import EngineerFeaturesResult, engineer_features
from ballet_ray.validation.accepters import GFSSFAccepter
from ballet_ray.validation.discover import discover as _discover
from ballet_ray.validation.feature_checks import check_feature_api


class Client:
    """b = Client(); b.validate_feature_api(feature, ds) ..."""

    def validate_feature_api(self, feature: Feature, ds, verbose: bool = False) -> bool:
        """Run the 15 feature-API conformance checks; True iff all pass
        (reference Client.validate_feature_api, ballet/client.py:71-82)."""
        results = check_feature_api(feature, ds)
        if verbose:
            for name, ok, advice in results:
                print(f"{'PASS' if ok else 'FAIL'} {name}" + (f" — {advice}" if advice else ""))
        return all(ok for _, ok, _ in results)

    def validate_feature_acceptance(
        self, feature: Feature, accepted: list[Feature], ds, y_col: str, *, sample_cap: int = 2000
    ) -> bool:
        """GFSSF acceptance judgement on a driver-side sample (reference
        Client.validate_feature_acceptance)."""
        from ballet_ray.validation.discover import (
            _feature_values_sample,
            _target_values_sample,
        )

        candidate = _feature_values_sample(feature, ds, sample_cap)
        accepted_map = {
            (f.name or str(i)): _feature_values_sample(f, ds, sample_cap)
            for i, f in enumerate(accepted)
        }
        # same hash-priority sample rows as the features — limit() was a
        # block PREFIX, biased on time/source-sorted data
        y = _target_values_sample(ds, y_col, sample_cap)
        n = min(len(candidate), len(y))
        return GFSSFAccepter().judge(
            candidate[:n], {k: v[:n] for k, v in accepted_map.items()}, y[:n]
        )

    def discover(self, features: list[Feature], ds, y_col: str | None = None, **kw) -> Any:
        """Per-feature summary statistics table (reference Client.discover,
        ballet/client.py:100-117)."""
        return _discover(features, ds, y_col=y_col, **kw)

    def engineer_features(self, features: list[Feature], ds, **kw) -> EngineerFeaturesResult:
        return engineer_features(features, ds, **kw)


b = Client()
