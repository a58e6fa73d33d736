"""Reference-compatible namespace: ``ballet.eng`` names → this engine's
transforms, so a user of the reference can keep their imports
(``from ballet.eng import SingleLagger`` → ``from ballet_ray.eng import
SingleLagger``). Pure aliasing — every target is the native Ray-Data
implementation documented in its own module; exports mirror the
reference's ``ballet/eng/__init__.py`` ``__all__`` exactly.
"""

from __future__ import annotations

from ballet_ray.stages.conditional import (
    ConditionalTransform as ConditionalTransformer,
    NamedFramer,
    SubsetTransform as SubsetTransformer,
)
from ballet_ray.stages.core import (
    ColumnSelector,
    IdentityTransform as IdentityTransformer,
    NullFiller,
    NullIndicator,
    NullTransform as NullTransformer,
    ValueReplacer,
)
from ballet_ray.stages.encoders import (
    BoxCoxTransform as BoxCoxTransformer,
    ComputedValueTransform as ComputedValueTransformer,
)
from ballet_ray.stages.groupwise import (
    GroupedFunctionTransform as GroupedFunctionTransformer,
    GroupwiseTransform as GroupwiseTransformer,
)
from ballet_ray.stages.windows import (
    FFill as LagImputer,
    Lag as SingleLagger,
    MultiLag,
)
from ballet_ray.transformer import (
    RobustFunctionTransform as SimpleFunctionTransformer,
    Transform as BaseTransformer,
)


class NoFitMixin:
    """fit is a no-op (reference ballet/eng/base.py NoFitMixin)."""

    def fit(self, X, y=None, **kwargs):
        return self


def make_multi_lagger(lags, key, order_by=None) -> MultiLag:
    """Reference factory (ballet/eng/ts.py:25-41): several lags in one
    keyed pass."""
    return MultiLag(list(lags), key, order_by)


__all__ = [
    "BaseTransformer",
    "BoxCoxTransformer",
    "ColumnSelector",
    "ComputedValueTransformer",
    "ConditionalTransformer",
    "GroupedFunctionTransformer",
    "GroupwiseTransformer",
    "IdentityTransformer",
    "LagImputer",
    "NamedFramer",
    "NoFitMixin",
    "NullFiller",
    "NullIndicator",
    "NullTransformer",
    "SimpleFunctionTransformer",
    "SingleLagger",
    "SubsetTransformer",
    "ValueReplacer",
    "make_multi_lagger",
]
