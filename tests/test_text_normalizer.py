"""TextNormalizer: NFC + case + whitespace/control normalization."""

import unicodedata

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ballet_ray.feature import Feature
from ballet_ray.pipeline import FeatureEngineeringPipeline
from ballet_ray.stages.text import TextNormalizer


def _norm(vals, **kw):
    t = pa.table({"x": pa.array(vals, type=pa.string())})
    return TextNormalizer(**kw).transform_table(t, ["x"]).column("x_norm").to_pylist()


def test_nfc_composes_decomposed_accents():
    decomposed = "Café"  # e + combining acute
    composed = unicodedata.normalize("NFC", decomposed)
    assert _norm([decomposed]) == [composed.lower()]
    # composed input is untouched (idempotent)
    assert _norm([composed]) == [composed.lower()]


def test_ascii_fast_path_and_whitespace():
    got = _norm(["  Hello\t\tWORLD  ", "a \x01b\x07c"])
    assert got == ["hello world", "a bc"]


def test_lower_off_and_null():
    got = _norm(["MiXeD  Case", None], lower=False)
    assert got == ["MiXeD Case", None]


def test_newlines_survive():
    # control-strip spares \n; horizontal runs collapse per segment
    assert _norm(["a  b\nc\td"]) == ["a b\nc d"]


def test_pipeline_multiblock(ray_session):
    df = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(100)],
        "x": [f"  Word{i}́  TAIL " for i in range(100)],
    })
    pipe = FeatureEngineeringPipeline([Feature("x", TextNormalizer())])
    out = pipe.fit_transform(rd.from_pandas(df).repartition(8)).to_pandas()
    assert len(out) == 100
    v = out.set_index("doc_id").loc["d7", "x_norm"]
    assert v == unicodedata.normalize("NFC", "word7́ tail")
