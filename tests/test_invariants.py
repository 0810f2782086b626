"""Structural invariants (validate() analog, validation.hpp:49-70) and the
driver's per-row span-sequence invariant: every engine output row must map
back to a source document whose (kind, text, media_ref, order) sequence is
unchanged."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pkd_tree_spark import fixtures as FX
from pkd_tree_spark.documents import extract_points, synth_documents
from pkd_tree_spark.ranges import range_report_boxes
from tests.conftest import SF_DIR


def test_index_invariants(index_uniform):
    v = index_uniform.validate()
    assert v["meta_sum"] == v["n_points"]        # sum of cell counts == table count
    assert v["bbox_violations"] == 0             # every point inside its cell bounds


def test_varden_index_invariants(index_varden):
    v = index_varden.validate()
    assert v["meta_sum"] == v["n_points"]
    assert v["bbox_violations"] == 0


def test_every_doc_has_exactly_one_geo_span(docs_uniform):
    bad = docs_uniform.select(
        F.size(F.filter("spans", lambda s: s.kind == "geo")).alias("n")
    ).where(F.col("n") != 1)
    assert bad.count() == 0


def test_span_offsets_are_sequential(docs_uniform):
    bad = docs_uniform.select(
        F.exists(
            F.zip_with("spans", F.sequence(F.lit(0), F.size("spans") - 1), lambda s, i: s.offset != i),
            lambda x: x,
        ).alias("bad")
    ).where("bad")
    assert bad.count() == 0


def test_report_output_preserves_span_sequence(spark, index_uniform, docs_uniform):
    """Join a query output back to documents: the span sequence
    (kind, text, media_ref, order) of every reported doc must equal the
    source's — the north-rule per-row invariant."""
    report = range_report_boxes(index_uniform, FX.box_fixtures(4, 2))
    src = docs_uniform.select("doc_id", F.to_json("spans").alias("seq"))
    joined = report.select("doc_id").distinct().join(src, "doc_id", "left")
    assert joined.where(F.col("seq").isNull()).count() == 0
    # regenerate documents independently and compare sequences exactly
    regen = synth_documents(spark, SF_DIR, dims=2, dist="uniform").select(
        "doc_id", F.to_json("spans").alias("seq2")
    )
    diff = joined.join(regen, "doc_id").where(F.col("seq") != F.col("seq2"))
    assert diff.count() == 0


def test_extraction_matches_geo_span_text(spark, docs_uniform):
    """Extracted coords must equal the geo span's text parsed back."""
    pts = extract_points(docs_uniform, dims=2)
    geo = docs_uniform.select(
        "doc_id",
        F.element_at(F.filter("spans", lambda s: s.kind == "geo"), 1).alias("g"),
    ).select("doc_id", F.split("g.text", " ").alias("parts"))
    j = pts.join(geo, "doc_id")
    bad = j.where(
        (F.element_at("parts", 1).cast("long") != F.col("x0"))
        | (F.element_at("parts", 2).cast("long") != F.col("x1"))
    )
    assert bad.count() == 0


def test_duplicate_documents_fixture():
    """Dummy-leaf analog: an all-duplicates input collapses to one cell but
    keeps multiset counts (build_tree.hpp:183-186)."""
    import pandas as pd
    from pkd_tree_spark.config import EngineConfig
    from pkd_tree_spark.index import SpatialIndex
    from pkd_tree_spark.session import get_spark

    spark = get_spark(app="pkd-tests", cpus=8)
    pts = pd.DataFrame(
        {
            "doc_id": [f"dup_{i}" for i in range(1000)],
            "span_idx": [0] * 1000,
            "key": list(range(1000)),
            "x0": [123_456] * 1000,
            "x1": [654_321] * 1000,
        }
    )
    cfg = EngineConfig(dims=2, index_level=5, knn_level=4, partitions=4)
    idx = SpatialIndex.build(spark.createDataFrame(pts), cfg)
    v = idx.validate()
    assert v["n_points"] == 1000 and v["meta_sum"] == 1000 and v["n_cells"] == 1
