"""Physical-plan regression tests: the plans we designed for must stay
the plans Catalyst picks (broadcast hash join — never nested loop — on
the spatial join; parquet filter pushdown on cube reads; map-side
partial aggregation; whole-stage codegen on the JVM paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spatial_join_is_broadcast_hash(spark):
    from smart_geocubes_spark.queries import q_spatial_join_pip

    plan = plan_of(q_spatial_join_pip(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cube_load_pushes_tile_filter_to_parquet(spark, tmp_path):
    from smart_geocubes_spark.plans.materialize import (
        CubeSpec,
        create_cube,
        load,
        materialize,
    )
    from tests.test_materialize import ROI_A, SMALL_GRID

    path = str(tmp_path / "cube")
    create_cube(path, CubeSpec(grid=SMALL_GRID, channels=("dem",), time_epochs=None))
    materialize(spark, path, ROI_A)
    plan = plan_of(load(spark, path, ROI_A))
    assert "PushedFilters" in plan and "tile_id" in plan.split("PushedFilters", 1)[1][:200]


def test_partial_aggregation_and_codegen(spark):
    from smart_geocubes_spark.queries import q_pricing_summary

    df = q_pricing_summary(spark, SF)
    plan = plan_of(df)
    assert "partial_" in plan  # map-side combine before the exchange
    df.collect()  # finalize AQE so codegen stages are labeled
    final = plan_of(df)
    assert "isFinalPlan=true" in final
    assert "*(" in final  # WholeStageCodegen stage markers


def test_tile_assign_stays_jvm_side(spark):
    """The native tile-assignment path must not contain any Python eval
    between the geoparse UDF and the aggregation (floor math is columnar)."""
    from smart_geocubes_spark.operators.tiles import with_tiles_native
    from smart_geocubes_spark.sources.synth import GRID, pages_df

    pts = pages_df(spark, SF).selectExpr(
        "page_id", "lat_e5 / 100000.0 AS lat", "lon_e5 / 100000.0 AS lon"
    )
    df = with_tiles_native(pts, GRID).groupBy("tile_id").count()
    plan = plan_of(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_range_join_is_hash_not_nlj(spark):
    from smart_geocubes_spark.queries import q_range_join_time

    plan = plan_of(q_range_join_time(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prep_pipeline_single_python_node(spark):
    """The fused prep kernel must appear as exactly one Python eval node."""
    from smart_geocubes_spark.operators.prep import prep_pages
    from smart_geocubes_spark.sources.synth import pages_df

    df = prep_pages(pages_df(spark, SF).select("page_id", "url", "html", "warc_epoch"))
    plan = plan_of(df.groupBy("cell12").count())
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan
