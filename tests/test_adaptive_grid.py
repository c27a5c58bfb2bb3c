"""Adaptive grid maintenance over a stream: density accumulates, maps
rebuild per interval, partition ids stay Hungarian-stable (the DIP loop)."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_spatial_index_spark.functions.cells import morton_np
from distributed_spatial_index_spark.functions import geo_derive as gd
from distributed_spatial_index_spark.streaming.adaptive_grid import (
    AdaptiveGridMaintainer,
)

BITS = 6


def _batch(spark, lo, hi, shift_x=0.0):
    return spark.range(lo, hi).select(
        (gd.derive_x_col(F.col("id")) * 0.5 + shift_x).alias("x"),
        (gd.derive_y_col(F.col("id")) * 0.5).alias("y"),
    )


def test_adaptive_maintainer_direct(spark):
    m = AdaptiveGridMaintainer(num_partitions=8, bits=BITS, rebuild_every=1)
    for i in range(4):
        # hotspot drifts right over time
        m.on_batch(_batch(spark, i * 5000, (i + 1) * 5000, shift_x=i * 800.0), i)
    assert len(m.history) == 4
    assert m.history[0]["migration_fraction"] == 1.0  # bootstrap
    for h in m.history[1:]:
        # Hungarian relabeling bounds churn even as the hotspot drifts and
        # boundaries genuinely move (12-13 leaves over 8 partitions)
        assert h["migration_fraction"] < 0.6, m.history
    assert m.history[-1]["total_density"] == 20000
    # the current map is a valid partition function over all cells
    n = 1 << BITS
    cx, cy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    pids = m.current.partition_of_cells(morton_np(cx.ravel(), cy.ravel(), BITS))
    assert pids.min() >= 0 and pids.max() < 8


def test_adaptive_maintainer_foreachbatch_wiring(spark):
    """The on_batch hook drives from a real Structured Streaming query."""
    with tempfile.TemporaryDirectory() as d:
        full = _batch(spark, 0, 6000)
        pdf = full.toPandas()
        for i in range(3):
            spark.createDataFrame(pdf.iloc[i * 2000:(i + 1) * 2000]).coalesce(1)\
                .write.mode("overwrite").parquet(f"{d}/c{i}")
        stream = spark.readStream.schema(full.schema).option(
            "maxFilesPerTrigger", 1).parquet(f"{d}/c*/")
        m = AdaptiveGridMaintainer(num_partitions=4, bits=BITS, rebuild_every=1)
        q = stream.writeStream.foreachBatch(m.on_batch).trigger(
            availableNow=True).start()
        q.awaitTermination(120)
    assert len(m.history) == 3
    assert m.history[-1]["total_density"] == 6000