"""Structured-Streaming image pipeline: the decode/verify operator
(`operators/images.py:decode_stats`) run as a stream.

The decode stage is a stateless Arrow-batched map, so the exact same
`mapInPandas` plan attaches to a `readStream` source unchanged — this
is the ingest shape of a production multimodal pipeline (images land
in object storage, the stream decodes/verifies/fingerprints as files
arrive, no state, trivially scales with executors). `availableNow`
over a static fixture directory gives batch/stream parity: the result
must equal the batch operator row-for-row, which is exactly what the
gate's golden oracle (`golden.decode_stats_oracle`) checks.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from osm2shp_spark.operators.images import decode_stats
from osm2shp_spark.sources.fixtures import IMAGE_SCHEMA, image_table


def stream_decode_stats(
    spark: SparkSession, n_images: int, name: str = "img_stream_out"
) -> DataFrame:
    """Materialize the fixture table as a parquet 'landing zone', then
    drive the decode/verify operator over it as a stream (availableNow
    → memory sink). Returns the collected sink table."""
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "images")
        image_table(spark, n_images).write.parquet(src)
        stream = spark.readStream.schema(IMAGE_SCHEMA).parquet(src)
        out = decode_stats(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(d, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
