"""Fused URL-preparation kernel: canonicalize + host + PLD + murmur3 keys
in ONE mapInPandas pass.

Chaining separate pandas UDFs costs one JVM<->Python Arrow round trip per
UDF (Spark plans each as its own Python runner). The frontier hot path does
five of them per URL; fusing into a single mapInPandas cut the prepare
phase ~4x in bench.py. Semantics are identical to composing the individual
functions (property-tested in tests/test_urls.py::test_fused_prepare)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from jirlbot_spark.functions.hashing import murmur3_64_series
from jirlbot_spark.functions.urls import (
    canonicalize_series,
    host_of_series,
    pld_series,
)

PREPARED_FIELDS = [
    StructField("url", StringType()),
    StructField("url_hash", LongType()),
    StructField("host", StringType()),
    StructField("host_hash", LongType()),
    StructField("pld", StringType()),
    StructField("pld_hash", LongType()),
]


def prepare_frame(
    pdf: pd.DataFrame, url_col: str, base_col: str | None
) -> pd.DataFrame:
    """Pandas-level kernel: one batch in, prepared batch out (invalid URLs
    dropped). Keeps every input column except url/base."""
    bases = pdf[base_col] if base_col else None
    canon = canonicalize_series(pdf[url_col], bases)
    keep = pdf.drop(
        columns=[c for c in (url_col, base_col) if c]
    )
    ok = canon.notna()
    canon = canon[ok]
    keep = keep[ok]
    host = host_of_series(canon)
    pld = pld_series(host)
    out = pd.DataFrame(
        {
            "url": canon.astype("object"),
            "url_hash": murmur3_64_series(canon),
            "host": host.astype("object"),
            "host_hash": murmur3_64_series(host),
            "pld": pld.astype("object"),
            "pld_hash": murmur3_64_series(pld),
        },
        index=canon.index,
    )
    return pd.concat([out, keep], axis=1)


def prepare_urls_fused(
    df: DataFrame,
    url_col: str = "url",
    base_col: str | None = None,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Spark surface: url (+base) + keep columns -> prepared frontier cols
    (url, url_hash, host, host_hash, pld, pld_hash) + keep columns."""
    in_cols = [url_col] + ([base_col] if base_col else []) + list(keep)
    src = df.select(*in_cols)
    keep_fields = [f for f in src.schema.fields if f.name in keep]
    schema = StructType(PREPARED_FIELDS + keep_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield prepare_frame(pdf, url_col, base_col)

    return src.mapInPandas(run, schema=schema)
