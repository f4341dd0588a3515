"""Image metadata scrubbing operator — Spark plumbing for
functions/image_meta.py (byte-level PNG/JPEG/GIF container walks; see
that module for the pinned per-format allow-list policy).

Physical shape at 10^10 rows: one mapInPandas pass, Arrow-batched, no
shuffle — the scrub is a per-row byte transform that fuses into
whatever stage already materializes the payload (fetch, verify, or
export). Rows whose container fails to parse are reported
(scrub_ok=false, original bytes passed through) rather than failing the
batch — the decode-bomb/corruption posture for untrusted crawl bytes;
the caller decides whether to quarantine them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["scrub_image_metadata"]

_SCRUB_EXTRA = [
    StructField("clean_bytes", BinaryType(), True),
    StructField("orig_len", LongType(), False),
    StructField("clean_len", LongType(), False),
    StructField("n_stripped", IntegerType(), False),
    StructField("supported", BooleanType(), False),
    StructField("scrub_ok", BooleanType(), False),
]


def scrub_image_metadata(
    df: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_cols: tuple[str, ...] = ("image_id",),
) -> DataFrame:
    """id columns + (clean_bytes, orig_len, clean_len, n_stripped,
    supported, scrub_ok) per row. clean_bytes carries the original
    payload when the format is unsupported or the walk fails."""
    from jirlbot_spark.functions.image_meta import strip_metadata

    # keep MUST be in id_cols order (not schema order): row tuples below
    # are built in id_cols order, and two same-typed id columns passed in
    # a different order than the schema would otherwise swap silently
    keep = [df.schema[c] for c in id_cols]
    out_schema = StructType(keep + _SCRUB_EXTRA)
    # id_cols may include fmt_col itself — select each column once
    cols = list(dict.fromkeys([*id_cols, bytes_col, fmt_col]))
    id_idx = [cols.index(c) for c in id_cols]
    b_idx, f_idx = cols.index(bytes_col), cols.index(fmt_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf[cols].itertuples(index=False):
                ids = tuple(t[i] for i in id_idx)
                raw, fmt = t[b_idx], t[f_idx]
                raw = bytes(raw)
                try:
                    clean, n, sup = strip_metadata(raw, fmt)
                    ok = True
                except ValueError:
                    clean, n, sup, ok = raw, 0, True, False
                rows.append(
                    (*ids, clean, len(raw), len(clean), n, sup, ok)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.select(cols).mapInPandas(run, schema=out_schema)
