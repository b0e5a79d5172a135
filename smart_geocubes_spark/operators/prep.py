"""Fused page-prep kernel: ONE Python hop per batch.

Chaining separate pandas UDFs (extract_text -> geoparse -> cell encode)
creates one ArrowEvalPython node — i.e. one Python worker + one Arrow
round trip — per UDF per task (observed: 4 chained nodes = 128 worker
processes at local[32], 6x slowdown). For the hot path the engine fuses
the whole per-page kernel into a single ``mapInPandas``: html -> text,
url -> lat/lon, lon/lat -> Morton cell, all inside one Arrow batch
visit. The individual operators remain available for composition and
for per-operator oracle checks; this is the physical fusion the
reference gets for free inside one thread (``download_patch`` does all
per-patch work in one call, ``core/backend.py:274-293``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from smart_geocubes_spark.geo.cells import cell_encode
from smart_geocubes_spark.text.extract import extract_text

_GEO_URL_RE = re.compile(r"/geo/(-?\d+),(-?\d+)/")

PREP_SCHEMA = (
    "page_id long, text_len long, lat double, lon double, cell12 long, warc_epoch long"
)


def _prep_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        ext = b["url"].str.extract(_GEO_URL_RE)
        lat = pd.to_numeric(ext[0], errors="coerce").to_numpy(dtype=np.float64) / 1e5
        lon = pd.to_numeric(ext[1], errors="coerce").to_numpy(dtype=np.float64) / 1e5
        has = ~np.isnan(lat) & ~np.isnan(lon)
        text_len = np.fromiter(
            (len(extract_text(h)) for h in b["html"]), dtype=np.int64, count=len(b)
        )
        out = pd.DataFrame(
            {
                "page_id": b["page_id"].to_numpy(),
                "text_len": text_len,
                "lat": lat,
                "lon": lon,
                "cell12": np.where(has, cell_encode(np.nan_to_num(lon), np.nan_to_num(lat), 12), -1),
                "warc_epoch": b["warc_epoch"].to_numpy(),
            }
        )
        yield out[has]


def prep_pages(pages: DataFrame) -> DataFrame:
    """pages (page_id, url, html, warc_epoch) -> geoparsed+encoded
    points in one fused Arrow pass; drops no-geo rows."""
    return pages.select("page_id", "url", "html", "warc_epoch").mapInPandas(
        _prep_batches, schema=PREP_SCHEMA
    )
