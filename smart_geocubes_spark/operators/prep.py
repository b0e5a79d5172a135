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
from smart_geocubes_spark.operators.geoparse import _GEO_URL_RE as _GEO_URL_PATTERN
from smart_geocubes_spark.text.extract import extract_text

# compiled from the SHARED pattern (operators/geoparse.py): the fused
# prep kernel must parse exactly what the unfused geoparse path parses
_GEO_URL_RE = re.compile(_GEO_URL_PATTERN)

PREP_SCHEMA = (
    "page_id long, text_len long, lat double, lon double, cell12 long, warc_epoch long"
)


def _prep_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        ext = b["url"].str.extract(_GEO_URL_RE)
        lat = pd.to_numeric(ext[0], errors="coerce").to_numpy(dtype=np.float64) / 1e5
        lon = pd.to_numeric(ext[1], errors="coerce").to_numpy(dtype=np.float64) / 1e5
        has = ~np.isnan(lat) & ~np.isnan(lon)
        # subset FIRST: the kernel drops no-geo rows, and extract_text
        # (HTML parse per page) dominates the batch cost — running it
        # on rows that are discarded one line later is pure waste on
        # mostly-no-geo corpora
        keep = np.flatnonzero(has)
        html_kept = b["html"].iloc[keep]
        text_len = np.fromiter(
            (len(extract_text(h)) for h in html_kept), dtype=np.int64, count=len(keep)
        )
        lat_k, lon_k = lat[keep], lon[keep]
        yield pd.DataFrame(
            {
                "page_id": b["page_id"].to_numpy()[keep],
                "text_len": text_len,
                "lat": lat_k,
                "lon": lon_k,
                "cell12": cell_encode(lon_k, lat_k, 12),
                "warc_epoch": b["warc_epoch"].to_numpy()[keep],
            }
        )


def prep_pages(pages: DataFrame) -> DataFrame:
    """pages (page_id, url, html, warc_epoch) -> geoparsed+encoded
    points in one fused Arrow pass; drops no-geo rows."""
    return pages.select("page_id", "url", "html", "warc_epoch").mapInPandas(
        _prep_batches, schema=PREP_SCHEMA
    )
