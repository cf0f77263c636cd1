"""Backend-comparison fan-out (SURVEY §2.5 P9).

The reference's comparison mode sends the same document to every backend and
aggregates ``{backend: result}`` side-by-side (reference:
web-client/src/App.jsx:264-304; summary min/max 846-882). The batch analog:
cross every document with every backend, extract, then pivot per document —
``groupBy(doc_id).pivot("backend")`` — for the side-by-side view. This is
also the repo's own differential-correctness fixture pattern (SURVEY §5).

The fan-out builds each backend's payload form for the document (the
reference uploads the same *file*; our arms consume different payload
encodings, so comparison mode synthesizes both well-formed encodings from
the ground-truth text — no malformed truncation, mirroring the reference's
comparison UI which only submits valid files).

The "fastest/slowest backend" summary is wall-clock-based and
non-deterministic by construction (SURVEY §7.3 item 3) — excluded.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ocr_project_spark.contract import VALID_BACKENDS
from ocr_project_spark.datagen import build_html, build_pagedoc
from ocr_project_spark.kernels.registry import BACKEND_REGISTRY


def _fanout_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            doc_id = int(doc_id)
            payloads = {
                "deepseek-ocr": build_html(doc_id, text, lang),
                "mineru": build_pagedoc(doc_id, text, lang),
            }
            for backend in VALID_BACKENDS:
                res = BACKEND_REGISTRY[backend](payloads[backend].encode("utf-8"))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "truth": text,
                        "backend": backend,
                        "success": res.success,
                        "text": res.text,
                    }
                )
        yield pd.DataFrame(
            rows, columns=["doc_id", "truth", "backend", "success", "text"]
        )


def compare_backends(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang) → one row per doc with per-backend
    extracted text side-by-side plus agreement flags.

    Output: (doc_id, texts_agree, matches_truth). The fan-out is a narrow
    1→N_backends map; the pivot is one hash aggregation on doc_id.
    """
    fanned = docs.select("doc_id", "text", "lang").mapInPandas(
        _fanout_batches,
        schema="doc_id long, truth string, backend string, success boolean, text string",
    )
    side_by_side = (
        fanned.groupBy("doc_id", "truth")
        .pivot("backend", list(VALID_BACKENDS))
        .agg(F.first("text"))
    )
    a, b = [F.col(f"`{name}`") for name in VALID_BACKENDS]
    return side_by_side.select(
        "doc_id",
        (a == b).alias("texts_agree"),
        ((a == F.col("truth")) & (b == F.col("truth"))).alias("matches_truth"),
    )
