"""Content-defined chunking (CDC) — edit-stable chunk boundaries.

Fixed-offset chunking (``q_x1_chunk_docs``) moves EVERY boundary when a
single byte is inserted upstream, so chunk-level dedup between two corpus
versions finds nothing. CDC places boundaries where a rolling hash of the
local content hits a condition (Rabin-fingerprint family; public — e.g.
Muthitacharoen et al., "A Low-Bandwidth Network File System", SOSP'01), so
an edit only perturbs boundaries inside its own neighborhood and identical
tails re-chunk identically — the property chunk-level dedup and delta
storage depend on.

Spark shape: one Arrow-batched ``mapInPandas`` over documents (the rolling
hash is inherently per-byte sequential work — the sanctioned Python escape
hatch), map-only, no shuffle; numpy computes all window hashes in O(w)
vectorized passes, and only the boundary *selection* (a few dozen positions
per document) runs as a Python loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Rolling-hash window width (bytes) and polynomial base/modulus.
_WINDOW = 8
_BASE = 257
_MOD = (1 << 31) - 1  # Mersenne prime — cheap reduction, no sign issues

CDC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_id", T.LongType()),
        T.StructField("chunk", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _window_hashes(data: bytes):
    """Hash of every ``_WINDOW``-byte window, vectorized: O(_WINDOW) numpy
    passes instead of an O(n * _WINDOW) Python loop."""
    import numpy as np

    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    n = len(b) - _WINDOW + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    h = np.zeros(n, dtype=np.int64)
    p = 1
    for j in range(_WINDOW):
        h = (h + b[j : j + n] * p) % _MOD
        p = (p * _BASE) % _MOD
    return h


def _boundaries(data: bytes, avg_size: int, min_size: int, max_size: int) -> list[int]:
    """Boundary offsets (exclusive chunk ends) for one document.

    A position is a CANDIDATE boundary when its window hash ``% avg_size``
    equals ``avg_size - 1`` (expected gap = avg_size); min/max bounds are
    enforced by a scan over candidates only. The final byte is always a
    boundary."""
    n = len(data)
    if n == 0:
        return [0]
    h = _window_hashes(data)
    candidates = (h % avg_size) == (avg_size - 1)
    out = []
    last = 0
    i = 0
    while i < len(candidates):
        end = i + _WINDOW  # boundary AFTER the window that matched
        if candidates[i] and end - last >= min_size:
            out.append(end)
            last = end
            i = end  # windows overlapping the cut can't re-fire
            continue
        if end - last >= max_size:
            out.append(end)
            last = end
            i = end
            continue
        i += 1
    if last < n:
        out.append(n)
    return out


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    avg_size: int = 64,
    min_size: int = 16,
    max_size: int = 192,
) -> DataFrame:
    """Split every document into content-defined chunks.

    Output: ``(doc_id, chunk_id, chunk, n_bytes)`` where chunks concatenate
    byte-exactly back to the document (lossless; property-tested) and
    boundaries are a pure function of local content — inserting a prefix
    shifts only the first chunk(s), identical suffixes re-chunk identically.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                data = (text or "").encode("utf-8")
                prev = 0
                for k, end in enumerate(_boundaries(data, avg_size, min_size, max_size)):
                    piece = data[prev:end]
                    rows.append(
                        {
                            "doc_id": int(did),
                            "chunk_id": k,
                            "chunk": piece.decode("utf-8", errors="surrogateescape"),
                            "n_bytes": len(piece),
                        }
                    )
                    prev = end
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_id", "chunk", "n_bytes"]
            )

    return docs.select(id_col, text_col).mapInPandas(run, CDC_SCHEMA)
