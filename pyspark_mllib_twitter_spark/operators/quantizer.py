"""Shared vector-quantizer fit for every clustering-backed operator.

One Lloyd/k-means implementation serves the coarse quantizers (IVF,
IVF+PQ, SemDeDup semantic dedup — *spherical* mode: unit inputs, unit
centroids, assignment by max dot) and the PQ sub-space codebooks
(*euclidean* mode: plain squared-distance Lloyd on residual/sub-vectors).
Fixing a recall bug here fixes it in every ANN and dedup family at once.

Why driver-local numpy instead of MLlib KMeans: quantizer training never
needs the full corpus — centroids converge on a bounded sample (standard
ANN practice: train on ≤65k–256k vectors, then *encode* everything
distributed). On a sample that small an MLlib fit costs ~15
driver-scheduled jobs (k-means|| init + one job per Lloyd round) of pure
scheduling overhead — measured as the dominant cost of whole operators
(see ``dedup.semantic_dedup_pairs``). numpy Lloyd on the collected sample
finishes in milliseconds, and only the FIT is local: assignment/encoding
are codegen'd JVM expressions over broadcast centroid literals, so the
corpus itself never reaches the driver.

Spherical mode follows Dhillon & Modha, "Concept decompositions for large
sparse text data using clustering" (2001; public): centroids re-normalized
to unit length every round. Unit centroids matter downstream — the
distributed assignment is an argmax of dot products, which equals
nearest-centroid ONLY when all centroids share a norm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .sampling import hash_sample


def bounded_fit_sample(df: DataFrame, key_col: str, max_fit_rows: int) -> DataFrame:
    """Deterministic ≤ ``~max_fit_rows`` sample for quantizer training.

    md5-hash keyed (engine-portable, seedless, reproducible across runs and
    cluster sizes); granularity is 1/16, so the realized size is within ~2×
    of the target — irrelevant for quantizer quality. Fitting on the full
    corpus would be the difference between an O(sample) constant cost and an
    O(corpus × iterations) job at 100 TB."""
    n = df.count()
    if n <= max_fit_rows:
        return df
    rate = max(1, min(16, (16 * max_fit_rows) // n))
    return hash_sample(df, key_col, rate)


def lloyd(x, k: int, seed: int = 42, iters: int = 8, spherical: bool = False):
    """k centroids of the in-memory sample ``x`` (2-D array-like) by Lloyd
    iteration; deterministic for a given ``seed`` (seeded-RNG choice of k
    distinct start points). Returns a ``(k, dim)`` float64 ndarray —
    unit-norm rows when ``spherical``."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    k = min(k, len(x))
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        if spherical:
            # unit inputs and centroids: max cosine == max dot
            labels = (x @ cents.T).argmax(axis=1)
        else:
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            labels = d2.argmin(axis=1)
        for j in range(k):
            members = x[labels == j]
            if len(members):
                m = members.mean(axis=0)
                if spherical:
                    n = np.linalg.norm(m)
                    if n > 0:
                        cents[j] = m / n
                else:
                    cents[j] = m
            # empty cluster: keep the previous centroid (stable, no respawn)
    return cents


def fit_centroids(
    df: DataFrame,
    key_col: str,
    arr_col: str,
    k: int,
    seed: int = 42,
    iters: int = 8,
    spherical: bool = True,
    max_fit_rows: int = 65536,
) -> list[list[float]]:
    """Bounded-sample collect + :func:`lloyd`; returns plain float lists
    ready to broadcast as literals. Empty input → empty list."""
    sample = [
        r[0]
        for r in bounded_fit_sample(df, key_col, max_fit_rows)
        .select(arr_col)
        .collect()
    ]
    if not sample:
        return []
    cents = lloyd(sample, k, seed=seed, iters=iters, spherical=spherical)
    return [[float(v) for v in c] for c in cents]


def nearest_centroid_udf(centroids: list[list[float]], spherical: bool = True):
    """Arrow-batched nearest-centroid id (0-based) for an ``array<double>``
    column.

    Why a pandas UDF and not a zip_with/aggregate expression: Catalyst
    evaluates higher-order-function lambdas INTERPRETED, per element — k
    centroids × d dims is k·d lambda evaluations per row (~1M/s measured;
    2 s for 2000 rows × 16 × 64), while numpy does the whole Arrow batch
    as one (n, d)·(d, k) matmul. This is the sanctioned vectorized escape
    hatch; the broadcast state is just the (k, d) centroid matrix. Ties
    resolve to the lowest centroid id (numpy argmax/argmin first-index),
    matching :func:`lloyd`'s assignment exactly."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype=np.float64)

    def assign(col):
        if not len(col):
            return pd.Series([], dtype="int32")
        x = np.stack(col.to_numpy())
        if spherical:
            lab = (x @ cents.T).argmax(axis=1)
        else:
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            lab = d2.argmin(axis=1)
        return pd.Series(lab.astype("int32"))

    # Real annotation objects, not strings: the module's `from __future__
    # import annotations` would stringify inline hints, which pyspark's
    # type-hint inference cannot resolve for locally-defined functions.
    assign.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(assign, "int")


def pq_encode_udf(coarse: list[list[float]] | None, codebooks: list):
    """Arrow-batched PQ encoder: ``(arr, centroid_id) -> array<int>`` of
    per-subspace code ids. When ``coarse`` is given, the vector is first
    residualized against its cell centroid (IVF+PQ); pass ``None`` to
    encode raw vectors (plain PQ — the centroid_id column is ignored).
    Same vectorization rationale as :func:`nearest_centroid_udf`: m
    subspaces × n_codes × lsub as interpreted lambdas is the per-row
    anti-pattern; numpy encodes the whole batch with m small matmuls."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    coarse_m = None if coarse is None else np.asarray(coarse, dtype=np.float64)
    cbs = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(cbs)
    lsub = cbs[0].shape[1]

    def encode(arr, cid):
        if not len(arr):
            return pd.Series([], dtype=object)
        x = np.stack(arr.to_numpy())
        if coarse_m is not None:
            x = x - coarse_m[cid.to_numpy().astype(int)]
        out = np.empty((len(x), m), dtype=np.int32)
        for s in range(m):
            sub = x[:, s * lsub : (s + 1) * lsub]
            d2 = ((sub[:, None, :] - cbs[s][None, :, :]) ** 2).sum(axis=2)
            out[:, s] = d2.argmin(axis=1)
        return pd.Series(list(out))

    encode.__annotations__ = {"arr": pd.Series, "cid": pd.Series, "return": pd.Series}
    return pandas_udf(encode, "array<int>")


def pq_lut_udf(coarse: list[list[float]] | None, codebooks: list):
    """Arrow-batched ADC lookup-table builder: ``(q_vec, centroid_id) ->
    array<array<double>>`` of per-subspace, per-code squared distances for
    the (residualized, when ``coarse`` is given) query. One UDF node in
    the plan — building this as nested transform/aggregate expressions
    over codebook LITERALS puts thousands of Literal nodes in the plan
    (``F.lit(list)`` expands per element) and costs seconds of driver-side
    analysis before a single row moves."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    coarse_m = None if coarse is None else np.asarray(coarse, dtype=np.float64)
    cbs = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(cbs)
    lsub = cbs[0].shape[1]

    def lut(q_vec, cid):
        if not len(q_vec):
            return pd.Series([], dtype=object)
        x = np.stack(q_vec.to_numpy())
        if coarse_m is not None:
            x = x - coarse_m[cid.to_numpy().astype(int)]
        per_sub = [
            ((x[:, None, s * lsub : (s + 1) * lsub] - cbs[s][None, :, :]) ** 2).sum(
                axis=2
            )
            for s in range(m)
        ]  # m × (n, n_codes)
        return pd.Series(
            [[per_sub[s][i].tolist() for s in range(m)] for i in range(len(x))]
        )

    lut.__annotations__ = {"q_vec": pd.Series, "cid": pd.Series, "return": pd.Series}
    return pandas_udf(lut, "array<array<double>>")
