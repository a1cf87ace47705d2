"""Embedding-matrix linear algebra: exact integer Gram/covariance and
whitening (ZCA) — the preprocessing SemDeDup-style semantic dedup and ANN
benefit from (decorrelated dimensions make cosine thresholds meaningful).

The Gram computation is the embedding-space sibling of the reference's
sensor covariance kernel (`sensor/SensorCalc.kt` X·Xᵀ via TableMult):
there the matrix is (time × class) key-value pairs and the product is a
join+agg; here the matrix is a dense `array<double>` column and the right
physical shape is a MAP-SIDE PARTIAL GRAM — each partition computes its
own d×d int64 VᵀV with one NumPy matmul, and only d² partial cells per
partition shuffle to the final sum. At N vectors × d dims the shuffle is
O(partitions·d²), independent of N — the same partial/final-aggregate
shape as a hash aggregate, applied to a matrix accumulator.

Engine-exactness: inputs quantize to integer micro-units
(round(1e6·x), exact in both engines), so every partial sum is int64
arithmetic — no float summation order anywhere; the DuckDB oracle replays
the same integer products via double-unnest. Magnitude: |cell| ≤
1e12·N → int64-safe to N ≈ 9·10⁶ vectors; past that the same code runs
with DECIMAL(38) cells (documented, not silently wrong: int64 overflow
raises under ANSI mode rather than wrapping).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from ..util import CPU_LIGHT, dense_matrix_fn, fan_out, literal_frame

MICRO = 1_000_000


def embedding_gram_int(
    emb: DataFrame,
    dim: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangle exact integer Gram matrix of the embedding set:
    (i, j, g) for i ≤ j with g = Σ_rows round(1e6·vᵢ)·round(1e6·vⱼ).

    Physical plan: mapInPandas computes one int64 VᵀV per Arrow batch
    (vectorized, exact), emits d(d+1)/2 upper-triangle cells; a hash
    aggregate sums partials. Nothing row-sized ever shuffles."""
    import numpy as np
    import pandas as pd

    out_schema = StructType(
        [
            StructField("i", IntegerType(), False),
            StructField("j", IntegerType(), False),
            StructField("g", LongType(), False),
        ]
    )

    # shared non-null fixed-dim validator (util.dense_matrix_fn): the
    # isnan pass matters doubly here — floor(NaN).astype(int64) would
    # otherwise silently inject INT64_MIN into the integer Gram sums
    to_matrix = dense_matrix_fn(dim, "embedding_gram_int")

    def partial_gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        iui, iuj = np.triu_indices(dim)
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if pdf.empty:
                continue
            M = to_matrix(pdf[vec_col])
            # floor(x·1e6 + 0.5), NOT rint: rint rounds half-to-even while
            # SQL ROUND is half-away — floor(+0.5) is the one quantizer
            # both engines express identically (DEVNOTES gotcha #4 family)
            v = np.floor(M * MICRO + 0.5).astype(np.int64)
            acc += v.T @ v
            seen = True
            # NumPy int64 WRAPS silently (unlike Spark under ANSI) — keep
            # the loud-overflow contract honest with an explicit guard
            if np.abs(acc).max() > (1 << 62):
                raise OverflowError(
                    "embedding_gram_int partial sum near int64 range — "
                    "pre-scale the embeddings or reduce partition size"
                )
        if seen:
            yield pd.DataFrame(
                {"i": iui.astype("int32"), "j": iuj.astype("int32"), "g": acc[iui, iuj]}
            )

    cells = fan_out(emb, CPU_LIGHT).select(F.col(vec_col).cast("array<double>").alias(vec_col)).mapInPandas(
        partial_gram, out_schema
    )
    return cells.groupBy("i", "j").agg(F.sum("g").alias("g"))


def whiten_embeddings(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-6,
) -> DataFrame:
    """ZCA-whiten the embedding column: W = C^(−1/2) for the sample
    covariance C (driver-side eigendecomposition of the d×d matrix — d is
    model-sized, the one legitimately driver-scale object here), applied
    as one NumPy matmul per Arrow batch. Output column ``whitened`` has
    (empirical) identity covariance — see test_embeddings for the
    property check."""
    import numpy as np
    import pandas as pd

    n = emb.count()
    if n == 0:
        # empty in → empty out (the covariance of nothing is undefined;
        # crashing a pipeline on an empty incremental batch is worse)
        return literal_frame(emb.sparkSession, 
            [], f"{id_col} long, whitened array<double>"
        )
    gram_rows = embedding_gram_int(emb, dim, vec_col).collect()  # ≤ d(d+1)/2 rows
    g = np.zeros((dim, dim))
    for r in gram_rows:
        g[r.i, r.j] = r.g
        g[r.j, r.i] = r.g
    # back to float units; center with the mean (exact int mean would need
    # a second pass — whitening tolerates float here, it's a TRANSFORM not
    # an oracle-compared aggregate)
    mu = np.array(
        emb.select(
            F.array(*[
                F.avg(F.col(vec_col)[i]) for i in range(dim)
            ]).alias("m")
        ).collect()[0].m
    )
    cov = g / (MICRO * MICRO) / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    w = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, eps))) @ vecs.T

    out_schema = StructType.fromDDL(f"{id_col} long, whitened array<double>")

    to_matrix = dense_matrix_fn(dim, "whiten_embeddings")

    def apply_w(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            v = to_matrix(pdf[vec_col]) - mu
            yield pd.DataFrame(
                {id_col: pdf[id_col], "whitened": list(v @ w.T)}
            )

    return fan_out(emb, CPU_LIGHT).select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(apply_w, out_schema)


def pca_project(
    emb: DataFrame,
    dim: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project embeddings onto their top-``k`` principal components —
    the dimensionality-reduction step before clustering/ANN when d is
    large (cuts every downstream distance computation from d to k
    mults). Same scale shape as ``whiten_embeddings``: the d×d sample
    covariance comes from the exact integer Gram (one map-side NumPy
    pass, d(d+1)/2-cell shuffle), the eigendecomposition is driver-side
    on the d×d matrix only, and the projection is one NumPy matmul per
    Arrow batch — the corpus never shuffles. Components are ordered by
    descending eigenvalue; each component's sign is fixed so its
    largest-|entry| coordinate is positive (eigh's sign choice is
    BLAS-dependent, this pin makes outputs reproducible across
    machines)."""
    import numpy as np
    import pandas as pd

    if k > dim:
        raise ValueError(
            f"pca_project: k={k} > dim={dim} — a d-dim space has at most d "
            "principal components; pass k ≤ dim"
        )
    n = emb.count()
    if n == 0:
        return literal_frame(emb.sparkSession, 
            [], f"{id_col} long, {out_col} array<double>"
        )
    gram_rows = embedding_gram_int(emb, dim, vec_col).collect()  # ≤ d(d+1)/2 rows
    g = np.zeros((dim, dim))
    for r in gram_rows:
        g[r.i, r.j] = r.g
        g[r.j, r.i] = r.g
    mu = np.array(
        emb.select(
            F.array(*[F.avg(F.col(vec_col)[i]) for i in range(dim)]).alias("m")
        ).collect()[0].m
    )
    cov = g / (MICRO * MICRO) / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]  # d × k, descending eigenvalue
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    comps = comps * np.where(flip == 0, 1.0, flip)

    out_schema = StructType.fromDDL(f"{id_col} long, {out_col} array<double>")

    # shared non-null fixed-dim validator — actionable error instead of
    # an obscure np.stack/broadcast crash, and the isnan pass catches
    # NULL COMPONENTS (they'd otherwise propagate as NaN projections)
    to_matrix = dense_matrix_fn(dim, "pca_project")

    def apply_p(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            v = to_matrix(pdf[vec_col])
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list((v - mu) @ comps)})

    return fan_out(emb, CPU_LIGHT).select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(apply_p, out_schema)
