"""Iterative k-means training — mode-1 (codebook training) parity.

The reference trains its coarse quantizer with restarts of Lloyd iterations
over sampled vectors: seed, assign every vector to its nearest centroid,
recompute centroids as member means, break when the assignment stabilizes
(/root/reference/Clustering.h:88-220, driven by /root/reference/ivfpq_new.cpp:61-99).

Spark-first shape: the per-iteration heavy step is ONE broadcast-join
assignment + ONE groupBy recompute over the vector table — no shuffle of the
vectors themselves, the codebook (k x dim, tiny) round-trips through the
driver between iterations exactly like the reference keeps ``centroids[]``
resident. Iteration count is bounded; convergence breaks early on max
centroid shift < ``tol``.

Determinism: centroid means are rounded to ``round_decimals`` at every
iteration boundary, so the fixpoint does not depend on float summation order
(Spark partial aggregation vs any oracle's sequential sum) — the property
the driver-contract ``kmeans_train`` entry relies on. Seeding is
deterministic: ``first`` takes the k lowest vec_ids (the contract fixture);
``farthest`` is the deterministic SAMPLED k-center sweep (hash-ordered
T=10,000 sample, one Spark job, numpy sweep on the driver) standing in for
the reference's random kmeans++ restarts over its own 10k-point sample.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine(a: str = "a", b: str = "b"):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _neg_l2sq(a: str = "a", b: str = "b"):
    return -F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _round_half_up(arr: "np.ndarray", decimals: int) -> "np.ndarray":
    """HALF_UP rounding matching Spark's F.round / DuckDB's round() — NOT
    numpy's banker's (half-to-even) rounding, which diverges on exact-half
    values (e.g. 5e-07 at 6 decimals: HALF_UP -> 1e-06, banker's -> 0.0).
    Spark rounds BigDecimal.valueOf(double) (shortest decimal repr, same as
    Python's repr) with HALF_UP; done per element via decimal — only ever
    applied to driver-side k x d codebooks, so cost is irrelevant."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-decimals)
    flat = np.asarray(arr, dtype=np.float64).ravel()
    out = np.fromiter(
        (
            float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))
            for x in flat
        ),
        dtype=np.float64,
        count=flat.size,
    )
    return out.reshape(np.shape(arr))


def _list_matrix(col) -> "np.ndarray":
    """Arrow list<double> column -> (n, d) float64 matrix, zero-copy on the
    flat values buffer (all rows share one dim by construction)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, flat.size // n)


def assign_cells(
    vecs: DataFrame,
    centroids_pdf: pd.DataFrame,
    metric: str = "cosine",
    impl: str = "arrow",
) -> DataFrame:
    """(vec_id, v) x broadcast codebook -> (vec_id, v, cell): nearest-centroid
    assignment (J2 theta-join; /root/reference/Clustering.h:154-170).

    impl="arrow" (default): the (k x d) codebook ships in the task closure
    and each partition runs ONE matrix argmax — zero exchange, n rows in,
    n rows out. The crossJoin+window form scored n*k rows and shuffled them
    through a per-vec_id window sort; at 100x the data that exchange IS the
    iteration cost. impl="sql" keeps the declarative form (expression parity
    for oracles that replay the assignment in SQL).

    Tie-break parity: np.argmax returns the FIRST maximum — the lowest cell
    id, identical to ORDER BY _sim DESC, cell ASC. Centroid rows are sorted
    by cell before the kernel so row order == cell order. CAVEAT: the arrow
    kernel computes scores in BLAS order (c2 - 2*V@M / normalized dot), the
    sql form in a sequential left fold — bit-identical on exact ties, but a
    pair of centroids whose true distances differ by less than the float
    rounding of either expression can in principle assign differently
    between impl='arrow' and impl='sql' (never observed on the contract
    fixtures; see tests/test_clustering_federation.py parity tests)."""
    if impl == "sql":
        spark = vecs.sparkSession
        cent = spark.createDataFrame(centroids_pdf, schema="cell int, b array<double>")
        scorer = _cosine("v", "b") if metric == "cosine" else _neg_l2sq("v", "b")
        w = Window.partitionBy("vec_id").orderBy(F.desc("_sim"), F.asc("cell"))
        return (
            vecs.crossJoin(F.broadcast(cent))
            .withColumn("_sim", scorer)
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("vec_id", "v", "cell")
        )

    cent = centroids_pdf.sort_values("cell")
    cell_ids = cent["cell"].to_numpy(np.int32)
    C = np.stack([np.asarray(b, dtype=np.float64) for b in cent["b"]])

    def kernel(batches):
        import pyarrow as pa

        if metric == "cosine":
            # |v| factors out of the per-row argmax: score = v @ (c/|c|)
            cn = np.linalg.norm(C, axis=1)
            cn[cn == 0.0] = 1.0
            M = (C / cn[:, None]).T
        else:
            M = C.T
            c2 = (C * C).sum(axis=1)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            V = _list_matrix(tbl.column("v"))
            if metric == "cosine":
                best = np.argmax(V @ M, axis=1)
            else:
                best = np.argmin(c2[None, :] - 2.0 * (V @ M), axis=1)
            out = pa.Table.from_arrays(
                [
                    tbl.column("vec_id"),
                    tbl.column("v"),
                    pa.array(cell_ids[best], type=pa.int32()),
                ],
                names=["vec_id", "v", "cell"],
            )
            yield from out.to_batches()

    return vecs.select("vec_id", "v").mapInArrow(
        kernel, "vec_id long, v array<double>, cell int"
    )


def recompute_centroids(
    assigned: DataFrame, round_decimals: int = 6, impl: str = "arrow"
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Member means per (cell, dim) -> driver pandas codebook (tiny: k x dim).
    The A1 sum/count/divide update (/root/reference/Clustering.h:190-215).

    impl="arrow" (default): each partition reduces its vectors to ONE
    (k x d) partial-sum matrix + k counts inside a mapInArrow kernel; only
    k*(d+1) numbers per partition reach the final merge — the n x d
    posexplode row-shuffle of the SQL form never happens. impl="sql" keeps
    the declarative explode+groupBy (oracle expression parity)."""
    if impl == "sql":
        pdf = (
            assigned.select("cell", F.posexplode("v").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.count("*").alias("n_members"), F.round(F.avg("val"), round_decimals).alias("m"))
            .toPandas()
            .sort_values(["cell", "dim"])
        )
        cents = (
            pdf.groupby("cell")["m"].agg(list).reset_index().rename(columns={"m": "b"})
        )
        return cents, pdf

    def kernel(batches):
        import pyarrow as pa

        sums: dict = {}
        counts: dict = {}
        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            V = _list_matrix(tbl.column("v"))
            cells = tbl.column("cell").to_numpy(zero_copy_only=False)
            uc, inv = np.unique(cells, return_inverse=True)
            for i, c in enumerate(uc):
                m = inv == i
                block = V[m]
                c = int(c)
                if c in sums:
                    sums[c] = sums[c] + block.sum(axis=0)
                    counts[c] += block.shape[0]
                else:
                    sums[c] = block.sum(axis=0)
                    counts[c] = block.shape[0]
        if not sums:
            return
        cs = sorted(sums)
        out = pa.Table.from_arrays(
            [
                pa.array(cs, type=pa.int32()),
                pa.array([counts[c] for c in cs], type=pa.int64()),
                pa.array([sums[c].tolist() for c in cs], type=pa.list_(pa.float64())),
            ],
            names=["cell", "n", "s"],
        )
        yield from out.to_batches()

    partials = assigned.select(
        F.col("cell").cast("int").alias("cell"), "v"
    ).mapInArrow(kernel, "cell int, n long, s array<double>").toPandas()
    agg: dict = {}
    for _, row in partials.iterrows():
        c = int(row["cell"])
        if c in agg:
            agg[c][0] += int(row["n"])
            agg[c][1] = agg[c][1] + np.asarray(row["s"], dtype=np.float64)
        else:
            agg[c] = [int(row["n"]), np.asarray(row["s"], dtype=np.float64)]
    rows = []
    for c in sorted(agg):
        n, s = agg[c]
        means = _round_half_up(s / n, round_decimals)
        rows.extend((c, d, n, float(mv)) for d, mv in enumerate(means))
    pdf = pd.DataFrame(rows, columns=["cell", "dim", "n_members", "m"])
    cents = (
        pdf.groupby("cell")["m"].agg(list).reset_index().rename(columns={"m": "b"})
    )
    return cents, pdf


def seed_first_k(vecs: DataFrame, k: int) -> pd.DataFrame:
    """Deterministic contract seeding: the k lowest vec_ids."""
    pdf = (
        vecs.orderBy("vec_id").limit(k)
        .select(F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("b"))
        .toPandas()
    )
    pdf["cell"] = np.arange(len(pdf), dtype=np.int32)
    return pdf


def seed_farthest(
    vecs: DataFrame, k: int, metric: str = "cosine", sample_size: int = 10_000
) -> pd.DataFrame:
    """Deterministic SAMPLED k-center sweep — the corpus-scale seeding.

    The reference trains its quantizer on T=10,000 sampled points
    (/root/reference/main.cpp:42); likewise: ONE Spark job pulls a
    deterministic hash-ordered sample of ``sample_size`` vectors to the
    driver (T x d, tiny), and the farthest-point sweep runs in numpy —
    start from the lowest vec_id, repeatedly add the sampled vector
    farthest from its nearest chosen seed (ties by vec_id). The previous
    form ran k sequential FULL scans of the corpus; this is one
    TakeOrdered job regardless of k. Deterministic: the sample is ordered
    by xxhash64(vec_id) (data-derived, partitioning-independent), not by a
    seeded RNG over a physical layout."""
    sub = (
        vecs.select("vec_id", "v")
        .orderBy(F.xxhash64(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc())
        .limit(int(sample_size))
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    V = np.stack([np.asarray(x, dtype=np.float64) for x in sub["v"]])
    vid = sub["vec_id"].to_numpy(np.int64)
    # always include the globally lowest vec_id as the first seed (the
    # deterministic anchor the unsampled sweep used)
    first = seed_first_k(vecs, 1)
    b0 = np.asarray(first["b"].iloc[0], dtype=np.float64)
    if metric == "cosine":
        Vn = V / np.where(
            (n := np.linalg.norm(V, axis=1))[:, None] == 0.0, 1.0, n[:, None]
        )

        def sim_to(c):
            cn = np.linalg.norm(c)
            return Vn @ (c / (cn if cn else 1.0))
    else:

        def sim_to(c):
            d = V - c[None, :]
            return -(d * d).sum(axis=1)

    best = sim_to(b0)
    seeds = [b0]
    for _ in range(1, k):
        # farthest = minimum similarity to the nearest seed; ties by vec_id
        # (lexsort: primary best asc, secondary vec_id asc)
        j = int(np.lexsort((vid, best))[0])
        c = V[j]
        seeds.append(c)
        best = np.maximum(best, sim_to(c))
    return pd.DataFrame(
        {"cell": np.arange(k, dtype=np.int32), "b": [list(map(float, s)) for s in seeds]}
    )


def kmeans_train(
    vecs: DataFrame,
    k: int,
    max_iters: int = 10,
    tol: float = 0.0,
    metric: str = "cosine",
    seeding: str = "first",
    round_decimals: int = 6,
    impl: str = "arrow",
):
    """Full Lloyd training loop. Returns (centroids_pdf, last_stats_pdf, iters_run).

    ``vecs``: (vec_id long, v array<double>). ``tol`` > 0 breaks when the max
    absolute per-dimension centroid shift falls below it (the reference's
    ``err`` convergence break, /root/reference/Clustering.h:176-188);
    ``tol == 0`` runs exactly ``max_iters`` iterations (the deterministic
    contract mode). Empty cells drop out (their members re-home next round),
    matching the natural SQL semantics on both engine and oracle sides.
    """
    if seeding == "farthest":
        cents = seed_farthest(vecs, k, metric=metric)
    else:
        cents = seed_first_k(vecs, k)
    stats = None
    iters_run = 0
    for _ in range(max_iters):
        assigned = assign_cells(vecs, cents, metric=metric, impl=impl)
        new_cents, stats = recompute_centroids(assigned, round_decimals, impl=impl)
        iters_run += 1
        if tol > 0.0:
            merged = cents.merge(new_cents, on="cell", suffixes=("_old", "_new"))
            if len(merged):
                shift = max(
                    float(np.max(np.abs(np.asarray(o, dtype=float) - np.asarray(n, dtype=float))))
                    for o, n in zip(merged["b_old"], merged["b_new"])
                )
                if shift < tol:
                    cents = new_cents
                    break
        cents = new_cents
    return cents, stats, iters_run
