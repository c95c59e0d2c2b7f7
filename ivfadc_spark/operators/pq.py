"""Residual product quantization + ADC scoring — the reference's defining
compression trick, re-expressed Spark-first.

Reference shape: after the coarse quantizer assigns each vector to a cell,
the *residual* (vector minus its cell centroid) is cut into ``nsq``
subvectors and each subspace gets its own small k-means codebook trained
over the residuals (/root/reference/ivfpq_new.cpp:126-205). A vector is
then stored as ``nsq`` one-byte codes (32x+ compression at nsq=8/ks=256);
a query is answered by asymmetric distance computation: one small
(nsq x ks) table of exact query-residual-to-sub-centroid distances per
probed cell, then each candidate's distance is ``nsq`` table gathers
(/root/reference/SearchEngine.cpp:170-184).

Spark-first mapping:
- coarse assignment and sub-code encoding are ONE ``mapInArrow`` pass each
  (default ``impl="arrow"``): the codebooks — coarse k x d plus nsq tiny
  ks x (d/nsq) sub-books — ship in the task closure and every partition
  runs matrix argmins locally. Zero exchange, n rows in / n rows out; the
  declarative crossJoin+window forms are kept behind ``impl="sql"`` for
  expression parity with SQL oracles (the clustering.assign_cells pattern);
- sub-codebook training reuses :func:`clustering.kmeans_train` per
  subspace over ``F.slice``-ed residuals — broadcast-assign + partial-sum
  recompute, the vectors themselves never shuffle;
- codes are plain int columns (``code_0..code_{nsq-1}``) — columnar,
  ``nsq`` bytes/vector in parquet, the IVFADC storage layout;
- ADC scoring has two shapes: :func:`adc_topk` (joins against broadcast
  distance-table DataFrames — fully declarative, oracle-mirrorable) and
  :func:`adc_topk_gather` (the scale path: distance tables precomputed
  driver-side from query metadata only and shipped in the closure, ONE
  mapInArrow scan over the cell-partitioned codes with per-task top-k,
  then a tiny final merge — the SearchEngine.cpp:148-198 loop shape).

At 100 TB the candidate side stays fully distributed: codes live with the
vectors (cell-partitioned parquet -> probing nprobe cells is partition
pruning), and everything query-sized rides a broadcast or a closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ivfadc_spark.operators.clustering import (
    _list_matrix,
    _round_half_up,
    kmeans_train,
)


def l2sq(a: str = "a", b: str = "b"):
    """Sequential-fold squared L2 — the same left-to-right float order as
    DuckDB's list fold, so engine and oracle agree bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _fold_l2(q: "np.ndarray", c: "np.ndarray") -> float:
    """Driver-side sequential-fold squared L2 — the SAME left-to-right float
    order as :func:`l2sq` / DuckDB's list fold, so distance tables computed
    on the driver are bit-identical to the declarative form. Only ever runs
    on query-sized metadata (nq x nprobe x nsq x ks x m elements)."""
    acc = 0.0
    for x, y in zip(q.tolist(), c.tolist()):
        d = x - y
        acc += d * d
    return acc


def _books_matrices(books: list[pd.DataFrame]):
    """-> list of (code_ids int32[ks], C float64[ks, m]) per subspace,
    rows sorted by code id so row order == code order (argmin ties pick the
    lowest code, matching ORDER BY _d ASC, code ASC)."""
    out = []
    for book in books:
        b = book.sort_values("cell")
        ids = b["cell"].to_numpy(np.int32)
        C = np.stack([np.asarray(x, dtype=np.float64) for x in b["b"]])
        out.append((ids, C))
    return out


def coarse_assign(
    vecs: DataFrame,
    centroids_pdf: pd.DataFrame,
    nprobe: int | None = None,
    impl: str = "arrow",
    metric: str = "l2",
    passthrough: tuple = (),
) -> DataFrame:
    """(vec_id, v, *passthrough) -> (vec_id, v, *passthrough, cell, b, r):
    cells ranked best-first (L2 asc or cosine desc; ties cell asc). r == 1
    is the storage assignment; r <= nprobe drives probes.

    impl="arrow" (default): the (k x d) coarse codebook ships in the task
    closure and each partition ranks its vectors with one matrix product —
    zero exchange, n rows in, n*nprobe rows out (``nprobe`` defaults to ALL
    cells only under impl="sql"; the arrow kernel requires an explicit
    bound so the output stays O(n), not O(n*k)). impl="sql" keeps the
    crossJoin+window form — that plan exchanges n*k rows through a window
    sort, which at 100x the data IS the encode cost; retained only for
    expression parity with SQL oracles (the clustering.assign_cells
    pattern, clustering.py:62-130).

    ``metric="cosine"`` ranks by normalized dot (|v| factors out of the
    per-row ranking); tie-break parity and the near-tie float caveat are
    the same as clustering.assign_cells. ``passthrough`` names extra input
    columns (e.g. a filter label) replicated onto every ranked row — the
    filtered-kNN entry reads them instead of re-joining the source."""
    if impl == "sql":
        spark = vecs.sparkSession
        cent = spark.createDataFrame(centroids_pdf, schema="cell int, b array<double>")
        if metric == "cosine":
            from ivfadc_spark.operators.clustering import _cosine

            w = Window.partitionBy("vec_id").orderBy(F.desc("_d"), F.asc("cell"))
            scorer = _cosine("v", "b")
        else:
            w = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("cell"))
            scorer = l2sq("v", "b")
        out = (
            vecs.crossJoin(F.broadcast(cent))
            .withColumn("_d", scorer)
            .withColumn("r", F.row_number().over(w))
            .select("vec_id", "v", *passthrough, "cell", "b", "r")
        )
        return out.filter(F.col("r") <= nprobe) if nprobe else out

    if not nprobe:
        raise ValueError("coarse_assign(impl='arrow') needs an explicit nprobe")
    cent = centroids_pdf.sort_values("cell")
    cell_ids = cent["cell"].to_numpy(np.int32)
    C = np.stack([np.asarray(b, dtype=np.float64) for b in cent["b"]])
    p = min(int(nprobe), C.shape[0])

    def kernel(batches):
        import pyarrow as pa

        if metric == "cosine":
            # |v| is constant per row: ranking by -v @ (c/|c|) == cosine desc
            cn = np.linalg.norm(C, axis=1)
            cn[cn == 0.0] = 1.0
            M = (C / cn[:, None]).T
        else:
            c2 = (C * C).sum(axis=1)
            M = C.T
        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            V = _list_matrix(tbl.column("v"))
            # per-row ranking: |v|^2 is constant per row, so ordering by
            # c2 - 2 v.c == ordering by full L2; stable sort -> ties pick
            # the lowest cell id (rows are in cell order)
            if metric == "cosine":
                D = -(V @ M)
            else:
                D = c2[None, :] - 2.0 * (V @ M)
            order = np.argsort(D, axis=1, kind="stable")[:, :p]
            n = V.shape[0]
            rep = np.repeat(np.arange(n), p)
            cells = cell_ids[order.ravel()]
            base = tbl.take(pa.array(rep, type=pa.int64()))
            out = pa.Table.from_arrays(
                [
                    *base.columns,
                    pa.array(cells, type=pa.int32()),
                    pa.ListArray.from_arrays(
                        pa.array(np.arange(n * p + 1) * C.shape[1], type=pa.int32()),
                        pa.array(C[order.ravel()].ravel(), type=pa.float64()),
                    ),
                    pa.array(np.tile(np.arange(1, p + 1, dtype=np.int32), n)),
                ],
                names=[*base.column_names, "cell", "b", "r"],
            )
            yield from out.to_batches()

    sel = vecs.select("vec_id", "v", *passthrough)
    in_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in sel.schema.fields)
    return sel.mapInArrow(kernel, f"{in_ddl}, cell int, b array<double>, r int")


def residuals(assigned: DataFrame) -> DataFrame:
    """(vec_id, v, cell, b) -> (vec_id, cell, rr): rr = v - centroid,
    the quantity PQ codebooks are trained on (ivfpq_new.cpp:137-146)."""
    return assigned.select(
        "vec_id", "cell", F.zip_with("v", "b", lambda x, y: x - y).alias("rr")
    )


def train_pq(
    res: DataFrame,
    dim: int,
    nsq: int,
    ks: int,
    iters: int,
    round_decimals: int = 6,
) -> list[pd.DataFrame]:
    """Train one k-means codebook per subspace over the residual slices
    (ivfpq_new.cpp:126-205). Returns ``nsq`` driver-side codebooks
    (cell int, b array<double>), each ks x (dim/nsq). Deterministic:
    first-k seeding + per-iteration rounding (see clustering.kmeans_train).
    """
    m = dim // nsq
    books = []
    for s in range(nsq):
        sub = res.select("vec_id", F.slice("rr", s * m + 1, m).alias("v"))
        book, _, _ = kmeans_train(
            sub, k=ks, max_iters=iters, tol=0.0, metric="l2",
            seeding="first", round_decimals=round_decimals,
        )
        book = book.copy()
        book["b"] = [list(map(float, x)) for x in book["b"]]
        books.append(book)
    return books


def encode_pq(
    res: DataFrame, books: list[pd.DataFrame], dim: int, impl: str = "arrow"
) -> DataFrame:
    """(vec_id, cell, rr) -> (vec_id, cell, code_0..code_{nsq-1}): nearest
    sub-centroid per subspace (L2 asc, code asc). The vector's stored form
    is cell + nsq small ints — the IVFADC compressed row.

    impl="arrow" (default): ONE mapInArrow pass computes all ``nsq``
    sub-argmins — the codebooks (nsq x ks x d/nsq, tiny) live in the task
    closure, so the bulk encode of an embedding corpus is a single scan
    with zero exchange (the Index.cpp:73-83 per-vector loop, vectorized).
    impl="sql" keeps the per-subspace crossJoin+window chain (n x ks rows
    through a window sort, nsq times) — oracle expression parity only."""
    nsq = len(books)
    m = dim // nsq
    if impl == "sql":
        spark = res.sparkSession
        out = res.select("vec_id", "cell", "rr")
        for s, book in enumerate(books):
            cent = spark.createDataFrame(book, schema="cell int, b array<double>")
            cent = cent.select(F.col("cell").alias("_j"), F.col("b").alias("_b"))
            w = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("_j"))
            code = (
                out.select("vec_id", F.slice("rr", s * m + 1, m).alias("_rs"))
                .crossJoin(F.broadcast(cent))
                .withColumn("_d", l2sq("_rs", "_b"))
                .withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") == 1)
                .select("vec_id", F.col("_j").alias(f"code_{s}"))
            )
            out = out.join(code, "vec_id")
        return out.drop("rr")

    mats = _books_matrices(books)

    def kernel(batches):
        import pyarrow as pa

        pre = [((C * C).sum(axis=1), C.T) for _, C in mats]
        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            R = _list_matrix(tbl.column("rr"))
            cols = [tbl.column("vec_id"), tbl.column("cell")]
            names = ["vec_id", "cell"]
            for s, ((ids, _), (c2, Mt)) in enumerate(zip(mats, pre)):
                Rs = R[:, s * m:(s + 1) * m]
                best = np.argmin(c2[None, :] - 2.0 * (Rs @ Mt), axis=1)
                cols.append(pa.array(ids[best], type=pa.int32()))
                names.append(f"code_{s}")
            yield from pa.Table.from_arrays(cols, names=names).to_batches()

    schema = "vec_id long, cell int, " + ", ".join(
        f"code_{s} int" for s in range(nsq)
    )
    return res.select("vec_id", "cell", "rr").mapInArrow(kernel, schema)


def write_pq_index(
    path: str,
    codes: DataFrame,
    books: list[pd.DataFrame],
    coarse_pdf: pd.DataFrame,
) -> None:
    """Persist the IVFADC index: codes parquet PARTITIONED BY cell — the
    on-disk inverted file (a query probing nprobe cells reads only those
    partitions; the reference's per-cell entry files, Index.cpp:9-11) —
    plus the coarse codebook and sub-codebooks as one small json sidecar
    (codebooks are driver-resident at query time, Vocab.cpp:152-166)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "codes")
    )
    meta = {
        "nsq": len(books),
        "coarse": coarse_pdf.to_dict(orient="list"),
        "books": [b.to_dict(orient="list") for b in books],
    }
    with open(os.path.join(path, "pq_meta.json"), "w") as f:
        json.dump(meta, f)


def append_pq_index(spark, path: str, vecs: DataFrame, nprobe: int = 1) -> None:
    """Incremental append to a persisted IVFADC index — the LSM model the
    text side uses, applied to vectors: new rows are coarse-assigned and
    PQ-encoded with the index's FROZEN codebooks (one mapInArrow pass,
    codebooks in the closure), then written into the cell-partitioned codes
    dataset with ``mode=append`` — new parquet files land inside existing
    cell partitions, nothing is rewritten, readers see the union. This is
    the standard IVF update contract (the reference re-runs mode 2 per new
    collection and unions at load, /root/reference/SearchEngine.cpp:94-102;
    Faiss `IVF.add` likewise encodes against frozen codebooks): appended
    vectors quantize exactly as they would have at build time, so an
    appended index is bit-identical to one built over the union with the
    same codebooks. Re-train + rebuild only when drift degrades recall.
    """
    import os

    codes2, books, coarse = load_pq_index(spark, path)
    nsq = len(books)
    dim = len(coarse["b"].iloc[0])
    assigned = coarse_assign(vecs, coarse, nprobe=nprobe, impl="arrow").filter(
        F.col("r") == 1
    )
    enc = encode_pq(residuals(assigned), books, dim, impl="arrow")
    enc.select(
        "vec_id", "cell", *[f"code_{s}" for s in range(nsq)]
    ).write.mode("append").partitionBy("cell").parquet(os.path.join(path, "codes"))


def load_pq_index(spark, path: str):
    """-> (codes DataFrame, books, coarse_pdf). Cell partition pruning is
    free on the codes frame (filter cell IN probed -> only those parquet
    partitions scanned)."""
    import json
    import os

    with open(os.path.join(path, "pq_meta.json")) as f:
        meta = json.load(f)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    books = [pd.DataFrame(b) for b in meta["books"]]
    coarse = pd.DataFrame(meta["coarse"])
    return codes, books, coarse


def adc_topk(
    probes: DataFrame,
    codes: DataFrame,
    books: list[pd.DataFrame],
    dim: int,
    k: int,
    round_decimals: int = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """ADC scoring (SearchEngine.cpp:170-184): per (query, probed cell)
    build the (nsq x ks) exact distance table from the query residual, then
    every candidate in the cell costs ``nsq`` broadcast-joined gathers.

    probes: (query_id, cell, qrr) — one row per probed cell, qrr = query
    residual AGAINST THAT CELL's centroid. codes: output of encode_pq.
    Returns (query_id, rank, cand_id, adc): top-k by adc ASC, tie cand ASC.

    ``exclude_self`` drops candidates whose vec_id equals the query_id —
    the self-query fixture semantics. It assumes query ids share the stored
    vectors' id namespace; pass ``exclude_self=False`` for external query
    ids (an id that coincidentally collides with a vec_id would otherwise
    silently lose a valid nearest candidate)."""
    nsq = len(books)
    m = dim // nsq
    spark = probes.sparkSession
    scored = probes.select("query_id", "cell", "qrr").join(
        codes.select(F.col("vec_id").alias("cand_id"), "cell",
                     *[f"code_{s}" for s in range(nsq)]),
        "cell",
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("cand_id"))
    for s, book in enumerate(books):
        cent = spark.createDataFrame(book, schema="cell int, b array<double>")
        dt = (
            probes.select("query_id", "cell", F.slice("qrr", s * m + 1, m).alias("_qs"))
            .crossJoin(F.broadcast(cent.select(F.col("cell").alias(f"code_{s}"),
                                               F.col("b").alias("_b"))))
            .select("query_id", "cell", f"code_{s}",
                    l2sq("_qs", "_b").alias(f"_d{s}"))
        )
        scored = scored.join(F.broadcast(dt), ["query_id", "cell", f"code_{s}"])
    # FIXED-order sum: bit-deterministic, mirrored verbatim in the oracle
    adc = F.col("_d0")
    for s in range(1, nsq):
        adc = adc + F.col(f"_d{s}")
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("cand_id"))
    return (
        scored.withColumn("adc", F.round(adc, round_decimals))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int"). alias("rank"),
                "cand_id", "adc")
    )


def adc_topk_gather(
    probes_pdf: pd.DataFrame,
    codes: DataFrame,
    books: list[pd.DataFrame],
    dim: int,
    k: int,
    round_decimals: int = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """Single-pass ADC over (persisted) cell-partitioned codes — the scale
    shape of :func:`adc_topk` (/root/reference/SearchEngine.cpp:148-198:
    per-cell distance table, then one linear gather over the cell's codes).

    ``probes_pdf``: driver-side (query_id, cell, qrr) — QUERY metadata only
    (nq x nprobe rows), the batch-broker pattern of bm25_topk_batch. The
    (nq*nprobe, nsq, ks) distance tables are computed ON THE DRIVER with
    the same sequential-fold float order as the SQL form (bit-identical),
    then shipped in the task closure. The codes frame is filtered to the
    probed cells (partition pruning on the persisted layout) and scanned
    EXACTLY ONCE by a mapInArrow kernel that scores every (probing query,
    candidate) pair with nsq table gathers and keeps a per-task top-k; the
    final merge ranks tasks x nq x k rows — query-sized, never data-sized.

    Exactness: per-task top-k by (rounded adc, cand_id) is a monotone merge
    — the global top-k is a subset of the per-task top-ks."""
    nsq = len(books)
    m = dim // nsq
    spark = codes.sparkSession

    # driver-side distance tables: dt[(cell)][q, s, code] exact-fold floats
    pb = probes_pdf.reset_index(drop=True)
    qids = pb["query_id"].to_numpy(np.int64)
    pcells = pb["cell"].to_numpy(np.int64)
    mats = _books_matrices(books)
    ks_max = max(int(ids.max()) + 1 for ids, _ in mats)
    dt = np.full((len(pb), nsq, ks_max), np.inf, dtype=np.float64)
    for i, qrr in enumerate(pb["qrr"]):
        q = np.asarray(qrr, dtype=np.float64)
        for s, (ids, C) in enumerate(mats):
            qs = q[s * m:(s + 1) * m]
            for j, cid in enumerate(ids):
                dt[i, s, int(cid)] = _fold_l2(qs, C[j])
    # group probe rows by cell for the kernel's per-cell lookup
    by_cell: dict[int, np.ndarray] = {
        int(c): np.flatnonzero(pcells == c) for c in np.unique(pcells)
    }
    probed = sorted(by_cell)

    def kernel(batches):
        import pyarrow as pa

        # per-query running top-k across the task's batches
        best: dict[int, list] = {}

        def push(qi, adcs, cands):
            cur = best.get(qi)
            if cur is None:
                cur = best[qi] = [adcs, cands]
            else:
                cur[0] = np.concatenate([cur[0], adcs])
                cur[1] = np.concatenate([cur[1], cands])
            if cur[0].size > 4 * k:  # compact: keep the k smallest
                o = np.lexsort((cur[1], cur[0]))[:k]
                cur[0], cur[1] = cur[0][o], cur[1][o]

        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            cells = tbl.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
            vids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            code_mat = np.stack(
                [
                    tbl.column(f"code_{s}").to_numpy(zero_copy_only=False).astype(np.int64)
                    for s in range(nsq)
                ],
                axis=1,
            )
            for c in np.unique(cells):
                pidx = by_cell.get(int(c))
                if pidx is None:
                    continue
                sel = cells == c
                cv, cm = vids[sel], code_mat[sel]
                for i in pidx:
                    # nsq gathers + fixed-order sum (d0 + d1 + ...)
                    adc = dt[i, 0][cm[:, 0]]
                    for s in range(1, nsq):
                        adc = adc + dt[i, s][cm[:, s]]
                    cand = cv
                    if exclude_self:
                        keep = cand != qids[i]
                        adc, cand = adc[keep], cand[keep]
                    if adc.size == 0:
                        continue
                    adc = _round_half_up(adc, round_decimals)
                    if adc.size > k:
                        o = np.lexsort((cand, adc))[:k]
                        adc, cand = adc[o], cand[o]
                    push(int(i), adc, cand)
        if not best:
            return
        out_q, out_c, out_a = [], [], []
        for i, (adcs, cands) in best.items():
            o = np.lexsort((cands, adcs))[:k]
            out_q.append(np.full(o.size, qids[i], dtype=np.int64))
            out_c.append(cands[o])
            out_a.append(adcs[o])
        out = pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_q), type=pa.int64()),
                pa.array(np.concatenate(out_c), type=pa.int64()),
                pa.array(np.concatenate(out_a), type=pa.float64()),
            ],
            names=["query_id", "cand_id", "adc"],
        )
        yield from out.to_batches()

    cand = codes.filter(F.col("cell").isin([int(c) for c in probed])).select(
        "vec_id",
        F.col("cell").cast("int").alias("cell"),
        *[F.col(f"code_{s}").cast("int").alias(f"code_{s}") for s in range(nsq)],
    )
    partial = cand.mapInArrow(kernel, "query_id long, cand_id long, adc double")
    # final merge: tasks x nq x k rows — tiny
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("cand_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"),
                "cand_id", "adc")
    )
