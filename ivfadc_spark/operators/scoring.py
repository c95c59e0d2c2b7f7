"""Score-shaping combinators — the Lucene collector / query-wrapper layer.

The reference's search loop produces one thing: a ranked (docID, distance)
list per query (/root/reference/SearchEngine.cpp:194-212). Real search
deployments wrap that core with a small algebra of result-shaping operators
— keyset pagination, hit counting, field sorting, query-time synonym
expansion, document boosts, disjunction-max scoring. Each combinator here
operates on the engine's *scores* frame ``(query_id, doc_id, score)`` or
the pre-aggregation *partials* frame ``(query_id, doc_id, term, partial)``,
so it composes with ANY scoring path (pure-DataFrame probe, block-max
indexed scan, batch TAAT kernel) without knowing how candidates were found.

Scale shape: every combinator is pure Catalyst expressions (whole-stage
codegen, no Python); everything query-sized (cursors, synonym maps, hit
counts) rides a broadcast; per-doc feature joins touch the CANDIDATE set,
never the corpus; top-k stays the window row_number Catalyst lowers to a
bounded per-partition sort.

Determinism: combinators that re-rank (pagination, function_score, dismax)
order by ``round(score, 6)`` with doc_id tiebreak. Rounding BEFORE ranking
makes the total order identical between Spark and any oracle replaying the
same formula — two docs whose float64 sums differ only in summation order
round to the same value and fall back to the doc_id tiebreak on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ranked(scores: DataFrame, k: int, score_col: str = "score",
           offset: int = 0) -> DataFrame:
    """Deterministic top-k over a (query_id, doc_id, <score_col>) frame:
    ORDER BY score_col DESC, doc_id ASC; ranks start at ``offset + 1``."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc(score_col), F.asc("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w) + F.lit(int(offset)))
        .filter(F.col("rank") <= offset + k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            *[c for c in scores.columns if c not in ("query_id", "doc_id")],
        )
    )


def page_after(
    scores: DataFrame,
    cursors: DataFrame,
    k: int,
    offset: int = 0,
    round_decimals: int = 6,
) -> DataFrame:
    """Keyset pagination (the Elasticsearch ``search_after`` contract):
    return the next ``k`` results strictly after a per-query cursor in the
    (score DESC, doc_id ASC) total order.

    ``cursors``: (query_id, after_score, after_doc) — the LAST hit of the
    previous page, query-sized, broadcast. Unlike offset pagination (which
    re-ranks offset+k candidates and breaks under concurrent index updates),
    the keyset filter drops everything at-or-before the cursor BEFORE the
    top-k, so page N costs the same as page 1 and never re-serves a doc.
    Scores are rounded to ``round_decimals`` before the comparison AND the
    re-rank so cursor equality is exact (see module docstring). Queries
    with no cursor row (fewer than one full page of hits) return nothing —
    inner-join semantics, matching the "no more pages" contract.
    """
    s = scores.withColumn("score", F.round("score", round_decimals))
    c = s.join(F.broadcast(cursors), "query_id")
    nxt = c.filter(
        (F.col("score") < F.col("after_score"))
        | (
            (F.col("score") == F.col("after_score"))
            & (F.col("doc_id") > F.col("after_doc"))
        )
    ).select("query_id", "doc_id", "score")
    return ranked(nxt, k, offset=offset)


def total_hits(scores: DataFrame) -> DataFrame:
    """Per-query total hit count (Lucene's TotalHitCountCollector): the
    size of the full OR-semantics candidate set, no ranking, no top-k.
    One count per group key the scores frame already carries — at scale
    this is a partial-aggregated count, never a sort."""
    return scores.groupBy("query_id").agg(
        F.count("*").cast("long").alias("hits")
    )


def sort_by_field(
    scores: DataFrame,
    attrs: DataFrame,
    field: str,
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Field-sorted retrieval (Lucene Sort(SortField)): rank the matching
    docs by a document attribute instead of relevance; scoring is skipped
    entirely (the sorted collector never calls the scorer). ``attrs``:
    (doc_id, <field>) — joined against the CANDIDATE set only; at scale
    this is a fact-table join on doc_id after the probe has already shrunk
    the stream, not a corpus scan."""
    cand = scores.select("query_id", "doc_id").join(attrs, "doc_id")
    w = Window.partitionBy("query_id").orderBy(
        F.asc(field) if ascending else F.desc(field), F.asc("doc_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("int").alias("rank"),
            "doc_id", field,
        )
    )


def expand_synonyms(qterms: DataFrame, synonyms: DataFrame) -> DataFrame:
    """Query-time synonym expansion (the Solr explicit-mapping filter):
    every (query_id, term) gains (query_id, syn) for each mapping row
    ``term -> syn``, deduped — a term already present in the query is not
    double-scored. One-directional: the map says which extra posting lists
    to probe, exactly like the reference's multi-assignment probes extra
    cells per query vector (/root/reference/Vocab.cpp:236-248, T2).
    ``synonyms``: (term, syn), vocabulary-sized, broadcast."""
    extra = (
        qterms.join(F.broadcast(synonyms), "term")
        .select("query_id", F.col("syn").alias("term"))
    )
    return qterms.select("query_id", "term").union(extra).distinct()


def function_score(
    scores: DataFrame,
    features: DataFrame,
    boost,
    k: int,
    round_decimals: int = 6,
) -> DataFrame:
    """Document-feature boosting (the Elasticsearch function_score query):
    final = relevance * boost(features), re-ranked. ``features``:
    (doc_id, ...feature cols) joined against candidates only; ``boost`` is
    a Column expression over those feature columns (recency decay, length
    prior, popularity...). The boosted score is rounded before ranking so
    the total order is oracle-replayable."""
    boosted = (
        scores.join(features, "doc_id")
        .withColumn("score", F.round(F.col("score") * boost, round_decimals))
        .select("query_id", "doc_id", "score")
    )
    return ranked(boosted, k)


def collapse_topk(
    scores: DataFrame,
    attrs: DataFrame,
    group_field: str,
    k: int,
    round_decimals: int = 6,
) -> DataFrame:
    """Field collapsing (the Elasticsearch ``collapse`` parameter / Lucene
    grouping): at most ONE hit per value of a document attribute survives —
    each group is represented by its best-scoring doc — then the survivors
    re-rank into the usual top-k. The standard diversity contract (one hit
    per site/conversation/author) the reference's flat ranked list lacks
    (/root/reference/SearchEngine.cpp:194-212 returns raw (docID, distance)).

    ``attrs``: (doc_id, <group_field>) joined against the CANDIDATE set
    only. Two bounded sorts: the per-(query, group) argmax and the final
    top-k are both window row_numbers Catalyst lowers to per-partition
    bounded sorts — no global sort, no extra shuffle beyond the candidate
    attr join. Scores round before BOTH ranks so the group winner and the
    final order replay identically in any oracle."""
    s = (
        scores.withColumn("score", F.round("score", round_decimals))
        .join(attrs, "doc_id")
    )
    wg = Window.partitionBy("query_id", group_field).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    best = (
        s.withColumn("_gr", F.row_number().over(wg))
        .filter(F.col("_gr") == 1)
        .select("query_id", "doc_id", "score", group_field)
    )
    return ranked(best, k)


def diversify_topk(
    scores: DataFrame,
    attrs: DataFrame,
    group_field: str,
    max_per_group: int,
    k: int,
    round_decimals: int = 6,
) -> DataFrame:
    """Diversified top-k (the ES ``collapse`` with group size > 1 /
    ``diversified_sampler`` contract): at most ``max_per_group`` hits per
    value of a document attribute survive into ONE final ranked list —
    "top 10 turns, but never more than 2 from the same conversation".
    Generalizes :func:`collapse_topk` (which is ``max_per_group=1``);
    unlike :func:`bucket_top_hits` the output is a single cross-group
    ranked list, not a list per bucket.

    ``attrs``: (doc_id, <group_field>) joined against the CANDIDATE set
    only. Two bounded window sorts (the per-(query, group) keep-N and the
    final top-k), no global sort. Scores round before BOTH ranks so any
    oracle replays the group pruning and the final order exactly."""
    s = (
        scores.withColumn("score", F.round("score", round_decimals))
        .join(attrs, "doc_id")
    )
    wg = Window.partitionBy("query_id", group_field).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    kept = (
        s.withColumn("_gr", F.row_number().over(wg))
        .filter(F.col("_gr") <= max_per_group)
        .select("query_id", "doc_id", "score", group_field)
    )
    return ranked(kept, k)


def bucket_top_hits(
    scores: DataFrame,
    attrs: DataFrame,
    group_field: str,
    per_bucket: int,
    round_decimals: int = 6,
) -> DataFrame:
    """top_hits sub-aggregation (the Elasticsearch ``top_hits`` agg under a
    ``terms`` bucket): per (query, bucket) the best ``per_bucket`` hits —
    "show me the strongest example from each role/source/conversation".
    The dual of :func:`collapse_topk`: collapse keeps one hit per group in
    ONE ranked list; top_hits keeps a ranked list PER group.

    ``attrs``: (doc_id, <group_field>) joined against the candidate set
    only. One window row_number per (query, bucket) — Catalyst lowers the
    rank<=N filter to a per-partition bounded sort, no global sort. Scores
    round before ranking so every bucket's order is oracle-replayable."""
    s = (
        scores.withColumn("score", F.round("score", round_decimals))
        .join(attrs, "doc_id")
    )
    w = Window.partitionBy("query_id", group_field).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        s.withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= per_bucket)
        .select(
            "query_id",
            group_field,
            F.col("hit_rank").cast("int").alias("hit_rank"),
            "doc_id",
            "score",
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int,
    rrf_k: int = 60,
    round_decimals: int = 9,
) -> DataFrame:
    """Reciprocal-rank fusion (the Elasticsearch hybrid-retrieval ``rrf``
    rank window): fuse ANY ranked lists (lexical BM25, vector kNN, MLT...)
    by summing 1/(rrf_k + rank) per (query, doc) — rank-based, so the
    retrievers' incomparable score scales never matter (Cormack et al.,
    SIGIR'09). Inputs: (query_id, doc_id, rank) frames, each already a
    bounded per-query top-N (so the union is candidates-sized, never
    corpus-sized); a doc absent from a list simply contributes nothing.

    Determinism: contributions 1/(rrf_k+rank) are exact per row; with two
    lists the per-doc sum is a single float64 add (order-free), and the
    fused score rounds to ``round_decimals`` before ranking, so any oracle
    replaying the same ranks reproduces the total order bit-for-bit. With
    3+ lists summation order can differ at ~1 ulp — far below the 1e-9
    rounding grid for scores bounded by len(rankings)/rrf_k."""
    u = rankings[0].select("query_id", "doc_id", "rank")
    for r in rankings[1:]:
        u = u.unionByName(r.select("query_id", "doc_id", "rank"))
    scored = u.groupBy("query_id", "doc_id").agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank"))),
            round_decimals,
        ).alias("score")
    )
    return ranked(scored, k)


def rescore_topk(
    scores: DataFrame,
    second: DataFrame,
    window: int,
    k: int,
    weight: float = 1.0,
    round_decimals: int = 6,
) -> DataFrame:
    """Rescoring window (the Elasticsearch ``rescore`` / query_rescore
    contract, score_mode=total): only the top ``window`` candidates per
    query are re-scored — final = first_pass + weight * secondary — then
    the usual top-k (``k <= window``). The modern retrieve-then-rerank
    pattern: a cheap first pass (BM25) bounds how many docs the expensive
    secondary signal (embedding cosine, cross-encoder...) ever touches, so
    the second stage costs O(queries * window) regardless of corpus size.

    ``second``: (query_id, doc_id, sec) for AT LEAST the window docs; docs
    without a row keep their first-pass score (sec=0, the ES default).
    First-pass scores round before the window cut and the combined score
    rounds before the final rank, so both orders replay in an oracle."""
    first = ranked(
        scores.withColumn("score", F.round("score", round_decimals)), window
    ).select("query_id", "doc_id", "score")
    rescored = (
        first.join(second, ["query_id", "doc_id"], "left")
        .fillna(0.0, subset=["sec"])
        .withColumn(
            "score",
            F.round(F.col("score") + F.lit(float(weight)) * F.col("sec"),
                    round_decimals),
        )
        .select("query_id", "doc_id", "score")
    )
    return ranked(rescored, k)


def group_topk(
    scores: DataFrame,
    attrs: DataFrame,
    group_field: str,
    k: int,
    score_mode: str = "max",
    round_decimals: int = 6,
) -> DataFrame:
    """Group-scoped retrieval: rank GROUPS of documents, not documents —
    the Elasticsearch parent-child / ``has_child`` ``score_mode`` contract,
    and THE transcript-native retrieval unit (a turn matches, but the user
    wants the conversation). Where :func:`collapse_topk` keeps one doc per
    group and still ranks docs, this aggregates each (query, group)'s hit
    scores into ONE group score — ``max`` (best turn represents the
    conversation), ``sum`` (total evidence) or ``avg`` — and ranks groups.
    Returns (query_id, rank, <group_field>, score, best_doc_id, n_hits):
    the representative doc is the group's best hit (round(score) desc,
    doc_id asc — replayable), n_hits the group's matching-doc count.

    Scale shape: ``attrs`` (doc_id -> group value) joins the CANDIDATE set
    only, never the corpus; the group reduce is one partial-aggregated
    groupBy on (query, group) — strictly fewer rows out than in; the final
    top-k is the usual bounded window sort. Per-hit scores round BEFORE
    the aggregate so max/avg and the best-doc argmax replay in an oracle
    (sum of rounded terms is order-free at 6dp for bounded fan-in).
    Beyond the reference: its ranked list has no document grouping at all
    (/root/reference/SearchEngine.cpp:194-212)."""
    agg = {
        "max": F.max("score"),
        "sum": F.sum("score"),
        "avg": F.avg("score"),
    }[score_mode]
    s = scores.withColumn("score", F.round("score", round_decimals)).join(
        attrs, "doc_id"
    )
    g = s.groupBy("query_id", group_field).agg(
        F.round(agg, round_decimals).alias("gscore"),
        F.count("*").cast("long").alias("n_hits"),
        # best hit = argmax over (score desc, doc_id asc): min of
        # (-score, doc_id) as a struct — one aggregate, no second window
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("doc_id"))).alias("_b"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("gscore"), F.asc(group_field)
    )
    return (
        g.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            group_field,
            F.col("gscore").alias("score"),
            F.col("_b.doc_id").alias("best_doc_id"),
            "n_hits",
        )
    )


def hit_context(
    hits: DataFrame,
    doc_meta: DataFrame,
    window: int = 1,
) -> DataFrame:
    """Context expansion: for every ranked hit, return the surrounding
    turns of the same conversation within ``window`` positions — the
    "show the reply with the question" contract of conversational search
    (the ES top_hits-with-context / chat-window pattern). ``hits``:
    (query_id, rank, doc_id, ...) — a bounded per-query top-k, so it is
    query-sized and broadcasts. ``doc_meta``: (doc_id, conv_id, turn_idx)
    — the doc_map fact table.

    Plan: hits join doc_meta once to learn their (conv_id, turn_idx),
    then broadcast against doc_meta on conv_id with a range predicate on
    turn_idx — a broadcast-hash join whose build side is k*queries rows;
    the corpus side is touched once, filtered by the conversation key.
    Output: one row per (query, hit, context turn), the hit itself
    included at offset 0."""
    hm = hits.select("query_id", "rank", "doc_id").join(
        doc_meta.select("doc_id", "conv_id", "turn_idx"), "doc_id"
    )
    hm = F.broadcast(
        hm.select(
            "query_id", "rank", F.col("doc_id").alias("hit_doc_id"),
            "conv_id", F.col("turn_idx").alias("hit_turn"),
        )
    )
    ctx = hm.join(
        doc_meta.select(
            "conv_id", F.col("doc_id").alias("ctx_doc_id"),
            F.col("turn_idx").alias("ctx_turn_idx"),
        ),
        "conv_id",
    ).filter(
        (F.col("ctx_turn_idx") >= F.col("hit_turn") - window)
        & (F.col("ctx_turn_idx") <= F.col("hit_turn") + window)
    )
    return ctx.select(
        "query_id", "rank", F.col("hit_doc_id").alias("doc_id"),
        "ctx_doc_id", "ctx_turn_idx",
        (F.col("ctx_turn_idx") - F.col("hit_turn")).cast("int").alias("offset"),
    )


def dismax_topk(
    partials: DataFrame,
    k: int,
    tie_breaker: float = 0.0,
    round_decimals: int = 6,
) -> DataFrame:
    """Disjunction-max scoring (Lucene DisjunctionMaxQuery): a doc's score
    is its BEST matching term's partial plus ``tie_breaker`` times the rest
    — rewarding focused matches over diffuse ones, where plain BM25-sum
    rewards matching many weak terms. ``partials``: the pre-sum
    (query_id, doc_id, partial) stream from :func:`query.bm25_partials` —
    dismax is ONE aggregate over the same grouping the sum path uses
    (max + tie*(sum-max)), so the plan shape is identical: partial
    map-side aggregation, no extra shuffle."""
    t = float(tie_breaker)
    scored = (
        partials.groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.max("partial")
                + F.lit(t) * (F.sum("partial") - F.max("partial")),
                round_decimals,
            ).alias("score")
        )
    )
    return ranked(scored, k)
