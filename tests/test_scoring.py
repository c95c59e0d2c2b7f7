"""Score-shaping combinators (operators/scoring.py): edge semantics the
sf0.01 oracle fixtures cannot isolate — cursor boundaries under score ties,
pagination exhaustion, synonym dedup, dismax degenerate cases."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ivfadc_spark.operators.scoring import (
    dismax_topk,
    expand_synonyms,
    function_score,
    page_after,
    ranked,
    sort_by_field,
    total_hits,
)


def _scores(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "doc_id", "score"]),
        schema="query_id long, doc_id long, score double",
    )


def test_page_after_tie_boundary(spark):
    # one query, 5 docs; docs 2 and 3 tie on score -> order (score desc,
    # doc asc) is 1, 2, 3, 4, 5. Page size 2: cursor after page 1 = (0.5, 2).
    rows = [(0, 1, 0.9), (0, 2, 0.5), (0, 3, 0.5), (0, 4, 0.4), (0, 5, 0.1)]
    s = _scores(spark, rows)
    cur = spark.createDataFrame(
        [(0, 0.5, 2)], "query_id long, after_score double, after_doc long"
    )
    page2 = page_after(s, cur, k=2, offset=2).orderBy("rank").collect()
    assert [(r.rank, r.doc_id) for r in page2] == [(3, 3), (4, 4)]


def test_page_after_exhausted_and_missing_cursor(spark):
    rows = [(0, 1, 0.9), (1, 7, 0.3)]
    s = _scores(spark, rows)
    # query 0's cursor sits at its last hit -> empty page; query 1 has no
    # cursor row (never finished page 1) -> contributes nothing
    cur = spark.createDataFrame(
        [(0, 0.9, 1)], "query_id long, after_score double, after_doc long"
    )
    assert page_after(s, cur, k=5).count() == 0


def test_page_after_rounds_before_compare(spark):
    # scores differing only past 6 decimals collapse onto the cursor value:
    # the keyset must treat them as ties and use the doc_id leg
    rows = [(0, 1, 0.1000000004), (0, 2, 0.1000000001), (0, 3, 0.0999999996)]
    s = _scores(spark, rows)
    cur = spark.createDataFrame(
        [(0, 0.1, 1)], "query_id long, after_score double, after_doc long"
    )
    got = page_after(s, cur, k=5).orderBy("rank").collect()
    assert [r.doc_id for r in got] == [2, 3]


def test_total_hits_counts_all_matches(spark):
    rows = [(0, 1, 0.9), (0, 2, 0.5), (1, 1, 0.2)]
    out = {r.query_id: r.hits for r in total_hits(_scores(spark, rows)).collect()}
    assert out == {0: 2, 1: 1}


def test_sort_by_field_ignores_score(spark):
    rows = [(0, 1, 9.0), (0, 2, 0.1), (0, 3, 5.0)]
    attrs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99)], "doc_id long, n_chars long"
    )
    got = sort_by_field(_scores(spark, rows), attrs, "n_chars", k=2).orderBy(
        "rank"
    ).collect()
    # n_chars desc, doc_id tiebreak: 2 (99), 3 (99) — score never consulted
    assert [(r.rank, r.doc_id) for r in got] == [(1, 2), (2, 3)]


def test_expand_synonyms_dedupes(spark):
    qt = spark.createDataFrame(
        [(0, "merge"), (0, "join")], "query_id long, term string"
    )
    syn = spark.createDataFrame(
        [("merge", "join"), ("merge", "sort")], "term string, syn string"
    )
    got = sorted(
        (r.query_id, r.term) for r in expand_synonyms(qt, syn).collect()
    )
    # join appears once despite arriving via both the query and the map
    assert got == [(0, "join"), (0, "merge"), (0, "sort")]


def test_function_score_reranks(spark):
    rows = [(0, 1, 1.0), (0, 2, 0.6)]
    feats = spark.createDataFrame([(1, 0.0), (2, 1.0)], "doc_id long, w double")
    got = function_score(
        _scores(spark, rows), feats, F.lit(1.0) + F.col("w"), k=2
    ).orderBy("rank").collect()
    # doc 2 boosted 2x (1.2) overtakes doc 1 (1.0)
    assert [(r.rank, r.doc_id, r.score) for r in got] == [(1, 2, 1.2), (2, 1, 1.0)]


@pytest.mark.parametrize("tie,expect", [(0.0, 2.0), (1.0, 3.0), (0.5, 2.5)])
def test_dismax_limits(spark, tie, expect):
    # partials 2.0 and 1.0: tie=0 -> pure max, tie=1 -> plain sum
    parts = spark.createDataFrame(
        [(0, 1, "a", 2.0), (0, 1, "b", 1.0)],
        "query_id long, doc_id long, term string, partial double",
    )
    got = dismax_topk(parts, k=1, tie_breaker=tie).collect()
    assert got[0].score == expect


def test_ranked_offset_relabels(spark):
    # offset relabels ranks of an ALREADY-FILTERED stream (page_after cuts
    # page 1 away first): the top-k of what remains get ranks offset+1..
    rows = [(0, d, 1.0 / d) for d in range(1, 6)]
    got = ranked(_scores(spark, rows), k=2, offset=2).orderBy("rank").collect()
    assert [(r.rank, r.doc_id) for r in got] == [(3, 1), (4, 2)]


def test_collapse_keeps_best_per_group(spark):
    from ivfadc_spark.operators.scoring import collapse_topk

    # groups: docs 1,2 -> gA; docs 3,4 -> gB. Best of gA = doc 1 (0.9),
    # best of gB = doc 3 (0.7); losers 2 and 4 never reach the final rank
    # even though doc 2 (0.8) outscores doc 3.
    rows = [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.7), (0, 4, 0.1)]
    attrs = spark.createDataFrame(
        [(1, "gA"), (2, "gA"), (3, "gB"), (4, "gB")], "doc_id long, g string"
    )
    got = collapse_topk(_scores(spark, rows), attrs, "g", k=10).orderBy(
        "rank"
    ).collect()
    assert [(r.rank, r.doc_id, r.g) for r in got] == [(1, 1, "gA"), (2, 3, "gB")]


def test_collapse_group_tie_breaks_on_doc_id(spark):
    from ivfadc_spark.operators.scoring import collapse_topk

    # in-group score tie -> lowest doc_id represents the group (and scores
    # differing only past 6dp round onto the tie)
    rows = [(0, 5, 0.5000000001), (0, 2, 0.5), (0, 9, 0.4999999996)]
    attrs = spark.createDataFrame(
        [(2, "g"), (5, "g"), (9, "g")], "doc_id long, g string"
    )
    got = collapse_topk(_scores(spark, rows), attrs, "g", k=10).collect()
    assert [(r.rank, r.doc_id) for r in got] == [(1, 2)]


def test_rrf_fuse_sums_reciprocal_ranks(spark):
    from ivfadc_spark.operators.scoring import rrf_fuse

    def ranks(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["query_id", "doc_id", "rank"]),
            schema="query_id long, doc_id long, rank int",
        )

    # doc 1: rank 1 lexical + rank 2 vector = 1/61 + 1/62
    # doc 2: rank 2 lexical only = 1/62 ; doc 3: rank 1 vector only = 1/61
    lex = ranks([(0, 1, 1), (0, 2, 2)])
    vec = ranks([(0, 3, 1), (0, 1, 2)])
    got = rrf_fuse([lex, vec], k=10).orderBy("rank").collect()
    assert [(r.rank, r.doc_id) for r in got] == [(1, 1), (2, 3), (3, 2)]
    assert got[0].score == round(1 / 61 + 1 / 62, 9)
    # docs 3 and 2 differ (1/61 vs 1/62); equal-rank docs tie-break by id
    assert got[1].score == round(1 / 61, 9)


def test_rrf_fuse_single_list_is_rank_order(spark):
    from ivfadc_spark.operators.scoring import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 7, 1), (0, 3, 2), (1, 4, 1)], "query_id long, doc_id long, rank int"
    )
    got = rrf_fuse([lex], k=1).orderBy("query_id").collect()
    assert [(r.query_id, r.doc_id) for r in got] == [(0, 7), (1, 4)]


def test_rescore_window_bounds_second_stage(spark):
    from ivfadc_spark.operators.scoring import rescore_topk

    # first pass: docs 1..4 scored 4,3,2,1. window=2 -> only docs 1,2 are
    # rescorable; doc 3's huge secondary signal must NOT rescue it.
    rows = [(0, 1, 4.0), (0, 2, 3.0), (0, 3, 2.0), (0, 4, 1.0)]
    sec = spark.createDataFrame(
        [(0, 2, 5.0), (0, 3, 100.0)], "query_id long, doc_id long, sec double"
    )
    got = rescore_topk(_scores(spark, rows), sec, window=2, k=2, weight=1.0).orderBy(
        "rank"
    ).collect()
    # doc 2: 3+5=8 overtakes doc 1: 4+0 (no sec row -> 0, the ES default)
    assert [(r.rank, r.doc_id, r.score) for r in got] == [(1, 2, 8.0), (2, 1, 4.0)]


def test_rescore_weight_and_rounding(spark):
    from ivfadc_spark.operators.scoring import rescore_topk

    rows = [(0, 1, 1.0), (0, 2, 1.0)]
    sec = spark.createDataFrame(
        [(0, 1, 0.1), (0, 2, 0.3)], "query_id long, doc_id long, sec double"
    )
    got = rescore_topk(_scores(spark, rows), sec, window=10, k=2, weight=2.0).orderBy(
        "rank"
    ).collect()
    assert [(r.doc_id, r.score) for r in got] == [(2, 1.6), (1, 1.2)]


# ---------------------------------------------------------------- group_topk


def test_group_topk_max_mode_and_best_doc(spark):
    from ivfadc_spark.operators.scoring import group_topk

    # conv 0 = docs 1,2 (best 0.9); conv 1 = docs 8,9 (best 0.7, tie ->
    # lower doc_id represents the group)
    rows = [(0, 1, 0.9), (0, 2, 0.5), (0, 8, 0.7), (0, 9, 0.7)]
    attrs = spark.createDataFrame(
        [(1, 0), (2, 0), (8, 1), (9, 1)], "doc_id long, conv long"
    )
    got = group_topk(_scores(spark, rows), attrs, "conv", k=5).orderBy(
        "rank"
    ).collect()
    assert [(r.rank, r.conv, r.score, r.best_doc_id, r.n_hits) for r in got] == [
        (1, 0, 0.9, 1, 2),
        (2, 1, 0.7, 8, 2),
    ]


def test_group_topk_sum_mode_reorders(spark):
    from ivfadc_spark.operators.scoring import group_topk

    # max mode ranks conv 0 first (0.9 > 0.8); sum mode flips it
    # (0.8 + 0.8 = 1.6 > 0.9 + 0.1 = 1.0)
    rows = [(0, 1, 0.9), (0, 2, 0.1), (0, 8, 0.8), (0, 9, 0.8)]
    attrs = spark.createDataFrame(
        [(1, 0), (2, 0), (8, 1), (9, 1)], "doc_id long, conv long"
    )
    s = _scores(spark, rows)
    top_max = group_topk(s, attrs, "conv", k=1, score_mode="max").collect()[0]
    top_sum = group_topk(s, attrs, "conv", k=1, score_mode="sum").collect()[0]
    assert top_max.conv == 0 and top_sum.conv == 1 and top_sum.score == 1.6


def test_group_topk_group_tie_breaks_on_group_value(spark):
    from ivfadc_spark.operators.scoring import group_topk

    rows = [(0, 1, 0.5), (0, 8, 0.5)]
    attrs = spark.createDataFrame([(1, 7), (8, 3)], "doc_id long, conv long")
    got = group_topk(_scores(spark, rows), attrs, "conv", k=2).orderBy(
        "rank"
    ).collect()
    assert [(r.rank, r.conv) for r in got] == [(1, 3), (2, 7)]


# --------------------------------------------------------------- hit_context


def _meta(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "conv_id", "turn_idx"]),
        schema="doc_id long, conv_id long, turn_idx int",
    )


def test_hit_context_window_and_boundaries(spark):
    from ivfadc_spark.operators.scoring import hit_context

    hits = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 12)], "query_id long, rank int, doc_id long"
    )
    # conv 5: turns 0,1,2 = docs 10,11,12 — hit 10 is the FIRST turn (no
    # left neighbor), hit 12 the LAST (no right neighbor)
    meta = _meta(spark, [(10, 5, 0), (11, 5, 1), (12, 5, 2), (99, 6, 0)])
    got = hit_context(hits, meta, window=1).orderBy("doc_id", "ctx_turn_idx").collect()
    assert [(r.doc_id, r.ctx_doc_id, r.offset) for r in got] == [
        (10, 10, 0), (10, 11, 1),
        (12, 11, -1), (12, 12, 0),
    ]


def test_hit_context_window_zero_is_identity(spark):
    from ivfadc_spark.operators.scoring import hit_context

    hits = spark.createDataFrame(
        [(0, 1, 11)], "query_id long, rank int, doc_id long"
    )
    meta = _meta(spark, [(10, 5, 0), (11, 5, 1), (12, 5, 2)])
    got = hit_context(hits, meta, window=0).collect()
    assert [(r.doc_id, r.ctx_doc_id, r.offset) for r in got] == [(11, 11, 0)]


def test_hit_context_never_crosses_conversations(spark):
    from ivfadc_spark.operators.scoring import hit_context

    hits = spark.createDataFrame(
        [(0, 1, 20)], "query_id long, rank int, doc_id long"
    )
    # doc 21 is turn 1 of ANOTHER conv: adjacent doc_id, different conv
    meta = _meta(spark, [(20, 1, 0), (21, 2, 1)])
    got = hit_context(hits, meta, window=3).collect()
    assert [(r.ctx_doc_id,) for r in got] == [(20,)]


def _attrs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "g"]),
        schema="doc_id long, g string",
    )


def test_bucket_top_hits_ranks_within_bucket(spark):
    from ivfadc_spark.operators.scoring import bucket_top_hits

    # two buckets; bucket 'a' has 3 hits (only 2 survive), 'b' has 1
    rows = [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.7), (0, 4, 0.5)]
    attrs = _attrs(spark, [(1, "a"), (2, "b"), (3, "a"), (4, "a")])
    got = (
        bucket_top_hits(_scores(spark, rows), attrs, "g", per_bucket=2)
        .orderBy("g", "hit_rank")
        .collect()
    )
    assert [(r.g, r.hit_rank, r.doc_id) for r in got] == [
        ("a", 1, 1), ("a", 2, 3), ("b", 1, 2),
    ]


def test_bucket_top_hits_rounds_then_ties_on_doc_id(spark):
    from ivfadc_spark.operators.scoring import bucket_top_hits

    # scores differ only past 6dp -> tie; lower doc_id wins rank 1
    rows = [(0, 9, 0.1000000001), (0, 5, 0.1000000004)]
    attrs = _attrs(spark, [(9, "a"), (5, "a")])
    got = (
        bucket_top_hits(_scores(spark, rows), attrs, "g", per_bucket=2)
        .orderBy("hit_rank")
        .collect()
    )
    assert [r.doc_id for r in got] == [5, 9]


def test_bucket_top_hits_rank1_equals_collapse_winners(spark):
    from ivfadc_spark.operators.scoring import bucket_top_hits, collapse_topk

    # the duality: top_hits hit_rank=1 per bucket == collapse's group
    # winners (before collapse's final global re-rank)
    rows = [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.95), (0, 4, 0.5), (0, 5, 0.6)]
    attrs = _attrs(spark, [(1, "a"), (2, "b"), (3, "a"), (4, "c"), (5, "b")])
    th = {
        (r.g, r.doc_id)
        for r in bucket_top_hits(
            _scores(spark, rows), attrs, "g", per_bucket=1
        ).collect()
    }
    col = {
        r.doc_id
        for r in collapse_topk(_scores(spark, rows), attrs, "g", k=10).collect()
    }
    assert {d for _, d in th} == col


def test_diversify_keeps_n_per_group_in_one_list(spark):
    from ivfadc_spark.operators.scoring import diversify_topk

    # gA holds the 3 best docs; max_per_group=2 admits only its top two,
    # so gB's doc 4 enters the final list ahead of gA's doc 3
    rows = [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.7), (0, 4, 0.1)]
    attrs = spark.createDataFrame(
        [(1, "gA"), (2, "gA"), (3, "gA"), (4, "gB")], "doc_id long, g string"
    )
    got = diversify_topk(
        _scores(spark, rows), attrs, "g", max_per_group=2, k=10
    ).orderBy("rank").collect()
    assert [(r.rank, r.doc_id) for r in got] == [(1, 1), (2, 2), (3, 4)]


def test_diversify_with_one_per_group_equals_collapse(spark):
    from ivfadc_spark.operators.scoring import collapse_topk, diversify_topk

    rows = [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.7), (0, 4, 0.1), (1, 2, 0.5)]
    attrs = spark.createDataFrame(
        [(1, "gA"), (2, "gA"), (3, "gB"), (4, "gB")], "doc_id long, g string"
    )
    s = _scores(spark, rows)
    div = diversify_topk(s, attrs, "g", max_per_group=1, k=10)
    col = collapse_topk(s, attrs, "g", k=10)
    assert sorted(map(tuple, div.collect())) == sorted(map(tuple, col.collect()))


def test_histogram_pipeline_arithmetic(spark):
    from ivfadc_spark.operators.query import histogram_pipeline

    hist = spark.createDataFrame(
        [(0, 1, 4), (0, 2, 10), (0, 3, 1), (1, 1, 5)],
        "query_id long, bucket long, n_docs long",
    )
    got = {
        (r.query_id, r.bucket): (r.cum_docs, r.deriv, r.mavg)
        for r in histogram_pipeline(hist, mavg_window=3).collect()
    }
    # cum = running sum; deriv deltas from 0 at the first bucket; mavg
    # averages the trailing window that EXISTS (1, 2, then 3 buckets)
    assert got[(0, 1)] == (4, 4, 4.0)
    assert got[(0, 2)] == (14, 6, 7.0)
    assert got[(0, 3)] == (15, -9, 5.0)
    assert got[(1, 1)] == (5, 5, 5.0)
