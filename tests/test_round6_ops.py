"""Round-6 operators: the composed curation funnel (q218)."""

from __future__ import annotations

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from tests.oracle import compare_query

operators.load_all()


def test_q218_matches_oracle(spark, sf_dir):
    compare_query(spark, sf_dir, "q218_curation_pipeline")


def test_q218_funnel_is_monotone_and_bites(spark, sf_dir):
    rows = (
        registry.get("q218_curation_pipeline")
        .fn(spark, sf_dir)
        .orderBy("stage")
        .collect()
    )
    assert [r.stage_name for r in rows] == [
        "all", "lang_qa", "lm_filter", "repetition", "classifier", "dedup",
    ]
    docs = [r.n_docs for r in rows]
    toks = [r.n_tokens for r in rows]
    # each stage can only remove documents/tokens, never add
    assert all(a >= b for a, b in zip(docs, docs[1:])), docs
    assert all(a >= b for a, b in zip(toks, toks[1:])), toks
    # the funnel must actually BITE: at least three gates strictly drop
    # docs on the stock corpus (lang QA, LM filter, classifier), and
    # something must survive the whole chain
    assert sum(1 for a, b in zip(docs, docs[1:]) if a > b) >= 3, docs
    assert docs[-1] > 0
    # token accounting is consistent with doc accounting at the ends
    assert toks[0] > toks[-1] > 0
