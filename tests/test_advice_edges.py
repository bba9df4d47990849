"""Edge-case regression tests for the round-5 ADVICE findings: divergences
that the stock fixtures masked (min text length 47, bounded n_chars, a
corpus that always contains near-dups). Each test builds a tiny synthetic
``documents`` table that hits the edge and asserts Spark == DuckDB the same
way the driver does."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from spark_state_provider_spark import operators
from tests.oracle import compare_query

operators.load_all()

SF_SRC = os.environ.get("SSPS_TEST_SF_DIR", "/root/testdata/sf0.001")

_OTHER_TABLES = (
    "region nation customer supplier part orders lineitem events embeddings"
).split()


def _fixture_dir(tmp_path, docs: pd.DataFrame) -> str:
    """An sf-dir clone: real parquet for every table except a synthetic
    ``documents``. Symlinks keep it cheap; DuckDB's view binder needs all
    ten files present."""
    d = tmp_path / "sf_edge"
    d.mkdir()
    for t in _OTHER_TABLES:
        os.symlink(os.path.join(SF_SRC, f"{t}.parquet"), d / f"{t}.parquet")
    docs.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _docs(rows) -> pd.DataFrame:
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df["text"].str.len().astype("int64")
    df["doc_id"] = df["doc_id"].astype("int64")
    return df


def test_q211_short_docs_agree(spark, tmp_path):
    """Docs shorter than 3 chars produce no trigrams but MUST still appear
    in the scored output (all-zero scores, alphabetic-first argmax) on
    both engines — the pre-fix Spark side dropped them entirely."""
    docs = _docs(
        [
            (1, "a", "en", "web"),
            (2, "of", "en", "web"),
            (3, "", "de", "web"),
            (4, "the cat and the dog and the bird went over there", "en", "web"),
            (5, "der hund und die katze und der vogel sind da oben", "de", "web"),
        ]
    )
    compare_query(spark, _fixture_dir(tmp_path, docs), "q211_profile_lang_id")


def test_q206_duplicate_free_corpus_agrees(spark, tmp_path):
    """With zero true near-dup pairs, recall is NULL on BOTH engines (the
    unguarded 0/0 divided differently per engine)."""
    docs = _docs(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota", "en", "web"),
            (2, "one two three four five six seven eight nine ten!!", "en", "web"),
            (3, "zxcvbnm asdfghjkl qwertyuiop 0123456789 plmoknijb", "en", "web"),
        ]
    )
    sf = _fixture_dir(tmp_path, docs)
    compare_query(spark, sf, "q206_lsh_dedup_recall")
    from spark_state_provider_spark.operators import registry

    row = registry.get("q206_lsh_dedup_recall").fn(spark, sf).collect()[0]
    assert row.n_true == 0 and row.recall is None


def test_q213_survivor_beyond_packed_bounds(spark, tmp_path):
    """n_chars far above the old 999 999 packing bound and huge doc_ids:
    the struct argmin must still pick the longest member (tie → lowest
    id) and match the oracle. The pre-fix packed integer went negative
    here."""
    long_a = "the quick brown fox jumps over the lazy dog " * 40
    # one extra repeat: trigram SET is near-identical (Jaccard ≈ 1) but the
    # text is strictly longer, so this member must win survivorship
    long_b = long_a + "the quick brown fox jumps over the lazy dog"
    docs = _docs(
        [
            # one near-dup cluster; member 20000000001 is longest
            (10_000_000_007, long_a, "en", "web"),
            (20_000_000_001, long_b, "en", "crawl"),
            (30_000_000_003, long_a, "en", "web"),
            # a singleton far away in content space
            (4, "zxcvbnm asdfghjkl qwertyuiop 0123456789 plmoknijb", "en", "web"),
        ]
    )
    # inflate n_chars beyond the old packing assumption while keeping the
    # relative order (longest text still has the max n_chars)
    docs["n_chars"] = docs["n_chars"] + 5_000_000
    sf = _fixture_dir(tmp_path, docs)
    compare_query(spark, sf, "q213_golden_record")
    from spark_state_provider_spark.operators import registry

    rows = registry.get("q213_golden_record").fn(spark, sf).collect()
    by_members = {r.n_members: r for r in rows}
    assert by_members[3].survivor_id == 20_000_000_001
    assert by_members[3].canonical_id == 10_000_000_007


def test_q218_funnel_zero_tail_agrees(spark, tmp_path):
    """A corpus where every document dies at the LM gate (too short for
    trigrams, or out-of-distribution): the funnel's tail stages are all
    zero and the conditional token sums must not go NULL on either
    engine."""
    docs = _docs(
        [
            # 'de'-labeled empty/short docs: the zero-score argmax predicts
            # 'de' (alphabetic first), so lang QA PASSES them — then the
            # LM gate must kill them (no trigrams -> left-join null)
            (1, "", "de", "web"),
            (2, "xy", "de", "web"),
            # a marker-bearing doc whose label disagrees dies at lang QA
            (3, "the cat and the dog and the bird went over there", "fr", "web"),
        ]
    )
    sf = _fixture_dir(tmp_path, docs)
    compare_query(spark, sf, "q218_curation_pipeline")
    from spark_state_provider_spark.operators import registry

    rows = {
        r.stage_name: r
        for r in registry.get("q218_curation_pipeline").fn(spark, sf).collect()
    }
    assert rows["all"].n_docs == 3
    assert rows["lang_qa"].n_docs == 2  # the two 'de' zero-score docs
    for st in ("lm_filter", "repetition", "classifier", "dedup"):
        assert rows[st].n_docs == 0 and rows[st].n_tokens == 0
