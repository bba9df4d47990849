"""Round-8 adds: span-removal corpus rewrite (q231), dedup-impact report
(q232), streaming span removal at ingest (q233), and the strided
candidate path of the shared anchor-run helper. Cross-engine agreement is
covered by test_full_registry_oracle; these tests pin the SEMANTICS on
constructed corpora where the expected answer is known by hand."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from spark_state_provider_spark.operators.dedup import (
    _SUB_K,
    _SUB_MIN,
    _substring_runs,
)
from tests.oracle import compare_query
from tests.test_advice_edges import SF_SRC, _docs, _fixture_dir

operators.load_all()


def _run(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir)


# A 60-char span shared verbatim by three docs; doc 1 is id-earliest and
# must keep it, docs 2 and 3 must lose exactly that span. Doc 4 is
# untouched; doc 5 is an exact clone of doc 4 (loses EVERYTHING).
_SHARED = "the quick brown fox jumps over the lazy dog again and again" + "!"
_PRE2, _POST2 = "doc two starts differently here then quotes: ", " and ends."
_UNIQ4 = "totally unrelated content that nobody else shares in any way four"


def _span_corpus():
    return _docs(
        [
            (1, f"intro one. {_SHARED} outro one.", "en", "web"),
            (2, f"{_PRE2}{_SHARED}{_POST2}", "en", "web"),
            (3, _SHARED, "en", "web"),
            (4, _UNIQ4, "en", "web"),
            (5, _UNIQ4, "en", "web"),
        ]
    )


def test_q231_hand_corpus_exact_surgery(spark, tmp_path):
    sf = _fixture_dir(tmp_path, _span_corpus())
    out = {r.doc_id: r for r in _run(spark, sf, "q231_span_removal_rewrite").collect()}
    assert len(out) == 5
    # doc 1: id-earliest sharer keeps the span verbatim
    assert out[1].removed_chars == 0
    assert out[1].cleaned_text == f"intro one. {_SHARED} outro one."
    # doc 2 loses the MAXIMAL shared span — both docs surround the quote
    # with spaces, so the space before and after are part of the shared
    # substring and go with it
    assert out[2].cleaned_text == _PRE2[:-1] + _POST2[1:]
    assert out[2].removed_chars == len(_SHARED) + 2
    assert out[3].cleaned_text == ""
    assert out[3].removed_chars == len(_SHARED)
    # doc 4 keeps, its id-later exact clone 5 is erased
    assert out[4].removed_chars == 0 and out[4].cleaned_text == _UNIQ4
    assert out[5].cleaned_text == "" and out[5].removed_chars == len(_UNIQ4)
    # cross-engine on the same corpus
    compare_query(spark, sf, "q231_span_removal_rewrite")


def test_q231_length_conservation_on_stock_corpus(spark):
    """kept + removed == original length for every doc (the surgery cuts
    exactly the merged intervals, nothing else)."""
    docs = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{SF_SRC}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    for r in _run(spark, SF_SRC, "q231_span_removal_rewrite").collect():
        assert len(r.cleaned_text) + r.removed_chars == docs[r.doc_id], r


def test_q233_removes_only_corpus_shared_spans(spark, tmp_path):
    """Incoming docs (id % 5 == 0) lose spans shared with the CORPUS
    (id % 5 != 0) but NOT spans shared only with other incoming docs."""
    shared_inc = "incoming docs share this long phrase between themselves!!"
    assert len(shared_inc) >= _SUB_MIN
    corpus_span = _SHARED
    rows = _docs(
        [
            (1, f"corpus doc holding: {corpus_span}", "en", "web"),
            (5, f"alpha {corpus_span} omega {shared_inc}", "en", "web"),
            (10, f"beta {shared_inc} gamma unique tail here", "en", "web"),
            (7, "another corpus doc, wholly unrelated text.", "en", "web"),
        ]
    )
    sf = _fixture_dir(tmp_path, rows)
    out = {r.doc_id: r for r in _run(spark, sf, "q233_stream_span_removal").collect()}
    assert set(out) == {5, 10}
    # doc 5 loses the corpus span only (maximal: the shared leading space
    # goes with it) — the inc-shared phrase survives
    assert out[5].cleaned_text == f"alpha omega {shared_inc}"
    assert out[5].removed_chars == len(corpus_span) + 1
    # doc 10 shares nothing with the corpus — untouched
    assert out[10].removed_chars == 0
    compare_query(spark, sf, "q233_stream_span_removal")


def test_q232_substring_row_ties_to_q231(spark):
    """The report's substring row must equal q231's aggregate — the
    report is a composition, not a re-derivation."""
    rep = {
        r.family: r for r in _run(spark, SF_SRC, "q232_dedup_impact_report").collect()
    }
    assert set(rep) == {"exact", "near", "substring", "semantic"}
    rw = _run(spark, SF_SRC, "q231_span_removal_rewrite")
    agg = rw.agg(
        F.sum(F.when(F.col("removed_chars") > 0, 1)).alias("d"),
        F.sum("removed_chars").alias("c"),
    ).collect()[0]
    assert rep["substring"].docs_affected == (agg.d or 0)
    assert rep["substring"].chars_removed == (agg.c or 0)
    # exact row: docs_affected == total docs − distinct texts
    docs = spark.read.parquet(f"{SF_SRC}/documents.parquet")
    n, nd = docs.count(), docs.select("text").distinct().count()
    assert rep["exact"].docs_affected == n - nd


def test_strided_runs_equal_dense(spark):
    """stride ≤ MIN − K + 1 must be output-equivalent to the dense plan
    (the detect-at-(K+stride−1) guarantee) at the reporting threshold."""
    stride = _SUB_MIN - _SUB_K + 1

    def lcs(stride_arg):
        r = _substring_runs(spark, SF_SRC, stride=stride_arg)
        return sorted(
            map(
                tuple,
                r.groupBy("doc_a", "doc_b")
                .agg(
                    (F.lit(_SUB_K) + F.max("run") - F.lit(1))
                    .cast("long")
                    .alias("lcs_len")
                )
                .where(F.col("lcs_len") >= _SUB_MIN)
                .collect(),
            )
        )

    dense, strided = lcs(None), lcs(stride)
    assert dense, "stock corpus must contain reportable pairs"
    assert dense == strided
    # stride=1 must degenerate to the dense plan (residue-0 lattice,
    # round-8 ADVICE: the old residue-1 lattice silently emitted an
    # EMPTY candidate set at stride=1, dropping every reportable pair)
    assert lcs(1) == dense


def test_stride_guard_rejects_unsound_stride(spark):
    with pytest.raises(AssertionError):
        _substring_runs(spark, SF_SRC, stride=_SUB_MIN - _SUB_K + 2)
    with pytest.raises(AssertionError):
        _substring_runs(spark, SF_SRC, stride=0)


# ---------------------------------------------------------------------------
# q234 — decontamination rewrite
# ---------------------------------------------------------------------------


def test_q234_cuts_benchmark_collisions_only(spark, tmp_path):
    """Tokens covered by a benchmark trigram are cut (merged across
    overlapping hits); clean docs pass through; benchmark docs are not
    emitted."""
    rows = _docs(
        [
            (97, "alpha beta gamma delta", "en", "bench"),
            (1, "x alpha beta gamma delta y", "en", "web"),
            (2, "nothing shared here at all", "en", "web"),
        ]
    )
    sf = _fixture_dir(tmp_path, rows)
    out = {
        r.doc_id: r
        for r in _run(spark, sf, "q234_decontamination_rewrite").collect()
    }
    assert set(out) == {1, 2}
    # doc 1: positions 2-4 and 3-5 hit -> merged [2,5] -> 4 tokens cut
    assert out[1].cleaned_text == "x y"
    assert out[1].removed_tokens == 4
    assert out[2].removed_tokens == 0
    assert out[2].cleaned_text == "nothing shared here at all"
    compare_query(spark, sf, "q234_decontamination_rewrite")


# ---------------------------------------------------------------------------
# q235 — post-rewrite residual audit (non-idempotence is REAL: cutting a
# span can concatenate its flanks into a brand-new duplicate)
# ---------------------------------------------------------------------------

_X = "ABCDEFGHIJKLMNOPQRST"          # 20 chars — below threshold alone
_Y = "UVWXYZabcdefghijklmn"          # 20 chars — below threshold alone
_S = "the#shared#secret#span#goes#right#here!!"  # 40 chars — above


def test_q235_detects_rewrite_created_duplicate(spark, tmp_path):
    assert len(_S) >= _SUB_MIN and len(_X + _Y) >= _SUB_MIN
    rows = _docs(
        [
            (1, f"zzz {_S} qqq", "en", "web"),   # id-earliest S holder
            (2, _X + _Y, "en", "web"),            # already X+Y
            (3, _X + _S + _Y, "en", "web"),       # loses S -> becomes X+Y
        ]
    )
    sf = _fixture_dir(tmp_path, rows)
    # sanity: the rewrite cuts exactly S from doc 3
    rw = {
        r.doc_id: r
        for r in _run(spark, sf, "q231_span_removal_rewrite").collect()
    }
    assert rw[3].cleaned_text == _X + _Y
    assert rw[3].removed_chars == len(_S)
    assert rw[2].removed_chars == 0
    # the audit sees the NEW duplicate the rewrite manufactured
    audit = _run(spark, sf, "q235_rewrite_residual_audit").collect()[0]
    assert audit.n_residual_pairs == 1
    assert audit.max_residual_lcs == len(_X + _Y)
    assert audit.n_docs_needing_pass2 == 1
    compare_query(spark, sf, "q235_rewrite_residual_audit")


def test_q235_converges_on_stock_corpus(spark):
    """The driver corpus deduplicates in ONE pass (residual 0) — pinned
    so a plan change that breaks the surgery shows up here first."""
    audit = _run(spark, SF_SRC, "q235_rewrite_residual_audit").collect()[0]
    assert audit.n_residual_pairs == 0
    assert audit.max_residual_lcs == 0


def test_q236_streaming_matches_q234_on_incoming(spark, tmp_path):
    """The ingest twin must equal the batch rewrite restricted to the
    incoming slice (benchmark docs excluded), on a corpus where the
    collision is known by hand."""
    rows = _docs(
        [
            (97, "alpha beta gamma delta", "en", "bench"),
            (5, "x alpha beta gamma delta y", "en", "web"),       # incoming
            (10, "nothing shared here at all", "en", "web"),      # incoming
            (3, "alpha beta gamma in corpus too", "en", "web"),   # NOT incoming
        ]
    )
    sf = _fixture_dir(tmp_path, rows)
    out = {
        r.doc_id: r
        for r in _run(spark, sf, "q236_stream_decontamination").collect()
    }
    assert set(out) == {5, 10}
    assert out[5].cleaned_text == "x y" and out[5].removed_tokens == 4
    assert out[10].removed_tokens == 0
    batch = {
        r.doc_id: r
        for r in _run(spark, sf, "q234_decontamination_rewrite").collect()
        if r.doc_id % 5 == 0
    }
    assert {k: (v.cleaned_text, v.removed_tokens) for k, v in out.items()} == {
        k: (v.cleaned_text, v.removed_tokens) for k, v in batch.items()
    }
    compare_query(spark, sf, "q236_stream_decontamination")


def test_q237_pass2_removes_manufactured_duplicate(spark, tmp_path):
    """On the q235 non-idempotence corpus, pass 2 must erase the X+Y
    duplicate pass 1 manufactured in doc 3 (doc 2 keeps: lower id)."""
    rows = _docs(
        [
            (1, f"zzz {_S} qqq", "en", "web"),
            (2, _X + _Y, "en", "web"),
            (3, _X + _S + _Y, "en", "web"),
        ]
    )
    sf = _fixture_dir(tmp_path, rows)
    out = {
        r.doc_id: r
        for r in _run(spark, sf, "q237_iterative_span_removal").collect()
    }
    assert out[1].removed_pass1 == 0 and out[1].removed_pass2 == 0
    assert out[2].removed_pass1 == 0 and out[2].removed_pass2 == 0
    assert out[2].cleaned_text == _X + _Y
    # doc 3: pass 1 cut S, pass 2 cut the X+Y residue entirely
    assert out[3].removed_pass1 == len(_S)
    assert out[3].removed_pass2 == len(_X + _Y)
    assert out[3].cleaned_text == ""
    compare_query(spark, sf, "q237_iterative_span_removal")


def test_q237_pass2_noop_on_stock_corpus(spark):
    """Stock corpus converges in one pass (q235's pinned 0 residual), so
    pass 2 must remove nothing and pass-1 totals must equal q231's."""
    out = _run(spark, SF_SRC, "q237_iterative_span_removal")
    agg = out.agg(
        F.sum("removed_pass1").alias("p1"), F.sum("removed_pass2").alias("p2")
    ).collect()[0]
    assert agg.p2 == 0
    q231 = _run(spark, SF_SRC, "q231_span_removal_rewrite")
    assert agg.p1 == q231.agg(F.sum("removed_chars")).collect()[0][0]
