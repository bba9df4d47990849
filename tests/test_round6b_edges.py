"""Oracle-edge fixtures for the round-6 second tranche — the divergence
classes past ADVICE rounds flagged (short docs, absent target slice,
zero-candidate corpora) must hash-match BEFORE the driver finds them."""

from __future__ import annotations

from spark_state_provider_spark.operators import registry
from tests.oracle import compare_query
from tests.test_advice_edges import _docs, _fixture_dir


def test_q221_no_target_slice_and_single_token_docs(spark, tmp_path):
    """A corpus with ZERO lang='en' docs (target counts all zero — the
    add-one smoothing must keep both engines aligned) plus single-token
    docs (no bigram: they must drop out of the ranking identically)."""
    rows = [
        (1, "uno dos tres cuatro cinco seis", "es", "web"),
        (2, "ein zwei drei vier", "de", "web"),
        (3, "solo", "es", "crawl"),  # single token -> no bigram
        (4, "un deux trois quatre cinq", "fr", "crawl"),
        (5, "uno dos tres cuatro", "es", "web"),
    ]
    sf = _fixture_dir(tmp_path, _docs(rows))
    compare_query(spark, sf, "q221_dsir_importance")
    got = registry.get("q221_dsir_importance").fn(spark, sf).collect()
    assert {r.doc_id for r in got} == {1, 2, 4, 5}, "single-token doc drops"


def test_q222_degenerate_documents(spark, tmp_path):
    """Empty text, symbol storms, and no-alpha docs: every rule must
    evaluate identically (both engines split '' into [''], and the
    integer cross-multiplications never divide)."""
    rows = [
        (1, "", "en", "web"),
        (2, "### ... ### ... ###", "en", "web"),
        (3, "1 2 3 4 5 6 7 8 9", "en", "crawl"),
        (4, " ".join(["the quick brown foxes and lazy dogs of winter to"] * 6), "en", "crawl"),
    ]
    sf = _fixture_dir(tmp_path, _docs(rows))
    compare_query(spark, sf, "q222_gopher_rules")
    rows_out = {
        r.source: r
        for r in registry.get("q222_gopher_rules").fn(spark, sf).collect()
    }
    # the symbol storm fails the symbol-ratio rule; the digit soup fails
    # alpha-words; the stopword-rich long doc passes everything
    assert rows_out["web"].pass_symbol_ratio < rows_out["web"].n_docs
    assert rows_out["crawl"].pass_alpha_words < rows_out["crawl"].n_docs
    assert rows_out["crawl"].n_pass_all >= 1


def test_q224_no_candidates_and_planted_twins(spark, tmp_path):
    """A corpus with no banded candidates yields an EMPTY calibration on
    both engines (no divide-by-zero row); planting exact twins yields the
    8/8 bucket with pooled Jaccard 1.0."""
    distinct = [
        (i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}", "en", "web")
        for i in range(1, 7)
    ]
    sf = _fixture_dir(tmp_path, _docs(distinct))
    compare_query(spark, sf, "q224_minhash_calibration")
    assert registry.get("q224_minhash_calibration").fn(spark, sf).count() == 0

    twin = "big value scan part hash filter spark fast join group slow"
    rows = distinct + [(100, twin, "en", "web"), (101, twin, "en", "crawl")]
    sub = tmp_path / "t2"
    sub.mkdir()
    sf2 = _fixture_dir(sub, _docs(rows))
    compare_query(spark, sf2, "q224_minhash_calibration")
    out = {
        r.matches: r
        for r in registry.get("q224_minhash_calibration").fn(spark, sf2).collect()
    }
    assert 8 in out and out[8].pooled_jaccard == 1.0
    assert out[8].band_capture_prob == 1.0
