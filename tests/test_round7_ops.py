"""Round-7 adds: hybrid RRF fusion (q225), suffix-anchor exact-substring
LCS (q226), packing-aware contamination (q227). Cross-engine agreement is
covered by test_full_registry_oracle; these tests pin the SEMANTICS on
constructed corpora where the expected answer is known by hand."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from tests.oracle import compare_query
from tests.test_advice_edges import SF_SRC, _docs, _fixture_dir

operators.load_all()


def _run(spark, sf_dir, name):
    return registry.get(name).fn(spark, sf_dir)


# ---------------------------------------------------------------------------
# q225 — hybrid RRF fusion
# ---------------------------------------------------------------------------


def test_q225_fusion_scores_and_membership(spark):
    """Every fused doc must come from at least one leg, docs present in
    BOTH legs must score the sum of both reciprocal terms, and the
    top-ranked doc must hold the maximal score."""
    rows = _run(spark, SF_SRC, "q225_hybrid_rrf_fusion").collect()
    assert rows, "fusion must produce rows on the stock corpus"
    for r in rows:
        assert r.sparse_rn is not None or r.dense_rn is not None
        expect = 0.0
        if r.sparse_rn is not None:
            expect += 1.0 / (60.0 + float(r.sparse_rn))
        if r.dense_rn is not None:
            expect += 1.0 / (60.0 + float(r.dense_rn))
        assert r.rrf_score == pytest.approx(expect, abs=0.0), r
    ordered = sorted(rows, key=lambda r: r.rn)
    scores = [r.rrf_score for r in ordered]
    assert scores == sorted(scores, reverse=True)
    # both-leg docs outrank single-leg docs of comparable depth: a doc at
    # rank 1 in both legs beats any single-leg doc (1/61+1/61 > 1/61)
    both = [r for r in rows if r.sparse_rn is not None and r.dense_rn is not None]
    if both:
        best_both = min(both, key=lambda r: r.rn)
        single_better = [
            r for r in rows
            if (r.sparse_rn is None) != (r.dense_rn is None)
            and r.rrf_score > best_both.rrf_score
        ]
        for s in single_better:
            leg = s.sparse_rn if s.sparse_rn is not None else s.dense_rn
            assert 1.0 / (60.0 + leg) > best_both.rrf_score


# ---------------------------------------------------------------------------
# q226 — exact-substring LCS via sorted anchors
# ---------------------------------------------------------------------------


def test_q226_lcs_exact_on_constructed_pair(spark, tmp_path):
    """Two docs sharing one exactly-known substring: lcs_len must be the
    substring's exact character length (anchor-run arithmetic, no
    off-by-one at either end)."""
    shared = "zqv kwx jrt plm nbd fgh yus eio"  # 31 chars, rare tokens
    assert len(shared) == 31
    docs = _docs(
        [
            (1, "alpha beta " + shared + " gamma delta", "en", "a"),
            (2, "omega " + shared + " psi chi phi", "en", "b"),
            # a pair ABOVE the 32-char report floor
            (3, "xx " + shared + " extraa yy", "en", "a"),
            (4, "qq " + shared + " extraa zz", "en", "b"),
            (5, "nothing in common here at all truly", "en", "c"),
        ]
    )
    sf = _fixture_dir(tmp_path, docs)
    got = {(r.doc_a, r.doc_b): r.lcs_len for r in _run(spark, sf, "q226_substring_lcs_dedup").collect()}
    # docs 3/4 share ' ' + shared + ' extraa ' (trailing space is shared
    # too: ' yy' vs ' zz' both open with a space) = 1 + 31 + 8 = 40
    assert got.get((3, 4)) == 1 + 31 + 8
    # docs 1/2 share 'a ' + shared + ' ' ('beta '/'omega ' both end in
    # 'a ') = 2 + 31 + 1 = 34
    assert got.get((1, 2)) == 34
    # doc 5 shares nothing ≥ 32 chars with anyone
    assert not any(5 in k for k in got)
    compare_query(spark, sf, "q226_substring_lcs_dedup")


def test_q226_below_anchor_width_invisible(spark, tmp_path):
    """A shared substring shorter than the 32-char report floor must not
    be reported, even when well above the 16-char anchor width."""
    shared20 = "abcdefghij klmnopqrs"  # 20 chars
    docs = _docs(
        [
            (1, "left pad " + shared20 + " right padding x", "en", "a"),
            (2, "other pad " + shared20 + " different tail y", "en", "b"),
        ]
    )
    sf = _fixture_dir(tmp_path, docs)
    assert _run(spark, sf, "q226_substring_lcs_dedup").count() == 0
    compare_query(spark, sf, "q226_substring_lcs_dedup")


# ---------------------------------------------------------------------------
# q227 — packing-aware contamination
# ---------------------------------------------------------------------------


def test_q227_straddle_arithmetic(spark, tmp_path):
    """A corpus built so one contaminated trigram is KNOWN to straddle the
    512-token pack boundary: n_straddling must count exactly it. All docs
    share one md5 bucket? No — buckets are md5-chosen; instead the corpus
    is sized so every bucket's stream fits in pack 0 except one straddler
    we position explicitly by padding its bucket."""
    # benchmark doc (doc_id 0 ≡ 0 mod 97) carrying the marker trigram
    marker = "mq zj xv"
    rows = [(0, "prefix " + marker + " suffix", "en", "bench")]
    # find two train doc_ids in the SAME bucket (md5 nibble) so we can pad
    # the stream: filler doc with 510 tokens, then the contaminated doc
    # whose marker lands at stream offset ≥ 510 → straddles 512.
    import hashlib

    def bucket(i):
        return hashlib.md5(str(i).encode()).hexdigest()[0]

    def hkey(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    # pick ids: same bucket, filler sorts BEFORE carrier by (hkey, doc_id)
    pairs = {}
    pick = None
    for i in range(1, 400):
        if i % 97 == 0:
            continue
        b = bucket(i)
        if b in pairs:
            j = pairs[b]
            lo, hi = sorted([i, j], key=lambda x: (hkey(x), x))
            pick = (lo, hi)
            break
        pairs[b] = i
    assert pick, "need two same-bucket ids"
    filler_id, carrier_id = pick
    filler = " ".join(f"w{k}" for k in range(510))  # 510 tokens
    # carrier: token offsets 510.. ; marker tokens at local idx 1,2,3
    # → absolute 511,512,513 → trigram at [511,513] straddles 512
    carrier = "pad " + marker + " tail tokens here"
    rows += [
        (filler_id, filler, "en", "train"),
        (carrier_id, carrier, "en", "train"),
    ]
    docs = _docs(rows)
    sf = _fixture_dir(tmp_path, docs)
    out = {r.bucket: r for r in _run(spark, sf, "q227_packing_contamination").collect()}
    b = bucket(carrier_id)
    assert b in out, "carrier bucket must report contamination"
    row = out[b]
    # marker occurs once in the carrier; trigram [511,513] crosses 512
    assert row.n_straddling == 1, row
    assert row.n_contam_occ >= 1
    compare_query(spark, sf, "q227_packing_contamination")


def test_q227_no_false_straddle_when_inside_pack(spark, tmp_path):
    """Same construction but the marker fully inside pack 0 — zero
    straddles, one occurrence."""
    marker = "mq zj xv"
    docs = _docs(
        [
            (0, "prefix " + marker + " suffix", "en", "bench"),
            (5, "pad " + marker + " tail", "en", "train"),
        ]
    )
    sf = _fixture_dir(tmp_path, docs)
    out = _run(spark, sf, "q227_packing_contamination").collect()
    assert sum(r.n_straddling for r in out) == 0
    assert sum(r.n_contam_occ for r in out) == 1
    compare_query(spark, sf, "q227_packing_contamination")


# ---------------------------------------------------------------------------
# q228 — MRR / nDCG fixed-point metrics
# ---------------------------------------------------------------------------


def _emb_fixture_dir(tmp_path, emb: pd.DataFrame) -> str:
    import os

    d = tmp_path / "sf_emb228"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        os.symlink(os.path.join(SF_SRC, f"{t}.parquet"), d / f"{t}.parquet")
    emb.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def test_q228_metrics_exact_on_constructed_ranking(spark, tmp_path):
    """Query 0 with a KNOWN top-5 relevance pattern [0,1,0,1,1]:
    dcg = D2+D4+D5, first relevant at rank 2 → mrr 500000, 3 relevant
    in the pool → idcg = P[3]."""
    import numpy as np

    rows = []

    def vec(hot, mag=1.0, extra=None):
        v = np.zeros(64, dtype="float32")
        v[hot] = mag
        if extra is not None:
            v[extra[0]] = extra[1]
        return v.tolist()

    # 10 query vectors on basis dims 0..9 (N_QUERIES convention)
    for q in range(10):
        rows.append((q, vec(q), 1 if q == 0 else 100 + q))
    # 5 candidates with strictly decreasing cosine to query 0 and the
    # relevance pattern [0,1,0,1,1] w.r.t. label 1
    sims = [0.9, 0.8, 0.7, 0.6, 0.5]
    labels = [2, 1, 2, 1, 1]
    for k, (s, lab) in enumerate(zip(sims, labels)):
        ortho = float(np.sqrt(1.0 - s * s))
        v = np.zeros(64, dtype="float32")
        v[0] = s
        v[20 + k] = ortho
        rows.append((10 + k, v.tolist(), lab))
    emb = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    emb["vec_id"] = emb["vec_id"].astype("int64")
    emb["label"] = emb["label"].astype("int32")
    sf = _emb_fixture_dir(tmp_path, emb)
    out = {r.query_id: r for r in _run(spark, sf, "q228_retrieval_metrics").collect()}
    r0 = out[0]
    assert r0.first_rel_rank == 2
    assert r0.mrr_fp == 500000
    assert r0.dcg_fp == 630930 + 430677 + 386853
    assert r0.n_rel == 3
    assert r0.idcg_fp == 2130930  # P[3]
    assert r0.ndcg == pytest.approx(r0.dcg_fp / r0.idcg_fp, abs=0.0)
    compare_query(spark, sf, "q228_retrieval_metrics")


# ---------------------------------------------------------------------------
# q229 — MaxP chunk retrieval
# ---------------------------------------------------------------------------


def test_q229_dense_chunk_beats_scattered_terms(spark, tmp_path):
    """A doc whose query terms co-occur inside ONE 32-token chunk must
    outrank a doc with the same terms scattered one-per-chunk — the MaxP
    property whole-doc BM25 cannot express (doc-level tf is identical)."""
    filler = ["lorem"] * 100
    dense = filler + ["spark", "table", "hash"] + filler
    scattered = (
        ["spark"] + filler[:40] + ["table"] + filler[:40] + ["hash"] + filler
    )
    docs = _docs(
        [
            (1, " ".join(dense), "en", "a"),
            (2, " ".join(scattered), "en", "b"),
            (3, " ".join(filler), "en", "c"),
        ]
    )
    sf = _fixture_dir(tmp_path, docs)
    rows = {r.doc_id: r for r in _run(spark, sf, "q229_maxp_chunk_retrieval").collect()}
    assert 1 in rows and 2 in rows, "both term-bearing docs must rank"
    assert rows[1].rn < rows[2].rn, "co-occurring chunk must win MaxP"
    assert 3 not in rows, "term-free doc must not appear"
    compare_query(spark, sf, "q229_maxp_chunk_retrieval")


# ---------------------------------------------------------------------------
# q230 — streaming incremental substring dedup
# ---------------------------------------------------------------------------


def test_q230_spans_batches_and_matches_batch_form(spark):
    """The drained stream must report pairs for incoming docs from BOTH
    micro-batches (docs split by doc_id order, so hits from only one
    half would mean a batch was dropped), and each reported pair must be
    new-doc × corpus-doc (never corpus×corpus or new×new)."""
    rows = _run(spark, SF_SRC, "q230_stream_substring_dedup").collect()
    assert rows, "stock corpus has planted near-dups; stream must find them"
    from spark_state_provider_spark.operators.dedup import _INC_MOD

    for r in rows:
        assert r.doc_id % _INC_MOD == 0, "left side must be an incoming doc"
        assert r.corpus_doc % _INC_MOD != 0, "right side must be corpus"
    compare_query(spark, SF_SRC, "q230_stream_substring_dedup")
