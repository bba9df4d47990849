"""Round-9 additions: semantic contamination detection (q238, batch;
q241, at-ingest twin), the cross-snapshot incremental decontamination
ledger (q239), and the span-removal provenance table (q240). Each test
builds a constructed fixture with a KNOWN answer and asserts both the
semantic claim and full Spark==DuckDB agreement (compare_query), the
driver's own check."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from tests.oracle import compare_query
from tests.test_advice_edges import SF_SRC, _docs, _fixture_dir

operators.load_all()


def _emb_dir(tmp_path, emb: pd.DataFrame) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf_emb9"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events"
        " documents"
    ).split():
        os.symlink(os.path.join(SF_SRC, f"{t}.parquet"), d / f"{t}.parquet")
    # float32 list column, matching the stock table (the streaming reader
    # binds EMB_SCHEMA strictly; pandas-inferred DOUBLE lists fail it)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(emb, schema=schema, preserve_index=False),
        d / "embeddings.parquet",
    )
    return str(d)


def _unit(hot: int, dim: int = 64) -> list[float]:
    v = np.zeros(dim, dtype="float32")
    v[hot] = 1.0
    return v.tolist()


def _blend(hot: int, cos: float, ortho: int, dim: int = 64) -> list[float]:
    """Unit vector with cosine ``cos`` to basis vector ``hot``."""
    v = np.zeros(dim, dtype="float32")
    v[hot] = cos
    v[ortho] = float(np.sqrt(1.0 - cos * cos))
    return v.tolist()


# ---------------------------------------------------------------------------
# q238 — semantic contamination
# ---------------------------------------------------------------------------


def test_q238_flags_paraphrase_neighbors_only(spark, tmp_path):
    """vec 1 sits at cosine 0.9 to benchmark vec 0 (% 97 == 0) → flagged
    with matched_benchmark 0; vec 2 is orthogonal → clean; vec 97 is
    itself benchmark → never emitted; the best benchmark wins the
    argmax when two clear τ."""
    emb = pd.DataFrame(
        {
            "vec_id": pd.array([0, 97, 1, 2, 3], dtype="int64"),
            "embedding": [
                _unit(0),          # benchmark A
                _unit(1),          # benchmark B
                _blend(0, 0.9, 5),  # near benchmark A
                _unit(2),          # orthogonal to both
                # clears tau against BOTH benchmarks; closer to B
                [
                    float(x)
                    for x in (
                        0.5 * np.eye(64, dtype="float32")[0]
                        + 0.6 * np.eye(64, dtype="float32")[1]
                        + 0.62 * np.eye(64, dtype="float32")[6]
                    )
                ],
            ],
            "label": pd.array([0, 0, 1, 1, 1], dtype="int32"),
        }
    )
    sf = _emb_dir(tmp_path, emb)
    compare_query(spark, sf, "q238_semantic_contamination")
    rows = {
        r.vec_id: r
        for r in registry.get("q238_semantic_contamination")
        .fn(spark, sf)
        .collect()
    }
    assert set(rows) == {1, 3}
    assert rows[1].matched_benchmark == 0 and rows[1].sim > 0.89
    assert rows[3].matched_benchmark == 97  # 0.6 > 0.5: B wins the argmax


def test_q241_ingest_twin_equals_batch_gate(spark, tmp_path):
    """The streaming gate's union over micro-batches must equal q238's
    batch answer row-for-row (stateless per-batch semantics)."""
    emb = pd.DataFrame(
        {
            "vec_id": pd.array([0, 1, 2, 3, 4], dtype="int64"),
            "embedding": [
                _unit(0),
                _blend(0, 0.95, 5),
                _blend(0, 0.5, 6),
                _unit(3),
                _blend(0, 0.34, 7),  # just under tau — must stay clean
            ],
            "label": pd.array([0, 1, 1, 1, 1], dtype="int32"),
        }
    )
    sf = _emb_dir(tmp_path, emb)
    compare_query(spark, sf, "q241_stream_semantic_decontamination")
    batch = sorted(
        map(
            tuple,
            registry.get("q238_semantic_contamination")
            .fn(spark, sf)
            .collect(),
        )
    )
    stream = sorted(
        map(
            tuple,
            registry.get("q241_stream_semantic_decontamination")
            .fn(spark, sf)
            .collect(),
        )
    )
    assert batch == stream
    assert [t[0] for t in batch] == [1, 2]  # 0.95 and 0.5 clear τ=0.35


# ---------------------------------------------------------------------------
# q239 — incremental decontamination ledger
# ---------------------------------------------------------------------------


def test_q239_surgery_labels_and_verdicts(spark, tmp_path):
    """Constructed snapshot classes: 89*97+... pick ids so each class is
    hit — 131*3=393 (removed from v2), 89*2=178 (modified → recomputed),
    83*4=332 (re-added at 1000332 → recomputed), 5 (unchanged → reused),
    97*2=194 (benchmark, never in the ledger). Doc 5 contains a
    benchmark trigram and must have it cut; the reused verdict must
    equal what a fresh q234-style run would produce."""
    bench_text = "secret bench answer token"
    docs = _docs(
        [
            (194, bench_text, "en", "bench"),   # % 97 == 0 → benchmark
            (5, f"intro {bench_text} outro words here", "en", "web"),
            (178, "this doc gets upper cased in v2 snapshot", "en", "web"),
            (393, "this doc disappears from v2 entirely ok", "en", "web"),
            (332, "this doc is re added under a new id too", "en", "web"),
            (7, "completely clean document nothing shared", "en", "web"),
        ]
    )
    sf = _fixture_dir(tmp_path, docs)
    compare_query(spark, sf, "q239_incremental_decontamination")
    rows = {
        r.doc_id: r
        for r in registry.get("q239_incremental_decontamination")
        .fn(spark, sf)
        .collect()
    }
    # benchmark doc and the removed doc never appear
    assert 194 not in rows and 393 not in rows
    assert rows[5].surgery == "reused"
    assert rows[7].surgery == "reused"
    assert rows[178].surgery == "recomputed"
    assert 1000332 in rows and rows[1000332].surgery == "recomputed"
    # 332 itself is unchanged in v2 (83∤131, 83∤89) → reused
    assert rows[332].surgery == "reused"
    # the benchmark trigram is cut from doc 5 (4 tokens of surgery: the
    # 3-token trigram span extends over overlapping trigram hits)
    assert "secret" not in rows[5].cleaned_text
    assert "bench" not in rows[5].cleaned_text
    assert rows[5].removed_tokens > 0
    assert rows[7].removed_tokens == 0
    assert rows[7].cleaned_text == docs.loc[docs.doc_id == 7, "text"].iloc[0]


# ---------------------------------------------------------------------------
# q240 — span-removal provenance
# ---------------------------------------------------------------------------


def test_q240_provenance_names_partner_and_pass(spark, tmp_path):
    """Docs 1 and 2 share a 40-char run → one pass-1 span in doc 2 (the
    id-later doc) naming partner 1 with the exact coordinates. Doc 3's
    copy of the same run yields spans too (partner 1, by doc order)."""
    shared = "0123456789abcdefghijklmnopqrstuvwxyzABCD"  # 40 chars
    docs = _docs(
        [
            (1, f"left padding x {shared} y right padding", "en", "web"),
            (2, f"QQ {shared} tail portion here", "en", "web"),
            (3, f"{shared} immediately leading", "en", "web"),
            (4, "unrelated content with no big overlap at all", "en", "web"),
        ]
    )
    sf = _fixture_dir(tmp_path, docs)
    compare_query(spark, sf, "q240_span_removal_provenance")
    out = (
        registry.get("q240_span_removal_provenance").fn(spark, sf).collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: the maximal common run is " {shared} " — the flanking
    # spaces match in both docs — i.e. chars 3..44 (1-based), partner 1
    d2 = [r for r in by_doc.get(2, []) if r.partner == 1]
    assert d2 and d2[0].pass_no == 1
    assert (d2[0].s, d2[0].e) == (3, 44)
    assert 4 not in by_doc
    # every later doc's removal traces to SOME earlier partner
    assert all(r.partner < r.doc_id for r in out)


# ---------------------------------------------------------------------------
# q242 — combined contamination verdicts
# ---------------------------------------------------------------------------


def test_q242_verdict_classes(spark, tmp_path):
    """A doc hit by BOTH gates, one by exact only, one clean; verdicts
    and counts line up with the underlying q234/q238 outputs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    bench_text = "leaked benchmark answer string"
    docs = _docs(
        [
            (97, bench_text, "en", "bench"),
            (1, f"pre {bench_text} post", "en", "web"),   # exact hit
            (2, "totally unrelated content here", "en", "web"),
            (3, "also clean and unrelated words", "en", "web"),
        ]
    )
    d = tmp_path / "sf_q242"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        os.symlink(os.path.join(SF_SRC, f"{t}.parquet"), d / f"{t}.parquet")
    docs.to_parquet(d / "documents.parquet", index=False)
    # embeddings: vec 0 benchmark; vec 1 near it (semantic hit); vec 2/3 far
    emb = pd.DataFrame(
        {
            "vec_id": pd.array([0, 1, 2, 3], dtype="int64"),
            "embedding": [
                _unit(0),
                _blend(0, 0.9, 5),
                _unit(2),
                _unit(3),
            ],
            "label": pd.array([0, 1, 1, 1], dtype="int32"),
        }
    )
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(emb, schema=schema, preserve_index=False),
        d / "embeddings.parquet",
    )
    sf = str(d)
    compare_query(spark, sf, "q242_contamination_verdicts")
    rows = {
        r.doc_id: r
        for r in registry.get("q242_contamination_verdicts")
        .fn(spark, sf)
        .collect()
    }
    assert 97 not in rows  # benchmark doc never in the corpus ledger
    assert rows[1].verdict == "both"  # exact trigram hit + sim 0.9 to vec 0
    assert rows[1].exact_removed_tokens > 0
    assert rows[1].matched_benchmark == 0
    assert rows[2].verdict == "clean" and rows[3].verdict == "clean"


# ---------------------------------------------------------------------------
# q243 — per-partner attribution
# ---------------------------------------------------------------------------


def test_q243_attribution_counts(spark, tmp_path):
    """Doc 1's 40-char run seeds cuts in docs 2 and 3 → partner 1
    attributes 2+ spans across 2 victim docs in pass 1; totals agree
    with a direct rollup of the q240 provenance rows."""
    shared = "0123456789abcdefghijklmnopqrstuvwxyzABCD"
    docs = _docs(
        [
            (1, f"first {shared} trailing text here", "en", "web"),
            (2, f"second copy {shared} more stuff", "en", "web"),
            (3, f"third copy {shared} other tail", "en", "web"),
            (4, "nothing shared with anyone else", "en", "web"),
        ]
    )
    sf = _fixture_dir(tmp_path, docs)
    compare_query(spark, sf, "q243_partner_attribution")
    att = {
        (r.partner, r.pass_no): r
        for r in registry.get("q243_partner_attribution")
        .fn(spark, sf)
        .collect()
    }
    prov = (
        registry.get("q240_span_removal_provenance").fn(spark, sf).collect()
    )
    p1_victims = {r.doc_id for r in prov if r.partner == 1 and r.pass_no == 1}
    assert att[(1, 1)].n_victim_docs == len(p1_victims) >= 2
    assert att[(1, 1)].chars_attributed == sum(
        r.e - r.s + 1 for r in prov if r.partner == 1 and r.pass_no == 1
    )
    assert 4 not in {p for p, _ in att}


# ---------------------------------------------------------------------------
# q244 — benchmark leak leaderboard
# ---------------------------------------------------------------------------


def test_q244_per_benchmark_counts(spark, tmp_path):
    """Benchmark doc 97 leaks into two corpus docs exactly; benchmark
    doc 194 leaks into none — both rows present (zero-leak rows are the
    coverage audit); semantic counts come from the stock embeddings."""
    leak = "unique leaked benchmark span"
    docs = _docs(
        [
            (97, leak, "en", "bench"),
            (194, "pristine benchmark item nothing copies", "en", "bench"),
            (1, f"first copy {leak} in corpus", "en", "web"),
            (2, f"{leak} second corpus copy", "en", "web"),
            (3, "clean corpus document entirely", "en", "web"),
        ]
    )
    sf = _fixture_dir(tmp_path, docs)
    compare_query(spark, sf, "q244_benchmark_leak_report")
    rows = {
        r.bench_id: r
        for r in registry.get("q244_benchmark_leak_report")
        .fn(spark, sf)
        .collect()
    }
    assert set(rows) == {97, 194}
    assert rows[97].n_docs_exact == 2
    assert rows[194].n_docs_exact == 0
