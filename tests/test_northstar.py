"""Semantic tests for the LLM-pipeline operators beyond the oracle compare:
LSH recall vs brute force, SimHash near-dup proximity, multimodal stub
gating, ANN candidate quality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_state_provider_spark import operators
from spark_state_provider_spark.operators import registry
from spark_state_provider_spark.operators.multimodal import decode_image_bytes
from spark_state_provider_spark.tables import load_table

operators.load_all()


@pytest.fixture(scope="module")
def brute_pairs(spark, sf_dir):
    """Ground-truth near-dup pairs (trigram Jaccard >= 0.5) by brute force."""
    from spark_state_provider_spark.operators.dedup import _trigrams

    tri = _trigrams(spark, sf_dir).cache()
    sizes = tri.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = tri.select(F.col("doc_id").alias("id_a"), "tri")
    tb = tri.select(F.col("doc_id").alias("tid_b"), F.col("tri").alias("tri_b"))
    inter = (
        ta.join(tb, (F.col("id_a") < F.col("tid_b")) & (F.col("tri") == F.col("tri_b")))
        .groupBy("id_a", "tid_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("tid_b"), F.col("n").alias("nb"))
    rows = (
        inter.join(sa, "id_a")
        .join(sb, "tid_b")
        .withColumn(
            "j",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .where(F.col("j") >= 0.5)
        .collect()
    )
    return {(r["id_a"], r["tid_b"]) for r in rows}


def test_minhash_lsh_finds_planted_neardups(spark, sf_dir, brute_pairs):
    got = {
        (r["id_a"], r["id_b"])
        for r in registry.get("q28b_minhash_lsh").fn(spark, sf_dir).collect()
    }
    assert brute_pairs, "testdata should contain planted near-duplicates"
    # LSH output must be a subset of truth (verification step guarantees it)
    assert got <= brute_pairs
    # and recall must be high (2 bands x 4 rows at j~0.98 → ~99%)
    assert len(got) >= 0.9 * len(brute_pairs), (len(got), len(brute_pairs))


def test_simhash_neardups_are_hamming_close(spark, sf_dir, brute_pairs):
    sh = {
        r["doc_id"]: r["simhash"]
        for r in registry.get("q28c_simhash").fn(spark, sf_dir).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    near = [ham(sh[a], sh[b]) for a, b in brute_pairs]
    # near-dups within a quarter of the bits (random pairs expect ~32/64;
    # the exact constant shifts with the token hash — 12 under xxhash64,
    # 15 under the portable md5 hash that earns the DuckDB oracle row)
    assert near and max(near) <= 16, near
    # random pairs should be far (~32 bits expected)
    ids = sorted(sh)[:50]
    far = [
        ham(sh[ids[i]], sh[ids[i + 25]])
        for i in range(20)
        if (ids[i], ids[i + 25]) not in brute_pairs
    ]
    # shared small vocabulary keeps absolute distances low corpus-wide, so
    # assert statistical separation rather than an absolute floor
    assert sum(far) / len(far) > sum(near) / len(near), (near, far)


def test_ann_lsh_recall_vs_brute(spark, sf_dir):
    brute = registry.get("q29_knn_brute").fn(spark, sf_dir).collect()
    ann = registry.get("q29b_ann_lsh").fn(spark, sf_dir).collect()
    brute_top = {(r["query_id"], r["neighbor_id"]) for r in brute if r["rn"] <= 3}
    ann_all = {(r["query_id"], r["neighbor_id"]) for r in ann}
    # multi-table LSH on weakly-clustered vectors: recall floor vs exact
    # top-3 (brute force remains the exactness baseline)
    recall = len(brute_top & ann_all) / len(brute_top)
    assert recall >= 0.5, recall
    # every ANN result must come from the same bucket as its query → its sim
    # must match the brute-force sim for that pair exactly
    brute_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in brute}
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute_sims:
            assert r["sim"] == brute_sims[key]


def test_multimodal_strict_rejects_unrecognized():
    # a junk payload (or a truncated magic) is refused under strict — real
    # containers now decode for real (see test_image_header_parser_roundtrip)
    with pytest.raises(ValueError, match="unrecognized image container"):
        decode_image_bytes(b"\x89PNG...", strict=True)
    from spark_state_provider_spark.operators.multimodal import make_png

    meta = decode_image_bytes(make_png(320, 200), strict=True)
    assert (meta["width"], meta["height"], meta["format"]) == (320, 200, "png")


def test_multimodal_fake_decode_deterministic():
    a = decode_image_bytes(b"hello world")
    b = decode_image_bytes(b"hello world")
    assert a == b
    assert a["n_bytes"] == 11 and 1 <= a["width"] <= 640 and 1 <= a["height"] <= 480


def test_lang_id_mostly_english_corpus(spark, sf_dir):
    """The synthetic corpus is English word-soup regardless of label — the
    heuristic should be deterministic and dominated by 'en'."""
    out = registry.get("q30b_lang_id").fn(spark, sf_dir).collect()
    preds = [r["predicted_lang"] for r in out]
    assert all(p is not None for p in preds)
    assert preds.count("en") > len(preds) * 0.8


def test_exact_dedup_keys_match_fingerprint_groups(spark, sf_dir):
    n_texts = (
        load_table(spark, sf_dir, "documents").select("text").distinct().count()
    )
    assert registry.get("q28_dedup_exact").fn(spark, sf_dir).count() == n_texts
    assert registry.get("q30d_fingerprint").fn(spark, sf_dir).count() == n_texts


def test_ivf_ann_recall_and_exact_sims(spark, sf_dir):
    """IVF semantics: sims are exact cosines (match brute force bit-for-bit)
    and probing 3 of ~n/50 clusters keeps a recall floor of the true top-3
    (measured 0.40 at sf0.001 — the synthetic vectors are only weakly
    clustered, so coarse quantization is near its worst case; real corpora
    cluster far more tightly)."""
    brute = registry.get("q29_knn_brute").fn(spark, sf_dir).collect()
    ivf = registry.get("q29d_ivf_ann").fn(spark, sf_dir).collect()
    brute_top = {(r["query_id"], r["neighbor_id"]) for r in brute if r["rn"] <= 3}
    ivf_all = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(brute_top & ivf_all) / len(brute_top)
    assert recall >= 0.35, recall
    brute_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in brute}
    for r in ivf:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute_sims:
            assert r["sim"] == brute_sims[key]
    # per-query result-set shape: at most TOP_K rows, rn dense from 1
    from collections import defaultdict

    per_q = defaultdict(list)
    for r in ivf:
        per_q[r["query_id"]].append(r["rn"])
    for q, rns in per_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), (q, rns)
        assert len(rns) <= 5


def test_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    """Every near-dup pair's endpoints land in the same cluster, and each
    cluster is labeled by its own minimum member."""
    pairs = registry.get("q28b_minhash_lsh").fn(spark, sf_dir).collect()
    clusters = registry.get("q28e_dedup_clusters").fn(spark, sf_dir).collect()
    label = {r["doc_id"]: r["cluster_id"] for r in clusters}
    for r in pairs:
        assert label[r["id_a"]] == label[r["id_b"]], r
    from collections import defaultdict

    members = defaultdict(list)
    for doc, lbl in label.items():
        members[lbl].append(doc)
    for lbl, docs in members.items():
        assert lbl == min(docs), (lbl, docs)


def test_cluster_representative_is_best_member(spark, sf_dir):
    """q80 keeps the max-quality member (ties → min doc_id) of each cluster
    and accounts for every dropped copy — and does it without a Window sort
    (argmax must stay a combinable hash aggregate)."""
    from spark_state_provider_spark.plans.explain import plan_string

    clusters = registry.get("q28e_dedup_clusters").fn(spark, sf_dir).collect()
    qual = {
        r["doc_id"]: r["quality_score"]
        for r in registry.get("q30e_quality").fn(spark, sf_dir).collect()
    }
    reps_df = registry.get("q80_cluster_representative").fn(spark, sf_dir)
    assert "Window" not in plan_string(reps_df)
    reps = reps_df.collect()

    from collections import defaultdict

    members = defaultdict(list)
    for r in clusters:
        members[r["cluster_id"]].append(r["doc_id"])
    assert sorted(members) == sorted(r["cluster_id"] for r in reps)
    for r in reps:
        docs = members[r["cluster_id"]]
        best_q = max(qual[d] for d in docs)
        expect = min(d for d in docs if qual[d] == best_q)
        assert r["keep_doc_id"] == expect, (r, docs)
        assert r["best_quality"] == best_q
        assert r["n_members"] == len(docs)
        assert r["n_dropped"] == len(docs) - 1


def test_image_header_parser_roundtrip():
    """Every synthesizer's output must decode to its own dimensions, and
    junk/truncated payloads must be rejected (None), not misparsed."""
    from spark_state_provider_spark.operators.multimodal import (
        make_gif,
        make_jpeg,
        make_png,
        parse_image_header,
    )

    for w, h in [(1, 1), (640, 480), (65535, 1), (12345, 6789)]:
        if w <= 65535 and h <= 65535:
            assert parse_image_header(make_gif(w, h)) == (w, h, "gif")
            assert parse_image_header(make_jpeg(w, h)) == (w, h, "jpeg")
        assert parse_image_header(make_png(w, h)) == (w, h, "png")
    # PNG supports >u16 dims
    assert parse_image_header(make_png(100000, 7)) == (100000, 7, "png")
    # BMP, incl. negative (top-down) height
    import struct as _s

    bmp = b"BM" + b"\x00" * 16 + _s.pack("<ii", 33, -44) + b"\x00" * 4
    assert parse_image_header(bmp) == (33, 44, "bmp")
    # junk / truncation / text payloads
    assert parse_image_header(b"hello world, not an image") is None
    assert parse_image_header(make_png(5, 5)[:10]) is None
    assert parse_image_header(b"") is None


def test_wav_header_parser_roundtrip():
    from spark_state_provider_spark.operators.multimodal import (
        make_wav,
        parse_wav_header,
    )

    m = parse_wav_header(make_wav(44100, 2, 12345))
    assert m == {
        "n_channels": 2,
        "sample_rate": 44100,
        "bits": 16,
        "n_samples": 12345,
    }
    # header-only probe: data chunk truncated, declared length still parsed
    full = make_wav(8000, 1, 500)
    assert parse_wav_header(full[:44])["n_samples"] == 500
    assert parse_wav_header(b"RIFFxxxxJUNK") is None
    assert parse_wav_header(b"") is None


def test_alternating_cc_deep_chain(spark):
    """A 32-hop chain converges in O(log n) large/small-star rounds — the
    deep-graph case where one-label-hop-per-round propagation would need a
    Spark job per hop."""
    from spark_state_provider_spark.operators.dedup import (
        alternating_connected_components,
    )

    n = 33
    chain = [(i, i + 1) for i in range(n - 1)]
    other = [(100, 101), (101, 102)]  # second component, 2 hops
    edges = spark.createDataFrame(chain + other, schema="u long, v long")
    labels, rounds = alternating_connected_components(edges)
    got = {r["u"]: r["v"] for r in labels.collect()}
    want = {i: 0 for i in range(n)}
    want.update({100: 100, 101: 100, 102: 100})
    assert got == want
    assert rounds <= 8, f"expected O(log n) rounds, took {rounds}"


def test_multimodal_arrow_equals_pandas_path(spark, sf_dir):
    pandas_rows = {
        r["doc_id"]: (r["n_bytes"], r["checksum"], r["width"], r["height"], r["format"])
        for r in registry.get("q31_multimodal_meta").fn(spark, sf_dir).collect()
    }
    arrow_rows = {
        r["doc_id"]: (r["n_bytes"], r["checksum"], r["width"], r["height"], r["format"])
        for r in registry.get("q31c_multimodal_arrow").fn(spark, sf_dir).collect()
    }
    assert pandas_rows == arrow_rows


def test_int8_quantized_agrees_with_exact(spark, sf_dir):
    # int8 cosine must preserve the exact top-1 and keep high top-k overlap:
    # quantization error for 64-dim unit-ish vectors is ~1/127 per component,
    # far below the sim gaps between true neighbors and the field
    brute = registry.get("q29_knn_brute").fn(spark, sf_dir).collect()
    quant = registry.get("q29e_int8_quantized").fn(spark, sf_dir).collect()
    b1 = {r["query_id"]: r["neighbor_id"] for r in brute if r["rn"] == 1}
    q1 = {r["query_id"]: r["neighbor_id"] for r in quant if r["rn"] == 1}
    agree = sum(1 for k in b1 if q1.get(k) == b1[k])
    assert agree >= 0.8 * len(b1), (agree, len(b1))
    b_top = {(r["query_id"], r["neighbor_id"]) for r in brute}
    q_top = {(r["query_id"], r["neighbor_id"]) for r in quant}
    overlap = len(b_top & q_top) / len(b_top)
    assert overlap >= 0.7, overlap
    # quantized sims stay within the coarse error budget of the exact ones
    b_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in brute}
    for r in quant:
        key = (r["query_id"], r["neighbor_id"])
        if key in b_sims:
            assert abs(r["sim"] - b_sims[key]) < 0.05


def test_kmeans_lloyd_monotone(spark, sf_dir):
    """Lloyd's algorithm never increases total within-cluster SSE: the SSE
    of iteration-2 assignments (against iteration-1 centroids' successors)
    is <= iteration-1 SSE. Computed engine-side only (test invariant, not
    an oracle), small float tolerance for summation order."""
    from spark_state_provider_spark.functions.vector import quantize_int8
    from spark_state_provider_spark.operators.similarity import K_CLUSTERS

    assign = registry.get("q50_kmeans").fn(spark, sf_dir)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .select("vec_id", quantize_int8(F.col("v")).alias("q"))
    )
    j = assign.join(emb, "vec_id")
    dim = 64

    def sse(df, cluster_col):
        cent = df.groupBy(cluster_col).agg(
            F.count("*").alias("cnt"),
            *[F.sum(F.col("q")[i]).alias(f"s{i}") for i in range(dim)],
        )
        with_c = df.join(cent, cluster_col)
        expr = sum(
            (
                F.col("q")[i].cast("double")
                - F.col(f"s{i}").cast("double") / F.col("cnt")
            )
            ** 2
            for i in range(dim)
        )
        return with_c.agg(F.sum(expr)).collect()[0][0]

    # SSE of the c2 partition (with its own optimal centroids) must not
    # exceed SSE of the c1 partition: one full Lloyd step happened between.
    assert sse(j, "c2") <= sse(j, "c1") * (1 + 1e-9)


def test_pq_ann_recall_and_sim_exactness(spark, sf_dir):
    """q29f: PQ-ADC shortlist + exact re-rank must agree with brute force on
    a recall floor, and every reported sim must equal the brute-force sim
    for that pair bit-for-bit (the re-rank is exact cosine). The floor
    matches q29d's: the synthetic vectors are near-random, so coarse
    product codes are at their worst case (measured 0.53 at sf0.001 with
    10 codewords x 8 subspaces, shortlist 20); real corpora cluster."""
    brute = registry.get("q29_knn_brute").fn(spark, sf_dir).collect()
    pq = registry.get("q29f_pq_ann").fn(spark, sf_dir).collect()
    brute_top = {(r["query_id"], r["neighbor_id"]) for r in brute if r["rn"] <= 3}
    pq_all = {(r["query_id"], r["neighbor_id"]) for r in pq}
    recall = len(brute_top & pq_all) / len(brute_top)
    assert recall >= 0.35, recall
    brute_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in brute}
    for r in pq:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute_sims:
            assert r["sim"] == brute_sims[key]
    # shape: per query at most TOP_K rows, rn dense from 1
    from collections import defaultdict

    per_q = defaultdict(list)
    for r in pq:
        per_q[r["query_id"]].append(r["rn"])
    for q, rns in per_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    """q85: near-dup pair endpoints always share a split; singletons match
    q39's per-doc hash rule (same md5-prefix split function)."""
    import hashlib

    pairs = registry.get("q28b_minhash_lsh").fn(spark, sf_dir).collect()
    out = {r.doc_id: r for r in registry.get("q85_leakage_safe_split").fn(spark, sf_dir).collect()}
    for p in pairs:
        assert out[p.id_a].split == out[p.id_b].split, p
    clustered = {r.doc_id for r in registry.get("q28e_dedup_clusters").fn(spark, sf_dir).collect()}
    for doc_id, r in out.items():
        if doc_id not in clustered:
            assert r.split_key == doc_id
            c = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
            expect = "train" if c <= "b" else ("val" if c <= "d" else "test")
            assert r.split == expect


def test_feature_hash_embed_unit_norm_and_recompute(spark, sf_dir):
    """q86: per-doc weights are unit-L2, and raw bucket sums match an
    independent Python recomputation of the hashing trick."""
    import hashlib
    from collections import defaultdict

    from spark_state_provider_spark.operators.text import _FH_DIM

    out = registry.get("q86_feature_hash_embed").fn(spark, sf_dir).collect()
    sq = defaultdict(float)
    got = {}
    for r in out:
        sq[r.doc_id] += r.weight * r.weight
        got[(r.doc_id, r.dim)] = r.raw
    assert sq and all(abs(s - 1.0) < 1e-9 for s in sq.values())

    docs = load_table(spark, sf_dir, "documents").limit(20).collect()
    for d in docs:
        acc = defaultdict(int)
        for tok in d.text.split(" "):
            h = hashlib.md5(tok.encode()).hexdigest()
            acc[int(h[0], 16) % _FH_DIM] += 1 if int(h[1], 16) % 2 == 0 else -1
        for dim, raw in acc.items():
            if raw != 0 or (d.doc_id, dim) in got:
                assert got.get((d.doc_id, dim), 0) == raw, (d.doc_id, dim)


def test_rare_ngram_ratio_separates_duplicates(spark, sf_dir):
    """q87: documents with a near-duplicate share almost all trigrams, so
    their rare-ngram ratio must sit well below the rest of the corpus."""
    pairs = registry.get("q28b_minhash_lsh").fn(spark, sf_dir).collect()
    dup_docs = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert dup_docs
    rows = registry.get("q87_rare_ngram_ratio").fn(spark, sf_dir).collect()
    dup = [r.rare_ratio for r in rows if r.doc_id in dup_docs]
    rest = [r.rare_ratio for r in rows if r.doc_id not in dup_docs]
    assert dup and rest
    assert sum(dup) / len(dup) < 0.5 * (sum(rest) / len(rest))
    for r in rows:
        assert 0.0 <= r.rare_ratio <= 1.0
        assert r.n_rare <= r.n_ngrams
