"""LLM-data operators: dedup recall on planted duplicates, similarity
vs a NumPy oracle, text stats, multimodal plumbing."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from datawaves_etl_airflow_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the red river bank"),
    (3, "completely different content about spark query engines and shuffles"),
    (4, "another unrelated document mentioning parquet files and columnar io"),
    (5, "THE  Quick   Brown Fox jumps over the lazy dog near the river bank"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


class TestExactDedup:
    def test_groups(self, docs):
        out = dedup.exact_dedup_groups(docs).collect()
        by_keep = {r["keep_id"]: r["n_dups"] for r in out}
        # 0, 1 and 5 (case/whitespace-normalized) collapse to one group
        assert by_keep[0] == 3
        assert by_keep[2] == 1
        assert sum(by_keep.values()) == 6


class TestMinHash:
    def test_planted_duplicates_found(self, docs):
        pairs = dedup.minhash_dedup_pairs(docs, threshold=0.5).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        # exact duplicates MUST be caught (identical signatures share
        # every band); the near-dup (0,2) should clear j≥0.5 too
        assert (0, 1) in got
        assert (0, 5) in got
        assert (1, 5) in got
        for r in pairs:
            assert r["jaccard"] >= 0.5

    def test_no_false_positives_below_threshold(self, docs):
        pairs = dedup.minhash_dedup_pairs(docs, threshold=0.9).collect()
        for r in pairs:
            assert r["jaccard"] >= 0.9

    def test_jaccard_matches_python(self, docs, spark):
        sh = dedup.word_shingles(docs)
        out = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.jaccard_pairs(sh, 0.0).collect()
        }

        def shingle_set(t):
            words = " ".join(t.lower().split()).split(" ")
            return {
                " ".join(words[i:i + 3])
                for i in range(max(len(words) - 2, 1))
            }

        s0, s2 = shingle_set(DOCS[0][1]), shingle_set(DOCS[2][1])
        expect = len(s0 & s2) / len(s0 | s2)
        assert math.isclose(out[(0, 2)], expect, rel_tol=1e-12)


class TestSimHash:
    def test_identical_docs_zero_hamming(self, docs):
        sigs = dedup.simhash_signatures(docs)
        pairs = dedup.simhash_candidate_pairs(sigs).collect()
        ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
        # identical (modulo normalization) docs → identical signature
        assert ham[(0, 1)] == 0
        assert ham[(0, 5)] == 0

    def test_pigeonhole_guarantee(self, docs):
        """Every pair within Hamming distance 3 MUST be a candidate
        (4 chunks → ≤3 differing bits leave one chunk untouched)."""
        sigs = {r["id"]: r["simhash"]
                for r in dedup.simhash_signatures(docs).collect()}
        cands = {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_candidate_pairs(
                dedup.simhash_signatures(docs)
            ).collect()
        }
        ids = sorted(sigs)
        for i in ids:
            for j in ids:
                if i < j and bin(sigs[i] ^ sigs[j]).count("1") <= 3:
                    assert (i, j) in cands


class TestSimilarity:
    def _vectors(self, spark, n=40, dim=8, seed=3):
        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(n, dim)).astype("float32")
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
        return vecs, spark.createDataFrame(rows, ["vec_id", "embedding"])

    def test_brute_force_matches_numpy(self, spark):
        vecs, df = self._vectors(spark)
        queries = df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        out = similarity.brute_force_topk(df, queries, k=4).collect()
        norm = vecs / np.linalg.norm(vecs.astype("float64"), axis=1, keepdims=True)
        sims = norm @ norm.T
        for q in range(3):
            expect = list(np.argsort(-sims[q], kind="stable")[:4])
            got = [
                r["match_id"]
                for r in sorted(
                    (r for r in out if r["query_id"] == q),
                    key=lambda r: r["rank"],
                )
            ]
            assert got == [int(x) for x in expect]

    def test_lsh_recall_reasonable(self, spark):
        vecs, df = self._vectors(spark, n=60)
        queries = df.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        exact = similarity.brute_force_topk(df, queries, k=1).collect()
        approx = similarity.lsh_topk(df, queries, dim=8, k=1, n_planes=4).collect()
        # self-match (cos=1) is always in the query's own bucket
        self_hits = sum(
            1 for r in approx if r["rank"] == 1 and r["match_id"] == r["query_id"]
        )
        exact_self = sum(
            1 for r in exact if r["rank"] == 1 and r["match_id"] == r["query_id"]
        )
        assert exact_self == 60
        assert self_hits == 60

    def test_ivf_recall_on_clustered_vectors(self, spark):
        # 4 well-separated clusters: with nprobe=2 every query's own
        # cluster is probed, so top-1 must equal the exact top-1
        rng = np.random.default_rng(11)
        centers = rng.normal(size=(4, 8)) * 10.0
        rows = []
        for i in range(80):
            v = centers[i % 4] + rng.normal(size=8) * 0.1
            rows.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = df.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        exact = {
            r["query_id"]: r["match_id"]
            for r in similarity.brute_force_topk(df, queries, k=1).collect()
        }
        approx = {
            r["query_id"]: r["match_id"]
            for r in similarity.ivf_topk(
                df, queries, n_centroids=4, nprobe=2, k=1
            ).collect()
        }
        assert approx == exact

    def test_ivf_centroids_deterministic(self, spark):
        _, df = self._vectors(spark, n=30)
        a = similarity.train_centroids(df, 4, n_iters=1).collect()
        b = similarity.train_centroids(df, 4, n_iters=1).collect()
        assert sorted((r["centroid_id"], tuple(r["centroid"])) for r in a) \
            == sorted((r["centroid_id"], tuple(r["centroid"])) for r in b)

    def test_neardup_pairs_symmetric_threshold(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),
            (2, [0.0, 1.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = similarity.neardup_pairs(df, threshold=0.95).collect()
        assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 1)}


class TestQuantization:
    def test_matches_numpy_and_error_bound(self, spark):
        import math as m

        import numpy as np

        from datawaves_etl_airflow_spark.operators.similarity import (
            quantize_embeddings_int8,
        )

        rng = np.random.default_rng(3)
        vecs = [
            (i, [float(np.float32(x)) for x in rng.normal(size=16)])
            for i in range(20)
        ] + [(99, [0.0] * 16)]  # zero vector edge case
        df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        out = {
            r["vec_id"]: r
            for r in quantize_embeddings_int8(df).collect()
        }
        for vid, v in vecs:
            x = np.array(v, dtype=np.float64)
            maxabs = float(np.abs(x).max())
            r = out[vid]
            if maxabs == 0:
                assert list(r["q"]) == [0] * 16
                continue
            want = [m.floor((xi * 127.0) / maxabs) for xi in x]
            assert list(r["q"]) == want
            # dequantization error ≤ one LSB
            deq = np.array(r["q"], dtype=np.float64) * r["scale"]
            assert float(np.abs(deq - x).max()) <= maxabs / 127.0 + 1e-12
            assert max(abs(qi) for qi in r["q"]) <= 127


class TestText:
    def test_stats_golden(self, spark):
        df = spark.createDataFrame(
            [(1, "The cat, the hat!")], ["doc_id", "text"]
        )
        r = text.text_stats(df).collect()[0]
        assert r["n_chars"] == 17
        assert r["n_words"] == 4
        assert r["n_punct"] == 2
        assert math.isclose(r["stopword_ratio"], 0.5)  # 'the' twice / 4

    def test_language_votes(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat and the dog is a pet"),
                (2, "der hund und die katze ist da"),
                (3, "le chat et la maison est ici"),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r["detected_lang"]
               for r in text.detect_language(df).collect()}
        assert out == {1: "en", 2: "de", 3: "fr"}

    def test_token_counts(self, spark):
        df = spark.createDataFrame([(1, "a b-c d!")], ["doc_id", "text"])
        r = text.token_counts(df).collect()[0]
        assert r["n_ws_tokens"] == 3
        # a, b, -, c, d, ! → 6 BPE-ish tokens
        assert r["n_bpe_tokens"] == 6

    def test_quality_logit_golden(self, spark):
        # independent recomputation of the linear head on known stats
        df = spark.createDataFrame(
            [
                (1, "The cat sat on the mat with a friendly brown dog"),
                (2, "!!! ??? ;;; :::"),
            ],
            ["doc_id", "text"],
        )
        stats = {r["doc_id"]: r for r in text.text_stats(df).collect()}
        out = {r["doc_id"]: r for r in text.quality_logit(df).collect()}
        w = text.QUALITY_WEIGHTS
        for i in (1, 2):
            s = stats[i]
            expect = (
                w["bias"]
                + w["n_words"] * s["n_words"]
                + w["mean_word_len"] * s["mean_word_len"]
                + w["punct_ratio"] * s["punct_ratio"]
                + w["stopword_ratio"] * s["stopword_ratio"]
                + w["upper_ratio"] * s["upper_ratio"]
            )
            assert math.isclose(
                out[i]["quality_logit"], round(expect, 6), abs_tol=1e-9
            )
        # prose scores above junk, and keep derives from the sign
        assert out[1]["quality_logit"] > out[2]["quality_logit"]
        for i in (1, 2):
            assert out[i]["keep"] == int(out[i]["quality_logit"] > 0)

    def test_quality_logit_custom_weights(self, spark):
        df = spark.createDataFrame([(1, "plain words here")],
                                   ["doc_id", "text"])
        w = dict(text.QUALITY_WEIGHTS, bias=100.0)
        r = text.quality_logit(df, weights=w).collect()[0]
        assert r["keep"] == 1 and r["quality_logit"] > 99

    def test_fingerprint_stability_under_edits(self, spark):
        df = spark.createDataFrame(
            [(1, "abcdefghij"), (2, "abcdefghij"), (3, "Xbcdefghij")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in text.fingerprint(df).collect()}
        assert out[1]["content_md5"] == out[2]["content_md5"]
        assert out[1]["min_gram_fp"] == out[2]["min_gram_fp"]
        assert out[1]["content_md5"] != out[3]["content_md5"]


class TestMultimodal:
    def test_meta_extraction(self, spark):
        df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
        payloads = multimodal.attach_binary_payload(df)
        r = multimodal.extract_binary_meta(payloads).collect()[0]
        assert r["n_bytes"] == 11
        import hashlib

        assert r["content_md5"] == hashlib.md5(b"hello world").hexdigest()
        assert r["header_hex"] == b"hello wo".hex()

    def test_frame_sampling_roundtrip(self, spark):
        import hashlib

        docs = spark.createDataFrame(
            [(1, 5), (2, 1), (3, 2)], ["doc_id", "n_frames"]
        )
        videos = multimodal.encode_fake_video(docs, "n_frames")
        out = multimodal.sample_frames(videos, every=2, frame_ms=40).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r["id"], []).append(r)
        # every-2nd sampling: 5 frames → idx 0,2,4; 1 → 0; 2 → 0
        assert sorted(r["frame_idx"] for r in by_id[1]) == [0, 2, 4]
        assert sorted(r["frame_idx"] for r in by_id[2]) == [0]
        assert sorted(r["frame_idx"] for r in by_id[3]) == [0]
        # frame bytes are content-true: md5 of sha256(id:idx) doubled
        for r in out:
            frame = hashlib.sha256(
                f"{r['id']}:{r['frame_idx']}".encode()
            ).digest() * 2
            assert r["frame_md5"] == hashlib.md5(frame).hexdigest()
            assert r["ts_ms"] == r["frame_idx"] * 40

    def test_frame_sampling_bad_magic(self, spark):
        bad = spark.createDataFrame(
            [(1, bytearray(b"NOPE1234"))], ["id", "payload"]
        )
        with pytest.raises(Exception):
            multimodal.sample_frames(bad, on_error="fail").collect()
        assert multimodal.sample_frames(bad, on_error="skip").count() == 0

    @staticmethod
    def _naive_decode(image_id, w, h, max_side):
        # independent reference: naive loops, no numpy, no reduceat
        import hashlib

        digest = hashlib.sha256(str(image_id).encode()).digest()
        px = (digest * (w * h // len(digest) + 1))[: w * h]
        s = max(1, -(-max(w, h) // max_side))
        out_h = -(-h // s)
        out_w = -(-w // s)
        thumb = bytearray()
        for br in range(out_h):
            for bc in range(out_w):
                vals = [
                    px[y * w + x]
                    for y in range(br * s, min((br + 1) * s, h))
                    for x in range(bc * s, min((bc + 1) * s, w))
                ]
                thumb.append(sum(vals) // len(vals))
        return out_w, out_h, sum(px) / len(px), bytes(thumb)

    def test_image_decode_matches_naive_reference(self, spark):
        import hashlib

        dims = [(7, 33, 21), (8, 16, 16), (9, 63, 1), (10, 40, 40)]
        docs = spark.createDataFrame(dims, ["doc_id", "w", "h"])
        imgs = multimodal.encode_fake_image(docs, "w", "h")
        out = {
            r["id"]: r
            for r in multimodal.decode_image(imgs, max_side=16).collect()
        }
        assert set(out) == {7, 8, 9, 10}
        for iid, w, h in dims:
            ow, oh, mean, thumb = self._naive_decode(iid, w, h, 16)
            r = out[iid]
            assert (r["width"], r["height"]) == (w, h)
            assert (r["out_w"], r["out_h"]) == (ow, oh)
            assert abs(r["mean_px"] - mean) < 1e-9
            assert bytes(r["thumbnail"]) == thumb
            assert r["thumb_md5"] == hashlib.md5(thumb).hexdigest()

    def test_audio_decode_matches_naive_reference(self, spark):
        import struct

        docs = spark.createDataFrame(
            [(1, 8000, 100), (2, 16000, 301), (3, 24000, 17)],
            ["doc_id", "rate", "n"],
        )
        audio = multimodal.encode_fake_audio(docs, "rate", "n")
        out = {
            r["id"]: r
            for r in multimodal.decode_audio_features(
                audio, target_rate=8000
            ).collect()
        }
        import hashlib

        for iid, rate, n in [(1, 8000, 100), (2, 16000, 301), (3, 24000, 17)]:
            digest = hashlib.sha256(str(iid).encode()).digest()
            raw = (digest * (2 * n // len(digest) + 1))[: 2 * n]
            samples = [
                struct.unpack("<h", raw[2 * i:2 * i + 2])[0]
                for i in range(n)
            ]
            k = max(1, rate // 8000)
            r = out[iid]
            assert (r["sample_rate"], r["n_samples"]) == (rate, n)
            assert r["duration_ms"] == n * 1000 // rate
            assert r["n_resampled"] == -(-n // k)
            assert r["peak"] == max(abs(s) for s in samples)
            rms = (sum(s * s for s in samples) / n) ** 0.5
            assert math.isclose(r["rms"], rms, rel_tol=1e-12)

    def test_audio_decode_bad_container(self, spark):
        good = multimodal.encode_fake_audio(
            spark.createDataFrame([(1, 8000, 4)], ["doc_id", "rate", "n"]),
            "rate",
            "n",
        ).collect()[0]["payload"]
        bad = spark.createDataFrame(
            [
                (2, bytearray(b"NOPE" + bytes(16))),
                (3, bytearray(bytes(good)[:-1])),
                (1, bytearray(bytes(good))),
            ],
            ["id", "payload"],
        )
        with pytest.raises(Exception):
            multimodal.decode_audio_features(bad, on_error="fail").collect()
        kept = multimodal.decode_audio_features(bad, on_error="skip").collect()
        assert [r["id"] for r in kept] == [1]

    def test_image_decode_bad_container(self, spark):
        # bad magic AND a truncated pixel grid must both quarantine
        good = multimodal.encode_fake_image(
            spark.createDataFrame([(1, 4, 4)], ["doc_id", "w", "h"]),
            "w",
            "h",
        ).collect()[0]["payload"]
        bad = spark.createDataFrame(
            [
                (2, bytearray(b"NOPE" + bytes(20))),
                (3, bytearray(bytes(good)[:-3])),
                (1, bytearray(bytes(good))),
            ],
            ["id", "payload"],
        )
        with pytest.raises(Exception):
            multimodal.decode_image(bad, on_error="fail").collect()
        kept = multimodal.decode_image(bad, on_error="skip").collect()
        assert [r["id"] for r in kept] == [1]


class TestSkew:
    def test_salted_agg_equals_plain(self, spark):
        from datawaves_etl_airflow_spark.operators.skew import (
            salted_count_sum,
        )

        df = spark.createDataFrame(
            [("hot", float(i)) for i in range(500)]
            + [("cold", 1.0), ("cold", 2.0)],
            ["k", "v"],
        ).repartition(8)
        out = {
            r["k"]: (r["n_rows"], r["total"])
            for r in salted_count_sum(
                df, ["k"], {"total": F.col("v")}
            ).collect()
        }
        assert out["hot"] == (500, sum(float(i) for i in range(500)))
        assert out["cold"] == (2, 3.0)

    def test_salted_join_equals_plain(self, spark):
        from datawaves_etl_airflow_spark.operators.skew import salted_join

        big = spark.createDataFrame(
            [("a", i) for i in range(300)] + [("b", i) for i in range(5)],
            ["k", "payload"],
        ).repartition(8)
        small = spark.createDataFrame(
            [("a", "dim_a"), ("b", "dim_b"), ("c", "dim_c")], ["k", "label"]
        )
        got = salted_join(big, small, "k")
        plain = big.join(small, "k", "inner")
        assert got.count() == plain.count() == 305
        assert sorted(got.columns) == sorted(plain.columns)
        assert (
            got.groupBy("k").count().orderBy("k").collect()
            == plain.groupBy("k").count().orderBy("k").collect()
        )


class TestRepetition:
    def test_repetition_ratio_golden(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "spam spam spam spam"),        # "spam spam" ×3 / 3
                (2, "a b c d"),                    # all 2-grams unique
                (3, "hello"),                      # single word
            ],
            ["doc_id", "text"],
        )
        out = {r["id"]: r for r in
               text.ngram_repetition(docs, n=2).collect()}
        assert out[1]["n_ngrams"] == 3
        assert out[1]["top_ngram_count"] == 3
        assert out[1]["repetition_ratio"] == 1.0
        assert out[2]["n_ngrams"] == 3
        assert out[2]["top_ngram_count"] == 1
        assert out[3]["n_ngrams"] == 1  # degenerate: the word itself


class TestDuplicateClusters:
    def _clusters(self, spark, edges, max_iter=25):
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        out = dedup.duplicate_clusters(pairs, max_iter=max_iter).collect()
        return {r["id"]: r["cluster_id"] for r in out}

    def test_chain_and_separate_component(self, spark):
        # chain 1-2-3-4 (never directly paired end-to-end) + island 10-11
        got = self._clusters(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_matches_union_find(self, spark):
        import random

        rng = random.Random(7)
        nodes = list(range(40))
        edges = [
            tuple(sorted(rng.sample(nodes, 2))) for _ in range(45)
        ]
        # reference union-find
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {n for e in edges for n in e}
        want = {
            n: min(m for m in touched if find(m) == find(n))
            for n in touched
        }
        got = self._clusters(spark, edges)
        assert got == want

    def test_end_to_end_from_jaccard(self, docs):
        sets = dedup.word_shingle_hash_sets(docs)
        pairs = dedup.jaccard_all_pairs_from_sets(sets, 0.5)
        out = dedup.duplicate_clusters(pairs).collect()
        got = {r["id"]: r["cluster_id"] for r in out}
        # 0,1,5 are exact dups (post-normalization), 2 is a near-dup of
        # them; 3 and 4 share no pairs so they never appear
        assert got == {0: 0, 1: 0, 2: 0, 5: 0}

    def test_reliable_checkpoint_mode(self, spark, tmp_path):
        """use_reliable_checkpoint=True (the multi-node deployment
        mode, surviving executor loss): requires a configured
        checkpoint dir — clear error without one, identical labels
        with one."""
        import pytest

        edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        if spark.sparkContext.getCheckpointDir() is None:
            with pytest.raises(ValueError, match="setCheckpointDir"):
                dedup.duplicate_clusters(
                    pairs, use_reliable_checkpoint=True
                )
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        out = dedup.duplicate_clusters(
            pairs, use_reliable_checkpoint=True
        ).collect()
        got = {r["id"]: r["cluster_id"] for r in out}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


class TestPiiRedaction:
    def test_redacts_and_counts(self, spark):
        rows = [
            (0, "mail a.b+c@x-corp.io and 10.0.0.1 then call +4915512345"),
            (1, "no pii here at all"),
            (2, "two mails p@q.com r@s.org, ip 255.255.255.255"),
        ]
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in text.redact_pii(d).collect()}
        assert out[0]["clean_text"] == "mail <EMAIL> and <IP> then call <PHONE>"
        assert (out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]) == (1, 1, 1)
        assert out[1]["clean_text"] == "no pii here at all"
        assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (0, 0, 0)
        assert out[2]["clean_text"] == "two mails <EMAIL> <EMAIL>, ip <IP>"
        assert out[2]["n_emails"] == 2 and out[2]["n_ips"] == 1


class TestContamination:
    def test_planted_overlap(self, spark):
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")],
            ["doc_id", "text"],
        )
        corpus = spark.createDataFrame(
            [
                # contains the benchmark 5-gram "alpha beta gamma delta
                # epsilon" but not the second one
                (0, "intro alpha beta gamma delta epsilon outro words"),
                (1, "totally clean document with no benchmark overlap"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["id"]: r
            for r in dedup.benchmark_contamination(
                corpus, bench, k=5
            ).collect()
        }
        assert set(out) == {0}
        assert out[0]["n_overlap"] == 1
        # doc 0 has 8 words -> 4 distinct 5-shingles
        assert out[0]["n_shingles"] == 4
        assert abs(out[0]["overlap_frac"] - 0.25) < 1e-9


class TestTfidfKeywords:
    def test_rare_word_outranks_common_at_equal_tf(self, spark):
        rows = [
            (0, "shared shared unique0"),
            (1, "shared shared unique1"),
            (2, "shared shared unique2"),
        ]
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        out = text.tfidf_keywords(d, top_k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["id"], []).append(r)
        for doc_id, recs in by_doc.items():
            recs.sort(key=lambda r: r["rank"])
            # tf: 'shared'=2 beats unique=1; the unique word is rank 2
            assert recs[0]["word"] == "shared" and recs[0]["tf"] == 2
            assert recs[1]["word"] == f"unique{doc_id}"
            # df('shared')=3 over 3 docs -> idf=ln(1)=0 -> score 0
            assert recs[0]["tfidf"] == 0.0
            # unique word: 1 * ln(3/1)
            assert abs(recs[1]["tfidf"] - round(math.log(3), 6)) < 1e-9


class TestUnigramLogprob:
    def test_known_corpus(self, spark):
        d = spark.createDataFrame(
            [(0, "a a b"), (1, "b c")], ["doc_id", "text"]
        )
        out = {r["id"]: r for r in text.unigram_logprob(d).collect()}
        # freqs over the corpus: a=2, b=2, c=1, total=5
        want0 = (math.log(2 / 5) + math.log(2 / 5) + math.log(2 / 5)) / 3
        want1 = (math.log(2 / 5) + math.log(1 / 5)) / 2
        assert out[0]["n_tokens"] == 3
        assert abs(out[0]["avg_logprob"] - want0) < 1e-9
        assert abs(out[1]["avg_logprob"] - want1) < 1e-9


class TestChunking:
    def test_window_arithmetic_and_edges(self, spark):
        from datawaves_etl_airflow_spark.operators.text import chunk_documents

        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(10))),
                (2, "short doc"),
                (3, ""),      # excluded
                (4, "   "),   # whitespace-only: excluded
            ],
            "doc_id long, text string",
        )
        rows = sorted(
            (r["doc_id"], r["chunk_id"], r["start_token"],
             r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(
                docs, chunk_tokens=4, overlap=1
            ).collect()
        )
        assert rows == [
            (1, 0, 0, 4, "w0 w1 w2 w3"),
            (1, 1, 3, 4, "w3 w4 w5 w6"),
            (1, 2, 6, 4, "w6 w7 w8 w9"),
            (2, 0, 0, 2, "short doc"),
        ]

    def test_coverage_and_overlap_invariants(self, spark):
        """Every token position is covered; consecutive chunks overlap
        by exactly `overlap` except possibly the short last one."""
        from datawaves_etl_airflow_spark.operators.text import chunk_documents

        n, chunk, ov = 137, 32, 8
        docs = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(n)))],
            "doc_id long, text string",
        )
        rows = sorted(
            (r["start_token"], r["n_tokens"])
            for r in chunk_documents(
                docs, chunk_tokens=chunk, overlap=ov
            ).collect()
        )
        covered = set()
        for s, m in rows:
            covered |= set(range(s, s + m))
        assert covered == set(range(n))
        strides = [b[0] - a[0] for a, b in zip(rows, rows[1:])]
        assert all(s == chunk - ov for s in strides)

    def test_overlap_must_be_smaller(self, spark):
        from datawaves_etl_airflow_spark.operators.text import chunk_documents

        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(spark.range(1), chunk_tokens=8, overlap=8)

    def test_negative_overlap_rejected(self, spark):
        from datawaves_etl_airflow_spark.operators.text import chunk_documents

        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(spark.range(1), chunk_tokens=4, overlap=-2)
        with pytest.raises(ValueError, match="chunk_tokens"):
            chunk_documents(spark.range(1), chunk_tokens=0, overlap=0)


class TestBm25:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "spark shuffles data between executors"),
                (2, "spark spark spark broadcast joins avoid shuffles"),
                (3, "the quick brown fox jumps over a lazy dog"),
                (4, "executors run tasks and tasks shuffle data"),
                (5, "a completely unrelated gardening manual chapter"),
            ],
            "doc_id long, text string",
        )

    def test_relevance_and_schema(self, spark):
        from datawaves_etl_airflow_spark.operators.text import bm25_topk

        qs = spark.createDataFrame(
            [(100, "spark shuffles")], "query_id long, query_text string"
        )
        got = bm25_topk(self._docs(spark), qs, k=3).collect()
        # exactly docs 1 and 2 contain a query term ("shuffle" in doc
        # 4 is a different token — no stemming, by design)
        assert [r["rank"] for r in got] == [1, 2]
        # doc 2's tf(spark)=3 saturation outweighs doc 1's two
        # distinct single hits at these lengths — the k1 tf curve
        assert got[0]["doc_id"] == 2
        assert {r["doc_id"] for r in got} == {1, 2}
        assert all(r["score"] > 0 for r in got)

    def test_matches_naive_python_reference(self, spark):
        """Value-level pin against a from-scratch Okapi-BM25 in plain
        Python over the same tokenization."""
        from datawaves_etl_airflow_spark.operators.text import bm25_topk

        docs = [(r["doc_id"], r["text"].lower().split())
                for r in self._docs(spark).collect()]
        n = len(docs)
        avgdl = sum(len(ws) for _, ws in docs) / n
        qterms = ["spark", "shuffles"]

        def score(ws):
            s = 0.0
            for t in set(qterms):
                df = sum(1 for _, w2 in docs if t in w2)
                if df == 0:
                    continue
                tf = ws.count(t)
                if tf == 0:
                    continue
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl)
                )
            return round(s, 6)

        want = sorted(
            ((d, score(ws)) for d, ws in docs if score(ws) > 0),
            key=lambda t: (-t[1], t[0]),
        )[:3]
        qs = spark.createDataFrame(
            [(100, "spark shuffles")], "query_id long, query_text string"
        )
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(self._docs(spark), qs, k=3).collect()
        ]
        assert got == want

    def test_max_df_ratio_valve_drops_stopword_terms(self, spark):
        """A term in >ratio of docs is pruned BEFORE the term join —
        the stopword valve; rare terms still score."""
        from datawaves_etl_airflow_spark.operators.text import bm25_topk

        docs = spark.createDataFrame(
            [(i, f"common filler text plus unique{i}") for i in range(10)],
            "doc_id long, text string",
        )
        qs = spark.createDataFrame(
            [(1, "common unique3")], "query_id long, query_text string"
        )
        valved = bm25_topk(docs, qs, k=10, max_df_ratio=0.5).collect()
        # 'common' (df=10/10) pruned -> only unique3's doc scores
        assert [r["doc_id"] for r in valved] == [3]
        full = bm25_topk(docs, qs, k=10).collect()
        assert len(full) == 10  # exact form keeps the stopword hits

    def test_no_term_overlap_query_returns_nothing(self, spark):
        from datawaves_etl_airflow_spark.operators.text import bm25_topk

        qs = spark.createDataFrame(
            [(7, "zzz qqq")], "query_id long, query_text string"
        )
        assert bm25_topk(self._docs(spark), qs, k=3).count() == 0


class TestRrfFuse:
    def test_fusion_arithmetic_and_union_semantics(self, spark):
        from datawaves_etl_airflow_spark.operators.text import rrf_fuse

        lex = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, doc_id long, rank long",
        )
        sem = spark.createDataFrame(
            [(1, 11, 1), (1, 13, 2)],
            "query_id long, doc_id long, rank long",
        )
        got = {r["doc_id"]: (r["rank"], r["rrf_score"])
               for r in rrf_fuse([lex, sem], k=10).collect()}
        # doc 11 appears in both lists -> 1/62 + 1/61
        assert got[11][1] == round(1 / 62 + 1 / 61, 6)
        assert got[11][0] == 1  # two mid ranks beat one first place
        # single-list docs score their lone term
        assert got[10][1] == round(1 / 61, 6)
        assert got[13][1] == round(1 / 62, 6)
        assert got[12][1] == round(1 / 63, 6)
        # 10 (1/61) > 13 (1/62) > 12 (1/63); ties impossible here
        ranks = sorted(got.items(), key=lambda t: t[1][0])
        assert [d for d, _ in ranks] == [11, 10, 13, 12]

    def test_rank_ties_break_on_id_and_k_cuts(self, spark):
        from datawaves_etl_airflow_spark.operators.text import rrf_fuse

        a = spark.createDataFrame(
            [(1, 20, 1), (1, 21, 1)],  # same rank in one leg: tie
            "query_id long, doc_id long, rank long",
        )
        got = rrf_fuse([a], k=1).collect()
        assert len(got) == 1 and got[0]["doc_id"] == 20  # id tiebreak

    def test_empty_input_list_raises(self, spark):
        from datawaves_etl_airflow_spark.operators.text import rrf_fuse

        with pytest.raises(ValueError, match="at least one"):
            rrf_fuse([])


class TestSemanticDecontaminate:
    def test_planted_leakage_flagged_others_kept(self, spark):
        import random as _random

        from datawaves_etl_airflow_spark.operators.similarity import (
            semantic_decontaminate,
        )

        rng = _random.Random(3)
        corpus = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(50)],
            "vec_id long, embedding array<double>",
        )
        # benchmark = exact copies of rows 5 and 7 under new ids
        bench = corpus.filter(F.col("vec_id").isin([5, 7])).select(
            (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
        )
        got = {r["vec_id"]: r for r in semantic_decontaminate(
            corpus, bench, threshold=0.999
        ).collect()}
        assert len(got) == 50  # every corpus row reported
        assert got[5]["contaminated"] and got[7]["contaminated"]
        assert got[5]["benchmark_id"] == 1005
        assert got[5]["max_benchmark_sim"] == 1.0
        assert sum(1 for r in got.values() if r["contaminated"]) == 2

    def test_null_and_zero_vectors_kept_unflagged(self, spark):
        from datawaves_etl_airflow_spark.operators.similarity import (
            semantic_decontaminate,
        )

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, None), (3, [0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        bench = spark.createDataFrame(
            [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        got = {r["vec_id"]: r for r in semantic_decontaminate(
            corpus, bench, threshold=0.9
        ).collect()}
        assert got[1]["contaminated"] is True
        for vid in (2, 3):  # unscorable -> kept, NULL evidence
            assert got[vid]["contaminated"] is False
            assert got[vid]["max_benchmark_sim"] is None
            assert got[vid]["benchmark_id"] is None

    def test_corpus_never_shuffles(self, spark):
        """The benchmark folds to one broadcast row; the corpus plan
        must stay scan -> project (no Exchange on the corpus side)."""
        import random as _random

        from datawaves_etl_airflow_spark.operators.similarity import (
            semantic_decontaminate,
        )

        rng = _random.Random(3)
        corpus = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)],
            "vec_id long, embedding array<double>",
        )
        out = semantic_decontaminate(corpus, corpus.limit(3), 0.9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        # the only exchange feeds the 1-row benchmark fold
        assert plan.count("Exchange") <= 2

    def test_benchmark_size_guard_raises_past_bound(self, spark):
        """The broadcast-fold plan builds ONE array row from the whole
        benchmark — past max_benchmark_rows that row is pathological,
        so the operator must raise and point at the index-backed form
        instead of silently building it."""
        import pytest as _pytest

        from datawaves_etl_airflow_spark.operators.similarity import (
            semantic_decontaminate,
        )

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        bench = spark.createDataFrame(
            [(i, [1.0, 0.0]) for i in range(5)],
            "vec_id long, embedding array<double>",
        )
        with _pytest.raises(ValueError, match="max_benchmark_rows"):
            semantic_decontaminate(
                corpus, bench, max_benchmark_rows=3
            )
        # raising the bound explicitly keeps the small-benchmark path
        assert semantic_decontaminate(
            corpus, bench, max_benchmark_rows=5
        ).count() == 1

    def test_index_variant_matches_broadcast_at_full_probe(
        self, spark, tmp_path
    ):
        """semantic_decontaminate_index over the corpus's persisted IVF
        index at FULL probe returns exactly the broadcast form's
        contaminated rows — same argmax/tiebreak/rounding contract,
        range-search semantics (no per-benchmark-row k cutoff)."""
        import random as _random

        from datawaves_etl_airflow_spark.operators.similarity import (
            semantic_decontaminate,
            semantic_decontaminate_index,
            write_ivf_index,
        )

        rng = _random.Random(3)
        corpus = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)],
            "vec_id long, embedding array<double>",
        )
        # two planted leaks, one of them duplicated in the benchmark
        # under two ids (5 -> 1005 and 2005: argmax ties break to the
        # SMALLER benchmark id, certifying the tiebreak end to end)
        bench = corpus.filter(F.col("vec_id").isin([5, 7])).select(
            (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
        ).union(
            corpus.filter(F.col("vec_id") == 5).select(
                (F.col("vec_id") + 2000).alias("vec_id"), "embedding"
            )
        )
        p = str(tmp_path / "decon_ivf")
        write_ivf_index(corpus, p, n_centroids=4, n_iters=1)
        got = sorted(
            map(tuple, semantic_decontaminate_index(
                bench, p, threshold=0.999, nprobe=4
            ).collect())
        )
        want = sorted(
            map(tuple, semantic_decontaminate(
                corpus, bench, threshold=0.999
            ).filter(F.col("contaminated")).collect())
        )
        assert got == want
        assert len(got) == 2
        flagged = {r[0]: r[1] for r in got}
        assert flagged[5] == 1005  # smaller-id tiebreak

    def test_index_variant_null_benchmark_and_id_guard(
        self, spark, tmp_path
    ):
        import pytest as _pytest

        from datawaves_etl_airflow_spark.operators.similarity import (
            semantic_decontaminate_index,
            write_ivf_index,
        )

        corpus = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        p = str(tmp_path / "decon_ivf2")
        write_ivf_index(corpus, p, n_centroids=2, n_iters=1)
        sbench = spark.createDataFrame(
            [("b", [1.0, 1.0])], "vec_id string, embedding array<double>"
        )
        with _pytest.raises(ValueError, match="must be numeric"):
            semantic_decontaminate_index(sbench, p)
        # NULL / zero benchmark vectors are unscorable probes: skipped
        nbench = spark.createDataFrame(
            [(1, None), (2, [0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        assert semantic_decontaminate_index(
            nbench, p, threshold=0.5, nprobe=2
        ).count() == 0


class TestBm25Prf:
    """bm25_prf_topk: pseudo-relevance-feedback expansion — the
    vocabulary-mismatch recall lever (Rocchio/RM3). Deterministic by
    construction: integer-tf term mining with term tiebreaks, binary-
    fraction weights, the shared rounded-ln ranking."""

    def test_recovers_vocabulary_mismatch(self, spark):
        """The canonical PRF win: the query says "automobile", the
        target doc only says "motorcar" — but a feedback doc contains
        both, so the mined term bridges the vocabulary gap."""
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_prf_topk,
            bm25_topk,
        )

        docs = spark.createDataFrame(
            [
                (1, "automobile motorcar motorcar motorcar engine"),
                (2, "motorcar motorcar chassis wheels brakes"),
                (3, "gardening soil compost seeds watering cans"),
                (4, "orbital mechanics delta vee transfer windows"),
                (5, "sourdough starter hydration ratios and folds"),
            ],
            "doc_id long, text string",
        )
        qs = spark.createDataFrame(
            [(100, "automobile")], "query_id long, query_text string"
        )
        plain = bm25_topk(docs, qs, k=5).collect()
        assert {r["doc_id"] for r in plain} == {1}  # mismatch: doc 2 missed
        prf = bm25_prf_topk(
            docs, qs, k=5, fb_docs=1, fb_terms=2, fb_weight=0.5
        ).collect()
        # feedback doc 1 mines "motorcar" (tf 3) — doc 2 now retrieved
        assert {r["doc_id"] for r in prf} == {1, 2}
        by_rank = {r["rank"]: r["doc_id"] for r in prf}
        assert by_rank[1] == 1  # original term still dominates

    def test_no_new_terms_degrades_to_plain_bm25(self, spark):
        """Feedback docs whose vocabulary is a subset of the query's
        mine no new terms (originals keep weight 1.0 via the max-
        weight union), so PRF must equal plain BM25 value-for-value."""
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_prf_topk,
            bm25_topk,
        )

        docs = spark.createDataFrame(
            [
                (1, "spark shuffles spark shuffles"),
                (2, "shuffles spark"),
                (3, "gardening soil compost seeds watering"),
            ],
            "doc_id long, text string",
        )
        qs = spark.createDataFrame(
            [(100, "spark shuffles")], "query_id long, query_text string"
        )
        plain = sorted(map(tuple, bm25_topk(docs, qs, k=3).collect()))
        prf = sorted(
            map(
                tuple,
                bm25_prf_topk(
                    docs, qs, k=3, fb_docs=2, fb_terms=5
                ).collect(),
            )
        )
        assert plain == prf

    def test_mined_term_tiebreak_is_lexicographic(self, spark):
        """Equal integer tf in the feedback set → the lexicographically
        smaller term is mined (no float enters the selection)."""
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_prf_topk,
        )

        docs = spark.createDataFrame(
            [
                (1, "query zebra apple"),   # feedback doc: zebra/apple tf 1 each
                (2, "apple apple orchard"),
                (3, "zebra zebra savanna"),
                (4, "unrelated filler text entirely"),
            ],
            "doc_id long, text string",
        )
        qs = spark.createDataFrame(
            [(100, "query")], "query_id long, query_text string"
        )
        # fb_terms=2 admits "apple" + "query" but NOT "zebra" ("apple"
        # < "query" < "zebra" at tf 1): doc 2 retrieved, doc 3 not
        got = bm25_prf_topk(
            docs, qs, k=4, fb_docs=1, fb_terms=2
        ).collect()
        ids = {r["doc_id"] for r in got}
        assert 2 in ids
        assert 3 not in ids

    def test_validation(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_prf_topk,
        )

        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        qs = spark.createDataFrame(
            [(1, "a")], "query_id long, query_text string"
        )
        with pytest.raises(ValueError, match="fb_docs"):
            bm25_prf_topk(docs, qs, fb_docs=0)
        with pytest.raises(ValueError, match="fb_terms"):
            bm25_prf_topk(docs, qs, fb_terms=-1)
        with pytest.raises(ValueError, match="fb_weight"):
            bm25_prf_topk(docs, qs, fb_weight=0.0)
        with pytest.raises(ValueError, match="fb_weight"):
            bm25_prf_topk(docs, qs, fb_weight=1.5)

    def test_valve_prunes_the_mining_pool(self, spark):
        """max_df_ratio must exclude stopword-grade terms BEFORE the
        fb_terms window: otherwise mined stopwords fill every slot,
        pass 2's df filter drops them, and PRF silently degrades to
        plain BM25 on exactly the corpora it targets."""
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_prf_topk,
        )

        # "the" is in every doc (df ratio 1.0); the feedback doc's
        # top-tf term is "the", but the valve must mine "motorcar"
        docs = spark.createDataFrame(
            [
                (1, "the the the automobile motorcar motorcar"),
                (2, "the motorcar chassis wheels"),
                (3, "the gardening soil compost"),
                (4, "the orbital mechanics transfer"),
            ],
            "doc_id long, text string",
        )
        qs = spark.createDataFrame(
            [(100, "automobile")], "query_id long, query_text string"
        )
        got = bm25_prf_topk(
            docs, qs, k=4, fb_docs=1, fb_terms=1, max_df_ratio=0.9
        ).collect()
        # with "the" valved out of mining, the single mined slot goes
        # to motorcar (tf 2 beats automobile's 1) -> doc 2 retrieved
        assert 2 in {r["doc_id"] for r in got}


class TestMmrRerank:
    """mmr_rerank: greedy diversity re-ranking — the set-level
    objective no pointwise score expresses."""

    def _cands(self, spark):
        # cluster A: 1/2 identical direction, high relevance;
        # B: orthogonal, mid relevance; C: opposite, lower relevance
        return spark.createDataFrame(
            [
                (1, 11, 0.98, [1.0, 0.0, 0.0]),
                (1, 12, 0.97, [1.0, 0.0, 0.0]),
                (1, 13, 0.80, [0.0, 1.0, 0.0]),
                (1, 14, 0.70, [-1.0, 0.0, 0.0]),
            ],
            "query_id long, match_id long, cosine_sim double, "
            "embedding array<double>",
        )

    def test_diversifies_redundant_topk(self, spark):
        from datawaves_etl_airflow_spark.operators.similarity import (
            mmr_rerank,
        )

        got = {
            r["mmr_rank"]: r["match_id"]
            for r in mmr_rerank(
                self._cands(spark), k=3, lambda_=0.5
            ).collect()
        }
        # pick 1: best relevance (11). pick 2: 12 is fully redundant
        # (sim 1.0 -> value -0.005) while 13 is orthogonal (0.40) and
        # 14 anti-parallel (0.35 + 0.5 = 0.85): 14 wins on the
        # diversity term. pick 3: 13 (sim 0 to both) beats 12.
        assert got == {1: 11, 2: 14, 3: 13}

    def test_lambda_one_is_relevance_order(self, spark):
        from datawaves_etl_airflow_spark.operators.similarity import (
            mmr_rerank,
        )

        got = [
            r["match_id"]
            for r in sorted(
                mmr_rerank(
                    self._cands(spark), k=4, lambda_=1.0
                ).collect(),
                key=lambda r: r["mmr_rank"],
            )
        ]
        assert got == [11, 12, 13, 14]

    def test_null_vector_is_orthogonal_not_excluded(self, spark):
        from datawaves_etl_airflow_spark.operators.similarity import (
            mmr_rerank,
        )

        cands = spark.createDataFrame(
            [
                (1, 11, 0.99, [1.0, 0.0]),
                (1, 12, 0.98, [1.0, 0.0]),
                (1, 13, 0.60, None),
            ],
            "query_id long, match_id long, cosine_sim double, "
            "embedding array<double>",
        )
        got = {
            r["mmr_rank"]: r["match_id"]
            for r in mmr_rerank(cands, k=2, lambda_=0.5).collect()
        }
        # the NULL-vec candidate is never redundancy-penalized: it
        # beats the identical twin for the second slot
        assert got == {1: 11, 2: 13}

    def test_validation(self, spark):
        from datawaves_etl_airflow_spark.operators.similarity import (
            mmr_rerank,
        )

        with pytest.raises(ValueError, match="lambda_"):
            mmr_rerank(self._cands(spark), lambda_=1.5)
        with pytest.raises(ValueError, match="k must"):
            mmr_rerank(self._cands(spark), k=0)

    def test_mmr_string_ids(self, spark):
        """The output carries the input's id types — string doc ids
        are a supported surface."""
        from datawaves_etl_airflow_spark.operators.similarity import (
            mmr_rerank,
        )

        cands = spark.createDataFrame(
            [
                ("q1", "docA", 0.99, [1.0, 0.0]),
                ("q1", "docB", 0.98, [1.0, 0.0]),
                ("q1", "docC", 0.70, [0.0, 1.0]),
            ],
            "query_id string, match_id string, cosine_sim double, "
            "embedding array<double>",
        )
        got = {
            r["mmr_rank"]: r["match_id"]
            for r in mmr_rerank(cands, k=2, lambda_=0.5).collect()
        }
        assert got == {1: "docA", 2: "docC"}


class TestRetrievalMetrics:
    """retrieval_metrics: nDCG@k / MRR / hit counts over any ranked
    list + graded qrels — hand-computed values, edge conventions."""

    def _run(self, spark, results, qrels, k=3):
        from datawaves_etl_airflow_spark.operators.text import (
            retrieval_metrics,
        )

        res = spark.createDataFrame(
            results, "query_id long, doc_id long, rank int"
        )
        qr = spark.createDataFrame(
            qrels, "query_id long, doc_id long, rel int"
        )
        return {
            r["query_id"]: r
            for r in retrieval_metrics(res, qr, k=k).collect()
        }

    def test_hand_computed_ndcg(self, spark):
        got = self._run(
            spark,
            # ranks 1..3: rel 2, unjudged, rel 1; rel-3 doc unretrieved
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            [(1, 10, 2), (1, 12, 1), (1, 99, 3)],
        )[1]
        dcg = 3.0 / 1.0 + 0.0 + 1.0 / 2.0
        idcg = 7.0 + 3.0 / math.log2(3.0) + 1.0 / 2.0
        assert got["ndcg_at_k"] == round(dcg / idcg, 6)
        assert got["mrr"] == 1.0
        assert got["n_rel_in_k"] == 2

    def test_no_positive_qrels_scores_zero(self, spark):
        got = self._run(
            spark, [(1, 10, 1), (1, 11, 2)], [(1, 10, 0)]
        )[1]
        assert got["ndcg_at_k"] == 0.0
        assert got["mrr"] == 0.0
        assert got["n_rel_in_k"] == 0

    def test_mrr_first_positive_rank(self, spark):
        got = self._run(
            spark,
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            [(1, 11, 1)],
        )[1]
        assert got["mrr"] == 0.5
        assert got["n_rel_in_k"] == 1

    def test_k_cut_ignores_deep_hits(self, spark):
        got = self._run(
            spark,
            [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4)],
            [(1, 13, 3)],
            k=3,
        )[1]
        assert got["n_rel_in_k"] == 0
        assert got["mrr"] == 0.0
        # but IDCG truncation is at k over qrels, and DCG saw nothing:
        assert got["ndcg_at_k"] == 0.0

    def test_validation(self, spark):
        import pytest as _pytest

        from datawaves_etl_airflow_spark.operators.text import (
            retrieval_metrics,
        )

        res = spark.createDataFrame(
            [(1, 10, 1)], "query_id long, doc_id long, rank int"
        )
        with _pytest.raises(ValueError, match="k must"):
            retrieval_metrics(res, res, k=0)


class TestHardNegatives:
    """mine_hard_negatives: DPR-style BM25 hard negatives — the
    top-ranked retrieved docs not judged positive, re-ranked."""

    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "spark shuffles data between executors"),
                (2, "spark spark spark broadcast joins avoid shuffles"),
                (3, "the quick brown fox jumps over a lazy dog"),
                (4, "spark executors run tasks and shuffles happen"),
                (5, "a completely unrelated gardening manual chapter"),
                (6, "spark shuffles and more spark shuffles daily"),
            ],
            "doc_id long, text string",
        )

    def _queries(self, spark):
        return spark.createDataFrame(
            [(100, "spark shuffles")],
            "query_id long, query_text string",
        )

    def test_positives_excluded_and_reranked(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bm25_topk,
            mine_hard_negatives,
        )

        # judge the retrieval's #1 doc relevant; rel=0 rows are NOT
        # positives (the DPR convention: judged-irrelevant is a fair
        # — even ideal — negative)
        hits = bm25_topk(
            self._corpus(spark), self._queries(spark), k=6
        ).collect()
        top1 = hits[0]["doc_id"]
        qrels = spark.createDataFrame(
            [(100, top1, 2), (100, 3, 0)],
            "query_id long, doc_id long, rel int",
        )
        got = mine_hard_negatives(
            self._corpus(spark), self._queries(spark), qrels,
            n_negatives=2, depth=6,
        ).collect()
        assert [r["neg_rank"] for r in got] == [1, 2]
        assert top1 not in {r["doc_id"] for r in got}
        # neg_rank 1 is the best-ranked NON-positive retrieved doc
        non_pos = [r for r in hits if r["doc_id"] != top1]
        assert got[0]["doc_id"] == non_pos[0]["doc_id"]
        assert got[0]["score"] == non_pos[0]["score"]

    def test_unjudged_query_keeps_full_pool(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            mine_hard_negatives,
        )

        qrels = spark.createDataFrame(
            [], "query_id long, doc_id long, rel int"
        )
        got = mine_hard_negatives(
            self._corpus(spark), self._queries(spark), qrels,
            n_negatives=3, depth=6,
        ).collect()
        assert [r["neg_rank"] for r in got] == [1, 2, 3]

    def test_index_form_matches_in_session(self, spark, tmp_path):
        from datawaves_etl_airflow_spark.operators.text import (
            mine_hard_negatives,
            mine_hard_negatives_index,
            write_bm25_index,
        )

        qrels = spark.createDataFrame(
            [(100, 2, 1)], "query_id long, doc_id long, rel int"
        )
        p = str(tmp_path / "hnidx")
        write_bm25_index(self._corpus(spark), p, n_buckets=8)
        got = sorted(
            map(
                tuple,
                mine_hard_negatives_index(
                    self._queries(spark), qrels, p,
                    n_negatives=3, depth=5,
                ).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                mine_hard_negatives(
                    self._corpus(spark), self._queries(spark), qrels,
                    n_negatives=3, depth=5,
                ).collect(),
            )
        )
        assert got == want and len(got) > 0


class TestSourceOverlap:
    """source_overlap: cross-source shingle contamination matrix."""

    def _docs(self, spark):
        # src a and b share the 'alpha bravo charlie delta' run;
        # src c is disjoint
        return spark.createDataFrame(
            [
                (1, "a", "alpha bravo charlie delta echo"),
                (2, "a", "foxtrot golf hotel india juliet"),
                (3, "b", "alpha bravo charlie delta kilo"),
                (4, "b", "lima mike november oscar papa"),
                (5, "c", "quebec romeo sierra tango uniform"),
            ],
            "doc_id long, source string, text string",
        )

    def test_matrix_values(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            source_overlap,
        )

        got = {
            (r["source_a"], r["source_b"]): (r["n_shared"], r["jaccard"])
            for r in source_overlap(self._docs(spark), k=3).collect()
        }
        # shared 3-grams of a∩b: 'alpha bravo charlie',
        # 'bravo charlie delta' = 2; each source has 6 distinct
        # 3-grams (2 docs × 3 grams, no within-source repeats)
        assert got[("a", "b")] == (2, round(2 / (6 + 6 - 2), 6))
        # disjoint pairs produce NO row (inner join — absence is the
        # signal, matching the oracle's semantics)
        assert ("a", "c") not in got and ("b", "c") not in got

    def test_hashed_equals_string_form(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            source_overlap,
        )

        d = self._docs(spark)
        h = sorted(map(tuple, source_overlap(d, hashed=True).collect()))
        s = sorted(map(tuple, source_overlap(d, hashed=False).collect()))
        assert h == s and len(h) == 1


    def test_max_sources_per_shingle_valve(self, spark):
        """The stopword-gram valve removes universal shingles from the
        measured UNIVERSE (totals shrink too — jaccard stays a true
        set Jaccard over the valved universe)."""
        from datawaves_etl_airflow_spark.operators.dedup import (
            source_overlap,
        )

        # 'x y z' in all three sources (valved at <=2); 'p q r'
        # shared by a,b only (kept)
        d = spark.createDataFrame(
            [
                (1, "a", "x y z p q r"),
                (2, "b", "x y z p q r"),
                (3, "c", "x y z m n o"),
            ],
            "doc_id long, source string, text string",
        )
        got = {
            (r["source_a"], r["source_b"]): (r["n_shared"], r["jaccard"])
            for r in source_overlap(
                d, k=3, max_sources_per_shingle=2
            ).collect()
        }
        # per doc 3-grams: [xyz, yzp, zpq, pqr] / same / [xyz, yzm, zmn, mno]
        # xyz is in all 3 -> valved; a∩b keeps yzp, zpq, pqr (3 of 3)
        assert got[("a", "b")] == (3, 1.0)
        # a∩c shared only xyz -> valved away entirely: no row
        assert ("a", "c") not in got and ("b", "c") not in got


class TestCompressionRatio:
    """compression_ratio: the zlib compressibility quality signal —
    Arrow-batched scalar UDF, JVM-side arithmetic."""

    def test_values_match_direct_zlib(self, spark):
        import zlib

        from datawaves_etl_airflow_spark.operators.text import (
            compression_ratio,
        )

        texts = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
            (3, ""),
            (4, None),
        ]
        d = spark.createDataFrame(texts, "doc_id long, text string")
        got = {r["id"]: r for r in compression_ratio(d).collect()}
        for i, t in texts:
            if t is None:
                assert got[i]["n_compressed"] is None
                assert got[i]["ratio"] is None
            else:
                raw = t.encode("utf-8")
                z = len(zlib.compress(raw, 6))
                assert got[i]["n_bytes"] == len(raw)
                assert got[i]["n_compressed"] == z
                if raw:
                    assert got[i]["ratio"] == round(z / len(raw), 6)
                else:
                    assert got[i]["ratio"] is None
        # the signal: looped spam compresses far below natural prose
        assert got[2]["ratio"] < got[1]["ratio"]

    def test_plan_is_arrow_batched_not_row_python(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            compression_ratio,
        )

        d = spark.createDataFrame(
            [(1, "abc")], "doc_id long, text string"
        )
        plan = (
            compression_ratio(d)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan


class TestJaccardPrefixJoin:
    """jaccard_join_prefix: EXACT all-pairs via prefix filtering —
    must equal the exact O(n^2) base on every corpus, at every
    threshold (the zero-false-negative contract)."""

    def _random_docs(self, spark, seed, n=60):
        import random

        rng = random.Random(seed)
        vocab = [f"w{j}" for j in range(30)]
        rows = []
        for i in range(n):
            base = [rng.choice(vocab) for _ in range(rng.randint(3, 18))]
            rows.append((i, " ".join(base)))
            if i % 3 == 0:  # planted near-dup: perturb one word
                mut = list(base)
                mut[rng.randrange(len(mut))] = rng.choice(vocab)
                rows.append((1000 + i, " ".join(mut)))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_equals_exact_all_pairs_across_thresholds(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            jaccard_all_pairs_from_sets,
            jaccard_join_prefix,
            word_shingle_hash_sets,
        )

        for seed, t in [(1, 0.5), (2, 0.8), (3, 0.3), (4, 1.0)]:
            d = self._random_docs(spark, seed)
            got = sorted(
                (r["id_a"], r["id_b"], round(r["jaccard"], 9))
                for r in jaccard_join_prefix(d, threshold=t).collect()
            )
            sets = word_shingle_hash_sets(d)
            want = sorted(
                (r["id_a"], r["id_b"], round(r["jaccard"], 9))
                for r in jaccard_all_pairs_from_sets(
                    sets, threshold=t
                ).collect()
            )
            assert got == want, f"seed={seed} t={t}"
            assert len(got) > 0, f"seed={seed} t={t}: vacuous corpus"

    def test_boundary_pair_at_exact_threshold_kept(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            jaccard_join_prefix,
        )

        # docs sharing exactly half their shingle sets: 5 shared
        # 3-grams of 'a b c d e f g', sets sized to give J = 0.5
        d = spark.createDataFrame(
            [
                (1, "a b c d e f g h i j"),      # 8 shingles
                (2, "a b c d e f g x y z"),      # 8 shingles, 5 shared
            ],
            "doc_id long, text string",
        )
        # J = 5 / (8 + 8 - 5) = 5/11; exact-threshold boundary
        got = jaccard_join_prefix(d, threshold=5 / 11).collect()
        assert len(got) == 1 and abs(got[0]["jaccard"] - 5 / 11) < 1e-12

    def test_valve_is_explicit_recall_trade(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            jaccard_join_prefix,
        )

        # 6 identical docs: every prefix token is shared by all 6 —
        # the cap drops them, and the duplicate crowd goes unfound
        # (the documented trade; default None keeps exactness)
        d = spark.createDataFrame(
            [(i, "p q r s t u v w") for i in range(6)],
            "doc_id long, text string",
        )
        exact = jaccard_join_prefix(d, threshold=0.9).collect()
        assert len(exact) == 15  # all C(6,2) identical pairs
        valved = jaccard_join_prefix(
            d, threshold=0.9, max_docs_per_token=3
        ).collect()
        assert len(valved) == 0

    def test_invalid_threshold_raises(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            jaccard_join_prefix,
        )

        d = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="threshold"):
            jaccard_join_prefix(d, threshold=0.0)


class TestImageAhash:
    """image_ahash: perceptual average-hash → the text-SimHash
    candidate machinery, unchanged."""

    def _pgm(self, px):
        h = len(px)
        w = len(px[0])
        body = bytes(v for row in px for v in row)
        return b"P5\n%d %d\n255\n" % (w, h) + body

    def _grad(self, w, h, shift=0):
        return [
            [min(235, (3 * x + 5 * y) % 200) + shift for x in range(w)]
            for y in range(h)
        ]

    def test_identical_payloads_hash_identically(self, spark):
        from datawaves_etl_airflow_spark.operators.multimodal import (
            encode_fake_image,
            image_ahash,
        )

        docs = spark.createDataFrame(
            [(1, 32, 24), (2, 32, 24)], "doc_id long, w int, h int"
        )
        pays = encode_fake_image(docs, "w", "h").collect()
        # same bytes under two ids: re-attach row 1's payload as id 99
        dup = spark.createDataFrame(
            [(1, bytearray(pays[0]["payload"])),
             (99, bytearray(pays[0]["payload"]))],
            "id long, payload binary",
        )
        got = {r["id"]: r["simhash"] for r in image_ahash(dup).collect()}
        assert got[1] == got[99]

    def test_brightness_shift_is_invariant(self, spark):
        from datawaves_etl_airflow_spark.operators.multimodal import (
            image_ahash,
        )

        rows = [
            (1, bytearray(self._pgm(self._grad(16, 16)))),
            (2, bytearray(self._pgm(self._grad(16, 16, shift=20)))),
        ]
        d = spark.createDataFrame(rows, "id long, payload binary")
        got = {r["id"]: r["simhash"] for r in image_ahash(d).collect()}
        assert got[1] == got[2]

    def test_local_edit_small_hamming_found_by_pigeonhole(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            simhash_candidate_pairs,
        )
        from datawaves_etl_airflow_spark.operators.multimodal import (
            image_ahash,
        )

        base = self._grad(32, 32)
        edited = [row[:] for row in base]
        for y in range(4):          # blank one 4x4 corner block
            for x in range(4):
                edited[y][x] = 255
        import hashlib as _h

        noise = [
            [
                _h.sha256(b"%d:%d" % (y, x)).digest()[0]
                for x in range(32)
            ]
            for y in range(32)
        ]
        d = spark.createDataFrame(
            [
                (1, bytearray(self._pgm(base))),
                (2, bytearray(self._pgm(edited))),
                (3, bytearray(self._pgm(noise))),
            ],
            "id long, payload binary",
        )
        sigs = image_ahash(d)
        pairs = simhash_candidate_pairs(sigs).filter("hamming <= 3")
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 2) in got
        assert (1, 3) not in got and (2, 3) not in got

    def test_on_error_skip_quarantines(self, spark):
        from datawaves_etl_airflow_spark.operators.multimodal import (
            image_ahash,
        )

        d = spark.createDataFrame(
            [(1, bytearray(self._pgm(self._grad(8, 8)))),
             (2, bytearray(b"not an image"))],
            "id long, payload binary",
        )
        import pytest as _pt

        with _pt.raises(Exception, match="bad image container"):
            image_ahash(d).collect()
        got = image_ahash(d, on_error="skip").collect()
        assert [r["id"] for r in got] == [1]


class TestPassageContamination:
    """passage_contamination: the winnowing-theorem decontamination
    tier — a >= k+w-1-word verbatim quote MUST be flagged."""

    def test_quote_detected_diffuse_overlap_not(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            passage_contamination,
        )

        bench_words = [f"b{i}" for i in range(40)]
        bench = spark.createDataFrame(
            [(1, " ".join(bench_words))], "doc_id long, text string"
        )
        # doc 10 quotes a 23-word run verbatim inside unrelated text;
        # doc 11 shares many WORDS but no 8-word run (shuffled order);
        # doc 12 is unrelated
        filler = [f"x{i}" for i in range(30)]
        quote = bench_words[5:28]  # 23 words = k + w - 1
        shuffled = [bench_words[(7 * i + 3) % 40] for i in range(30)]
        corpus = spark.createDataFrame(
            [
                (10, " ".join(filler[:15] + quote + filler[15:])),
                (11, " ".join(shuffled)),
                (12, " ".join(f"z{i}" for i in range(40))),
            ],
            "doc_id long, text string",
        )
        got = {
            r["id"]: r["n_shared_fps"]
            for r in passage_contamination(
                corpus, bench, k=8, w=16
            ).collect()
        }
        assert 10 in got and got[10] >= 1
        assert 11 not in got and 12 not in got

    def test_min_shared_raises_the_bar(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            passage_contamination,
        )

        bench_words = [f"b{i}" for i in range(60)]
        bench = spark.createDataFrame(
            [(1, " ".join(bench_words))], "doc_id long, text string"
        )
        # the whole benchmark doc verbatim → many shared fps
        corpus = spark.createDataFrame(
            [(10, " ".join(bench_words))], "doc_id long, text string"
        )
        lo = passage_contamination(corpus, bench, min_shared=1)
        hi = passage_contamination(corpus, bench, min_shared=3)
        assert lo.first()["n_shared_fps"] >= 3
        assert hi.count() == 1

    def test_short_docs_emit_nothing(self, spark):
        from datawaves_etl_airflow_spark.operators.dedup import (
            passage_contamination,
        )

        bench = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [(10, "a b c")], "doc_id long, text string"
        )
        # both sides below k words: no fingerprints, no rows (exact
        # dedup is the tier for tiny docs — the winnowing contract)
        assert passage_contamination(corpus, bench, k=8).count() == 0


class TestBigramLogprob:
    """bigram_logprob: Stupid-Backoff vs a pure-Python replay."""

    def test_matches_reference_both_branches(self, spark):
        import math
        from collections import Counter

        from datawaves_etl_airflow_spark.operators.text import (
            bigram_logprob,
        )

        lm_rows = [(1, "the cat sat on the mat"),
                   (2, "the dog sat on the rug")]
        score_rows = lm_rows + [(3, "the cat ate a fish")]
        lm = spark.createDataFrame(lm_rows, "doc_id long, text string")
        d = spark.createDataFrame(
            score_rows, "doc_id long, text string"
        )
        got = {
            r["id"]: (r["n_scored"], r["avg_logprob"])
            for r in bigram_logprob(d, lm_docs=lm).collect()
        }
        toks = {i: t.split() for i, t in score_rows}
        lm_toks = [w for i, t in lm_rows for w in t.split()]
        lm_bi = Counter(
            (a, b)
            for i, t in lm_rows
            for a, b in zip(t.split(), t.split()[1:])
        )
        ctx = Counter(a for a, b in lm_bi.elements())
        uni = Counter(lm_toks)
        n = len(lm_toks)
        for i, ws in toks.items():
            lps = []
            for a, b in zip(ws, ws[1:]):
                if (a, b) in lm_bi:
                    lps.append(math.log(lm_bi[(a, b)] / ctx[a]))
                else:  # backoff, OOV continuation floored to count 1
                    lps.append(math.log(0.4 * uni.get(b, 1) / n))
            assert got[i][0] == len(lps)
            assert got[i][1] == round(sum(lps) / len(lps), 6), i

    def test_self_scoring_backoff_branch_is_dead(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bigram_logprob,
        )

        d = spark.createDataFrame(
            [(1, "a b c a b")], "doc_id long, text string"
        )
        r = bigram_logprob(d).first()
        # every transition seen: avg lp is finite and from the seen
        # branch only (c(ab)/c(a) ≤ 1 → lp ≤ 0)
        assert r["n_scored"] == 4 and r["avg_logprob"] <= 0

    def test_word_salad_scores_below_natural_transitions(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bigram_logprob,
        )

        lm = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog")
             for i in range(5)],
            "doc_id long, text string",
        )
        probe = spark.createDataFrame(
            [(100, "the quick brown fox jumps"),
             (101, "fox the jumps brown quick")],  # same WORDS, salad
            "doc_id long, text string",
        )
        got = {
            r["id"]: r["avg_logprob"]
            for r in bigram_logprob(probe, lm_docs=lm).collect()
        }
        assert got[100] > got[101]

    def test_sub_two_token_docs_emit_no_row(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bigram_logprob,
        )

        d = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, "a b")],
            "doc_id long, text string",
        )
        got = {r["id"] for r in bigram_logprob(d).collect()}
        assert got == {3}


class TestBpe:
    """bpe_pair_counts + train_bpe_merges: the tokenizer-training prep
    step — distributed word histogram, reference merge loop."""

    def _docs(self, spark):
        # "abab" x3, "abc" x2, "ab" x1 (lowercased by tokenize)
        return spark.createDataFrame(
            [
                (1, "abab abab ABc"),
                (2, "abab abc ab"),
            ],
            "doc_id long, text string",
        )

    def test_pair_counts_with_multiplicity(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bpe_pair_counts,
        )

        got = {
            r["pair"]: r["n"]
            for r in bpe_pair_counts(self._docs(spark)).collect()
        }
        # "abab" (freq 3): ab x2, ba x1  → ab 6, ba 3
        # "abc"  (freq 2): ab, bc        → ab 2, bc 2
        # "ab"   (freq 1): ab            → ab 1
        assert got == {"ab": 9, "ba": 3, "bc": 2}

    def test_top_n_is_deterministic(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bpe_pair_counts,
        )

        got = bpe_pair_counts(self._docs(spark), top_n=2).collect()
        assert [(r["pair"], r["n"]) for r in got] == [
            ("ab", 9), ("ba", 3),
        ]

    def test_merges_match_reference_algorithm(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bpe_pair_counts,
            train_bpe_merges,
        )

        merges = train_bpe_merges(self._docs(spark), n_merges=3)
        # iter 1: ab(9) → merge (a,b); hist: (ab,ab)x3, (ab,c)x2, (ab)x1
        # iter 2: (ab,ab)=3 vs (ab,c)=2 → merge (ab,ab)
        # iter 3: only (ab,c)=2 remains
        assert merges == [("a", "b"), ("ab", "ab"), ("ab", "c")]
        # first rule ≡ the distributed pair count's top-1, by
        # construction (same counts, same tiebreak)
        top1 = bpe_pair_counts(self._docs(spark), top_n=1).first()
        assert "".join(merges[0]) == top1["pair"]

    def test_merge_loop_stops_when_dry(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            train_bpe_merges,
        )

        one = spark.createDataFrame(
            [(1, "ab ab")], "doc_id long, text string"
        )
        # after (a,b) the only word is a single symbol — loop stops
        assert train_bpe_merges(one, n_merges=10) == [("a", "b")]

    def test_vocab_cap_raises_before_collect(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            train_bpe_merges,
        )

        with pytest.raises(ValueError, match="max_vocab_rows"):
            train_bpe_merges(
                self._docs(spark), n_merges=1, max_vocab_rows=2
            )


class TestBpeEncode:
    """bpe_encode (r12): the apply/encode half of the tokenizer story
    — greedy ordered merge application, expression tier (framed
    literal-replace chain) ≡ arrow tier ≡ a pure-Python reference."""

    def _ref_encode(self, text, merges):
        import re

        toks = []
        for w in re.split(r"\s+", text.lower(), flags=re.ASCII):
            if not w:
                continue
            syms = list(w)
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            toks.extend(syms)
        return toks

    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "abab abab abc"),
                (2, "the cat sat on the mat"),
                (3, "banana bandana"),
                (4, ""),
                (5, "  spaced   out  "),
                (6, None),  # NULL text ≡ '' in both tiers (ADVICE r12)
            ],
            "doc_id long, text string",
        )

    def test_expr_matches_reference(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bpe_encode,
            train_bpe_merges,
        )

        docs = self._corpus(spark)
        merges = train_bpe_merges(docs, n_merges=6)
        got = {
            r["id"]: (list(r["tokens"]), r["n_tokens"])
            for r in bpe_encode(docs, merges).collect()
        }
        for row in docs.collect():
            want = self._ref_encode(row["text"] or "", merges)
            assert got[row["doc_id"]] == (want, len(want)), row["text"]

    def test_expr_equals_arrow(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bpe_encode,
            train_bpe_merges,
        )

        docs = self._corpus(spark)
        merges = train_bpe_merges(docs, n_merges=6)
        expr = sorted(
            (r["id"], tuple(r["tokens"]), r["n_tokens"])
            for r in bpe_encode(docs, merges, method="expr").collect()
        )
        arrow = sorted(
            (r["id"], tuple(r["tokens"]), r["n_tokens"])
            for r in bpe_encode(docs, merges, method="arrow").collect()
        )
        assert expr == arrow and len(expr) == 6

    def test_roundtrip_concat_preserves_text(self, spark):
        """Segmentation must partition each word: concatenating the
        emitted tokens reproduces the whitespace-normalized text."""
        from datawaves_etl_airflow_spark.operators.text import (
            bpe_encode,
            train_bpe_merges,
        )

        docs = self._corpus(spark)
        merges = train_bpe_merges(docs, n_merges=8)
        got = {
            r["id"]: "".join(r["tokens"])
            for r in bpe_encode(docs, merges).collect()
        }
        for row in docs.collect():
            want = "".join((row["text"] or "").lower().split())
            assert got[row["doc_id"]] == want

    def test_framing_blocks_false_prefix_suffix_matches(self, spark):
        """The hazard the \\x01..\\x02 framing exists for: after rule
        (x,a) the word 'xab' holds symbols [xa, b]; rule (a,b) must
        NOT fire on the 'a' inside 'xa' (an unframed replace would
        produce 'xab' as one token). Mirror case on the suffix side."""
        from datawaves_etl_airflow_spark.operators.text import bpe_encode

        d = spark.createDataFrame(
            [(1, "xab"), (2, "abx"), (3, "ab")],
            "doc_id long, text string",
        )
        got = {
            r["id"]: list(r["tokens"])
            for r in bpe_encode(d, [("x", "a"), ("a", "b")]).collect()
        }
        assert got[1] == ["xa", "b"]
        assert got[2] == ["ab", "x"]
        assert got[3] == ["ab"]
        got2 = {
            r["id"]: list(r["tokens"])
            for r in bpe_encode(d, [("b", "x"), ("a", "b")]).collect()
        }
        assert got2[1] == ["x", "ab"]
        assert got2[2] == ["a", "bx"]

    def test_greedy_overlap_is_leftmost(self, spark):
        from datawaves_etl_airflow_spark.operators.text import bpe_encode

        d = spark.createDataFrame(
            [(1, "aaa aaaa")], "doc_id long, text string"
        )
        got = bpe_encode(d, [("a", "a")]).first()
        assert list(got["tokens"]) == ["aa", "a", "aa", "aa"]

    def test_bad_rule_raises(self, spark):
        from datawaves_etl_airflow_spark.operators.text import bpe_encode

        d = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
        with pytest.raises(ValueError, match="framing"):
            bpe_encode(d, [("a", "b c")])

    def test_expr_cap_raises(self, spark):
        from datawaves_etl_airflow_spark.operators.text import bpe_encode

        d = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
        rules = [("a", "b")] * 65
        with pytest.raises(ValueError, match="max_expr_rules"):
            bpe_encode(d, rules, method="expr")
        # auto silently takes the arrow tier instead
        assert bpe_encode(d, rules).first()["tokens"] == ["ab"]


class TestBpeVocabIds:
    """bpe_vocab + bpe_token_ids (r12): the words→ids completion —
    SentencePiece/GPT-2 id convention, literal-map lookup, no joins."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "abab abc"), (2, "cab ba")],
            "doc_id long, text string",
        )

    def test_vocab_convention(self, spark):
        from datawaves_etl_airflow_spark.operators.text import bpe_vocab

        v = {
            r["token"]: r["token_id"]
            for r in bpe_vocab(
                self._docs(spark), [("a", "b"), ("ab", "c")]
            ).collect()
        }
        # alphabet {a,b,c} codepoint-sorted at 0..2, merges appended
        assert v == {"a": 0, "b": 1, "c": 2, "ab": 3, "abc": 4}

    def test_every_emitted_token_resolves(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bpe_encode,
            bpe_token_ids,
            bpe_vocab,
            train_bpe_merges,
        )

        docs = self._docs(spark)
        merges = train_bpe_merges(docs, n_merges=4)
        enc = bpe_encode(docs, merges)
        ids = bpe_token_ids(enc, bpe_vocab(docs, merges)).collect()
        assert len(ids) == 2
        for r in ids:
            assert len(r["token_ids"]) == r["n_tokens"]
            assert all(i is not None for i in r["token_ids"])

    def test_ids_reversible_through_vocab(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            bpe_encode,
            bpe_token_ids,
            bpe_vocab,
        )

        docs = self._docs(spark)
        merges = [("a", "b")]
        vocab = bpe_vocab(docs, merges)
        inv = {r["token_id"]: r["token"] for r in vocab.collect()}
        got = bpe_token_ids(bpe_encode(docs, merges), vocab).collect()
        for r in got:
            assert [inv[i] for i in r["token_ids"]] == list(r["tokens"])

    def test_duplicate_merge_output_first_id_wins(self, spark):
        """ADVICE r12: distinct pairs can share a surface form in real
        BPE — ('a','bc') and ('ab','c') both yield 'abc'. HF-style
        vocab dedup: first occurrence keeps its id, ids stay dense."""
        from datawaves_etl_airflow_spark.operators.text import bpe_vocab

        got = {
            r["token"]: r["token_id"]
            for r in bpe_vocab(
                self._docs(spark),
                [("a", "b"), ("b", "c"), ("a", "bc"), ("ab", "c"), ("b", "a")],
            ).collect()
        }
        n_alpha = len(got) - 4  # abc appears once
        assert got["ab"] == n_alpha
        assert got["bc"] == n_alpha + 1
        assert got["abc"] == n_alpha + 2  # ('a','bc') wins, ('ab','c') skipped
        assert got["ba"] == n_alpha + 3  # ids dense after the skip
        # exact-duplicate rules dedup the same way
        got2 = {
            r["token"]: r["token_id"]
            for r in bpe_vocab(
                self._docs(spark), [("a", "b"), ("a", "b")]
            ).collect()
        }
        assert got2["ab"] == len(got2) - 1

    def test_alphabet_guard(self, spark):
        from datawaves_etl_airflow_spark.operators.text import bpe_vocab

        with pytest.raises(ValueError, match="max_alphabet"):
            bpe_vocab(self._docs(spark), [], max_alphabet=2)


class TestGopherFlags:
    """gopher_quality_flags (r12): every rule branch fires on planted
    constructions at the paper's default thresholds."""

    def _flags(self, spark, text):
        from datawaves_etl_airflow_spark.operators.text import (
            gopher_quality_flags,
        )

        d = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        return gopher_quality_flags(d).first()

    def _good_text(self):
        # 60 words, all alphabetic, mean length in [3,10], two
        # required stopwords, no symbols/bullets/ellipses
        return " ".join(
            ["the", "with"] + [f"word{i:02d}" for i in range(58)]
        )

    def test_good_doc_passes_everything(self, spark):
        r = self._flags(spark, self._good_text())
        assert r["pass_gopher"] is True
        for c in (
            "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
            "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
            "ok_stopwords",
        ):
            assert r[c] is True, c

    def test_short_doc_fails_word_count_only(self, spark):
        r = self._flags(spark, "the with alpha beta gamma")
        assert r["ok_word_count"] is False
        assert r["pass_gopher"] is False
        assert r["ok_stopwords"] is True

    def test_symbol_ratio(self, spark):
        # 7 hashes + 60 words -> ratio > 0.1
        r = self._flags(spark, self._good_text() + " #######")
        assert r["ok_symbol_ratio"] is False
        # ellipsis runs count /3: one '...' in 60 words is fine
        r2 = self._flags(spark, self._good_text() + "...")
        assert r2["ok_symbol_ratio"] is True
        assert r2["ellipsis_line_ratio"] == 1.0  # the one line ends ...
        assert r2["ok_ellipsis_lines"] is False

    def test_bullet_lines(self, spark):
        body = self._good_text()
        bullets = "\n".join(f"• item {i}" for i in range(19))
        r = self._flags(spark, body + "\n" + bullets)
        # 19 of 20 lines start with a bullet -> ratio 0.95 > 0.9
        assert r["ok_bullet_lines"] is False
        assert r["bullet_line_ratio"] == 0.95

    def test_alpha_word_ratio(self, spark):
        nums = " ".join(["123 456 789 000"] * 4)  # 16 non-alpha words
        r = self._flags(spark, self._good_text() + " " + nums)
        # 60 alpha / 76 total = 0.789 < 0.8
        assert r["ok_alpha_words"] is False

    def test_stopword_requirement(self, spark):
        text = " ".join(f"word{i:02d}" for i in range(60))
        r = self._flags(spark, text)
        assert r["n_required_stopwords"] == 0
        assert r["ok_stopwords"] is False
        r2 = self._flags(spark, text + " the that")
        assert r2["n_required_stopwords"] == 2
        assert r2["ok_stopwords"] is True

    def test_mean_word_len_bounds(self, spark):
        shorties = " ".join(["a b c d"] * 15)  # mean 1 < 3
        r = self._flags(spark, shorties + " the with")
        assert r["ok_mean_word_len"] is False
        longs = " ".join(["x" * 12] * 60)  # mean 12 > 10
        r2 = self._flags(spark, longs)
        assert r2["ok_mean_word_len"] is False

    def test_empty_doc(self, spark):
        r = self._flags(spark, "")
        assert r["n_words"] == 0
        assert r["pass_gopher"] is False


class TestC4Clean:
    """c4_clean (r12): the C4 line-level cleaning pass — filters,
    global duplicate-line dedup (first occurrence by (doc_id, pos)),
    ordered reassembly, min_lines doc gate."""

    def _clean(self, spark, rows, **kw):
        from datawaves_etl_airflow_spark.operators.text import c4_clean

        d = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["id"]: (r["text_clean"], r["n_lines_kept"])
            for r in c4_clean(d, **kw).collect()
        }

    def test_filters_and_reassembly(self, spark):
        got = self._clean(spark, [(
            1,
            "keep this first line.\n"
            "no terminal punctuation here\n"
            "too few.\n"
            "this page uses JavaScript everywhere.\n"
            "and keep this last line!",
        )])
        assert got[1] == (
            "keep this first line.\nand keep this last line!", 2
        )

    def test_page_blocklist_drops_whole_doc(self, spark):
        """Raffel §2.2 page-granularity rules (ADVICE r12): a curly
        bracket or 'lorem ipsum' ANYWHERE discards the page, not just
        the line — while Javascript stays a line-level rule."""
        got = self._clean(spark, [
            (1, "perfectly good first line.\ncurly { brace } here."),
            (2, "another good line survives.\nLorem Ipsum dolor sit."),
            (3, "good line stays put here.\nJavaScript only kills this line."),
        ])
        assert 1 not in got and 2 not in got
        assert got[3] == ("good line stays put here.", 1)

    def test_page_blocklist_off_restores_line_granularity(self, spark):
        got = self._clean(
            spark,
            [(1, "keep this good line here.\ncurly { brace } line out.")],
            page_blocklist=(),
            blocklist=("javascript", "{", "}"),
        )
        assert got[1] == ("keep this good line here.", 1)

    def test_global_line_dedup_keeps_first(self, spark):
        shared = "the shared boilerplate line repeats everywhere."
        got = self._clean(spark, [
            (1, f"doc one unique line.\n{shared}"),
            (2, f"{shared}\ndoc two unique line."),
            (3, shared),
        ])
        # first occurrence orders by (doc_id, pos): doc 1 pos 1 wins
        assert got[1] == (f"doc one unique line.\n{shared}", 2)
        assert got[2] == ("doc two unique line.", 1)
        # doc 3's only line was deduped away -> below min_lines
        assert 3 not in got

    def test_dedup_off_keeps_all(self, spark):
        shared = "the same line appears twice in here."
        got = self._clean(
            spark, [(1, f"{shared}\n{shared}")], dedup_lines=False
        )
        assert got[1] == (f"{shared}\n{shared}", 2)

    def test_min_lines_gate(self, spark):
        rows = [(1, "only one good line here."), (2, "two lines here.\nsecond good line too.")]
        got = self._clean(spark, rows, min_lines=2)
        assert 1 not in got and got[2][1] == 2

    def test_whitespace_trim_and_empty(self, spark):
        got = self._clean(spark, [(1, "   padded line kept fine.   \n\n   \n")])
        assert got[1] == ("padded line kept fine.", 1)
        assert self._clean(spark, [(2, "")]) == {}


class TestContrastivePairs:
    """build_contrastive_pairs (r12): positives x mined negatives per
    query — the DPR training-data emitter."""

    def test_join_semantics(self, spark):
        from datawaves_etl_airflow_spark.operators.text import (
            build_contrastive_pairs,
        )

        qrels = spark.createDataFrame(
            [(1, 10, 2), (1, 11, 1), (1, 12, 0), (2, 20, 1), (3, 30, 1)],
            "query_id long, doc_id long, rel long",
        )
        negs = spark.createDataFrame(
            [(1, 90, 1), (1, 91, 2), (2, 92, 1)],
            "query_id long, doc_id long, neg_rank long",
        )
        got = sorted(
            (r["query_id"], r["pos_id"], r["neg_id"], r["neg_rank"])
            for r in build_contrastive_pairs(qrels, negs).collect()
        )
        # q1: positives {10, 11} (12 is rel-0 -> fair negative, not a
        # positive) x negatives {90, 91}; q2: 20 x 92; q3: no mined
        # negatives -> emits nothing
        assert got == [
            (1, 10, 90, 1), (1, 10, 91, 2),
            (1, 11, 90, 1), (1, 11, 91, 2),
            (2, 20, 92, 1),
        ]


class TestPackSequencesTokenCol:
    """pack_sequences(n_tokens_col=...) (r12): precomputed counts make
    the packing exact under a trained vocabulary."""

    def test_precomputed_counts_drive_offsets(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            pack_sequences,
        )

        d = spark.createDataFrame(
            [(1, 300), (2, 300), (3, 100), (4, 0)],
            "doc_id long, n_tokens long",
        )
        got = {
            r["doc_id"]: (r["offset"], r["seq_start"], r["seq_end"])
            for r in pack_sequences(
                d, budget=512, shard_col=F.lit(0),
                n_tokens_col="n_tokens",
            ).collect()
        }
        # 300+300+100 laid end to end: doc2 straddles the 512 cut
        assert got == {
            1: (0, 0, 0), 2: (300, 0, 1), 3: (600, 1, 1),
        }

    def test_whitespace_default_unchanged(self, spark):
        from datawaves_etl_airflow_spark.operators.sampling import (
            pack_sequences,
        )

        d = spark.createDataFrame(
            [(1, "five words in this doc")], "doc_id long, text string"
        )
        r = pack_sequences(d, budget=4, shard_col=F.lit(0)).first()
        assert (r["n_tokens"], r["seq_start"], r["seq_end"]) == (5, 0, 1)


class TestGopherRepetition:
    """gopher_repetition_flags (r12): the A1.2 repetition signals on
    planted constructions."""

    def _one(self, spark, text, **kw):
        from datawaves_etl_airflow_spark.operators.text import (
            gopher_repetition_flags,
        )

        d = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        return gopher_repetition_flags(d, **kw).first()

    def test_duplicate_lines(self, spark):
        r = self._one(
            spark,
            "the cat sat quietly\nthe cat sat quietly\nanother line now",
        )
        # 3 lines, 1 beyond-first duplicate
        assert r["dup_line_fraction"] == round(1 / 3, 6)
        # dup line chars 19 of 19+19+16=54
        assert r["dup_line_char_fraction"] == round(19 / 54, 6)
        assert r["ok_dup_line_fraction"] is False

    def test_top_2gram_char_fraction(self, spark):
        # "ab cd" x3 + 6 distinct words, all length 2:
        # top 2-gram 'ab cd' occurs 3x, chars 3*4=12 of 24
        r = self._one(spark, "ab cd ab cd ab cd ee ff gg hh ii jj")
        assert r["top_2gram_char_fraction"] == 0.5
        assert r["ok_top_2gram_char_fraction"] is False

    def test_dup_5gram_beyond_first_accounting(self, spark):
        # the 5-word phrase repeats once (beyond-first = 1 run), then
        # unique filler; phrase chars = 5*2 = 10 of 40 total
        phrase = "aa bb cc dd ee"
        filler = " ".join(f"u{i}" for i in range(10))  # 10*2 chars
        r = self._one(spark, f"{phrase} zz {phrase} yy {filler}")
        # words: 5 + 1 + 5 + 1 + 10 = 22, chars = 44
        # dup 5-grams: exactly 'aa bb cc dd ee' twice -> (2-1)*10 = 10
        assert r["dup_5gram_char_fraction"] == round(10 / 44, 6)

    def test_clean_doc_passes(self, spark):
        r = self._one(
            spark, " ".join(f"word{i:03d}" for i in range(100))
        )
        assert r["pass_repetition"] is True

    def test_empty_doc(self, spark):
        r = self._one(spark, "")
        assert r["pass_repetition"] is True
        assert r["top_2gram_char_fraction"] == 0.0

    def test_threshold_override(self, spark):
        r = self._one(
            spark,
            "ab cd ab cd ab cd ee ff gg hh ii jj",
            thresholds={"top_2gram_char_fraction": 0.6},
        )
        assert r["ok_top_2gram_char_fraction"] is True


class TestBpeFertility:
    """llm_bpe_fertility building blocks: segmentation preserves word
    chars, so chars_per_token x fertility == mean word length."""

    def test_identity_rules_fertility_one(self, spark):
        from datawaves_etl_airflow_spark.operators.text import bpe_encode

        d = spark.createDataFrame(
            [(1, "aa bb cc")], "doc_id long, text string"
        )
        # rules that fully merge each word -> exactly one token per word
        r = bpe_encode(d, [("a", "a"), ("b", "b"), ("c", "c")]).first()
        assert r["n_tokens"] == 3  # fertility 1.0

    def test_no_rules_fertility_is_chars(self, spark):
        from datawaves_etl_airflow_spark.operators.text import bpe_encode

        d = spark.createDataFrame(
            [(1, "aa bb cc")], "doc_id long, text string"
        )
        r = bpe_encode(d, []).first()
        assert r["n_tokens"] == 6  # every char its own token


class TestFinewebPipeline:
    """llm_fineweb_pipeline (r13): the five-stage public-recipe
    composition — every gate must do non-vacuous work on the sf0.001
    corpus (the r12 lesson: paper-default top-n-gram caps on 8-word
    cleaned docs rejected EVERYTHING, and an empty-vs-empty parity
    pass proves nothing), and the composed plan stays free of
    all-pairs shapes and row-Python."""

    SF = "/root/testdata/sf0.001"

    def test_stages_split_not_erase(self, spark):
        from datawaves_etl_airflow_spark.operators import dedup, text
        from datawaves_etl_airflow_spark.queries.llm import (
            _FW_REP_THRESHOLDS,
            llm_fineweb_pipeline,
        )
        from pyspark.sql import functions as F

        d = spark.read.parquet(f"{self.SF}/documents.parquet")
        n_docs = d.count()
        ws = dedup.tokenize(F.col("text"))
        planted = d.select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.concat(F.array_join(F.slice(ws, 1, 8), " "), F.lit(".")),
                F.lit("the shared boilerplate line repeats everywhere."),
                F.array_join(F.slice(ws, 9, 4), " "),
                F.concat(F.array_join(F.slice(ws, 13, 2), " "), F.lit(".")),
            ).alias("text"),
        )
        base = text.c4_clean(planted).select(
            "id", F.col("text_clean").alias("text")
        )
        n_clean = base.count()
        gq = text.gopher_quality_flags(
            base, id_col="id", min_words=5, min_required_stopwords=1
        )
        n_q = gq.filter("pass_gopher").count()
        rep = text.gopher_repetition_flags(
            base, id_col="id", thresholds=_FW_REP_THRESHOLDS
        )
        n_r = rep.filter("pass_repetition").count()
        # every gate keeps SOME and drops SOME
        assert 0 < n_clean <= n_docs
        assert 0 < n_q < n_clean
        assert 0 < n_r < n_clean
        out = llm_fineweb_pipeline(spark, self.SF)
        rows = out.collect()
        assert 0 < len(rows) <= min(n_q, n_r)
        # packing contract: offsets are budget-consistent per shard
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r)
        for shard_rows in by_shard.values():
            shard_rows.sort(key=lambda r: r["doc_id"])
            off = 0
            for r in shard_rows:
                assert r["offset"] == off
                assert r["seq_start"] == off // 512
                assert r["seq_end"] == (off + r["n_tokens"] - 1) // 512
                off += r["n_tokens"]

    def test_plan_invariants(self, spark):
        from datawaves_etl_airflow_spark.queries.llm import (
            llm_fineweb_pipeline,
        )

        plan = (
            llm_fineweb_pipeline(spark, self.SF)
            ._jdf.queryExecution().executedPlan().toString()
        )
        for bad in ("CartesianProduct", "BatchEvalPython"):
            assert bad not in plan
        # minhash banding's one sanctioned Arrow surface
        assert "BroadcastNestedLoopJoin" not in plan
