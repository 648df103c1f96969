"""Dedup + similarity operators: recall/precision on planted dups."""

import pytest
from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import dedup, similarity

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),      # exact dup of 1
    (3, "THE quick   brown fox jumps over the lazy dog again and again"),    # norm dup of 1
    (4, "the quick brown fox jumps over the lazy cat again and again"),      # near dup (1 word)
    (5, "completely different content about spark execution engines today"),
    (6, "spark execution engines process columnar batches with codegen"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact(spark, docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1 and groups[0]["dup_cnt"] == 2 and groups[0]["canonical_id"] == 1


def test_normalized(spark, docs):
    groups = dedup.normalized_duplicates(docs).collect()
    assert len(groups) == 1 and groups[0]["dup_cnt"] == 3


def test_minhash_lsh_finds_near_dup(spark, docs):
    sigs = dedup.minhash_signatures(docs, shingle_n=2, num_hashes=32)
    cands = dedup.minhash_lsh_candidates(sigs, bands=8, rows_per_band=4)
    est = dedup.minhash_jaccard_estimate(sigs, cands)
    pairs = {(r["a_id"], r["b_id"]): r["est_jaccard"] for r in est.collect()}
    assert pairs.get((1, 2)) == 1.0  # exact dup: identical signature
    near = [(a, b) for (a, b) in pairs if {a, b} == {1, 4} or {a, b} == {2, 4}]
    assert near, "near-dup (one word changed) must share a band bucket"
    assert (1, 5) not in pairs and (1, 6) not in pairs


def test_short_docs_do_not_crash(spark):
    """Docs with fewer tokens than the shingle size must yield empty
    shingle arrays (matching the DuckDB oracle), not a Spark
    INVALID_PARAMETER_VALUE.START error, and must NOT all collide into
    one all-null-signature LSH bucket."""
    short = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, ""), (4, "a proper three token document here"),
         (5, "a proper three token document here")],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(short, shingle_n=3, num_hashes=8)
    rows = sigs.collect()
    assert {r["doc_id"] if "doc_id" in r else r["id"] for r in rows} == {4, 5}
    cands = dedup.minhash_lsh_candidates(sigs, bands=4, rows_per_band=2).collect()
    assert {(r["a_id"], r["b_id"]) for r in cands} == {(4, 5)}
    assert dedup.ngram_jaccard_pairs(short, threshold=0.3, shingle_n=3).count() == 1
    assert dedup.ngram_jaccard_pairs_inverted(short, threshold=0.3, shingle_n=3).count() == 1
    assert dedup.simhash(short).count() == 4  # only the empty doc drops


def test_simhash_hamming(spark, docs):
    fps = dedup.simhash(docs)
    cands = dedup.simhash_candidates(fps, prefix_bits=8, max_hamming=10)
    pairs = {(r["a_id"], r["b_id"]): r["hamming"] for r in cands.collect()}
    assert pairs.get((1, 2)) == 0


def test_ngram_jaccard(spark, docs):
    pairs = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3, shingle_n=2).collect()
    }
    assert pairs.get((1, 2)) == 1.0
    assert (1, 4) in pairs and pairs[(1, 4)] < 1.0
    assert (1, 5) not in pairs


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [0.9, 0.1, 0.0, 0.0], 0),
    (2, [0.0, 1.0, 0.0, 0.0], 1),
    (3, [0.0, 0.95, 0.05, 0.0], 1),
    (4, [0.0, 0.0, 0.0, 1.0], 2),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk(spark, vecs):
    got = similarity.brute_force_topk(vecs, [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in got] == [0, 1, 2]
    assert got[0]["cosine"] == 1.0


def test_ann_matches_brute_force_top1(spark, vecs):
    q = [1.0, 0.0, 0.0, 0.0]
    ann = similarity.ann_topk(vecs, q, dim=4, k=3, n_planes=8, bands=4).collect()
    assert ann[0]["vec_id"] == 0  # the identical vector always shares all buckets


def test_embedding_near_dups(spark, vecs):
    pairs = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in similarity.embedding_near_dups(vecs, threshold=0.9, group_col="label").collect()
    }
    assert (0, 1) in pairs and (2, 3) in pairs
    assert all(v >= 0.9 for v in pairs.values())


def test_ann_recall_on_real_embeddings(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(emb.where(F.col("vec_id") == 0).collect()[0]["embedding"])
    exact = [r["vec_id"] for r in similarity.brute_force_topk(emb, q, k=5).collect()]
    ann = [r["vec_id"] for r in similarity.ann_topk(emb, q, dim=64, k=5).collect()]
    # LSH recall: the query vector itself must be found; overlap is expected
    assert ann[0] == exact[0] == 0


def test_prefix_filtered_jaccard_matches_bruteforce(spark):
    """ngram_jaccard_pairs default (prefix-filtered, no group) must be
    EXACT: same rows as the within-group brute join over one group."""
    docs = spark.createDataFrame(
        [(i, t, "g") for i, t in DOCS], "doc_id long, text string, grp string"
    )
    brute = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3, shingle_n=2, group_col="grp").collect()
    }
    prefix = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3, shingle_n=2).collect()
    }
    assert prefix == brute and len(brute) >= 2


def test_jaccard_with_external_candidates(spark, docs):
    cands = spark.createDataFrame([(1, 2), (1, 5)], "a_id long, b_id long")
    rows = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.3, shingle_n=2, candidates=cands
        ).collect()
    }
    assert rows == {(1, 2): 1.0}  # (1,5) verified and rejected


def test_embedding_near_dups_requires_dim_or_candidates(spark, vecs):
    with pytest.raises(ValueError, match="dim"):
        similarity.embedding_near_dups(vecs, threshold=0.9)


def test_embedding_near_dups_srp_default(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(20, 64)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # planted near-dup of vec 0 (tiny perturbation -> same SRP buckets
    # with overwhelming probability, cosine ~ 1)
    rows.append((100, [float(x) for x in base[0] + 1e-4 * rng.randn(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["a_id"], r["b_id"])
        for r in similarity.embedding_near_dups(emb, threshold=0.99, dim=64).collect()
    }
    assert (0, 100) in got
    # exact-verify step: random pairs can never pass the 0.99 gate
    assert all(a == 0 and b == 100 for a, b in got)


class TestIvf:
    def test_ivf_assign_and_topk(self, spark):
        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cent = similarity.ivf_train_centroids(emb, dim=64, n_lists=8, sample=256)
        assert cent.shape == (8, 64)
        assigned = similarity.ivf_assign(emb, cent)
        lists = {r["list_id"] for r in assigned.select("list_id").distinct().collect()}
        assert lists <= set(range(8)) and len(lists) >= 2

        q = list(emb.where(F.col("vec_id") == 0).collect()[0]["embedding"])
        got = similarity.ivf_topk(emb, q, cent, nprobe=3, k=5).collect()
        # the query vector itself must be found (its own list is probed first)
        assert got[0]["vec_id"] == 0 and got[0]["cosine"] == 1.0

    def test_ivf_default_derives_sample_frac(self, spark):
        """sample_frac=None no longer means a TakeOrdered over the whole
        corpus: when the bounded probe (8*sample+1 rows) overflows, a
        derived md5-hash-rate filter (frac*n ~= 4*sample) is pushed into
        the training scan.  Plan assertion + exact numpy replication of
        the derived-frac centroids."""
        import hashlib

        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        # corpus = 500 rows > 8*32 = 256 -> filter must appear in the plan
        pool = similarity.ivf_training_pool(emb, sample=32)
        plan = pool._jdf.queryExecution().executedPlan().toString()
        assert "md5" in plan, plan
        # small corpus (500 <= 8*256): probe says skip the filter
        pool_small = similarity.ivf_training_pool(emb, sample=256)
        plan_small = pool_small._jdf.queryExecution().executedPlan().toString()
        assert "md5" not in plan_small, plan_small

        # exact replication of the derived-frac training sample
        frac = min(1.0, (4.0 * 32) / 500)
        thresh = format(min(int(frac * 2**32), 2**32 - 1), "08x")
        rows = emb.select("vec_id", "embedding").collect()
        kept = sorted(
            r["vec_id"]
            for r in rows
            if hashlib.md5(str(r["vec_id"]).encode()).hexdigest()[:8] < thresh
        )[:32]
        vecs = {r["vec_id"]: list(r["embedding"]) for r in rows}
        x = np.asarray([vecs[v] for v in kept], dtype="float64")
        rng = np.random.RandomState(42)
        exp = x[rng.choice(len(x), size=8, replace=False)]
        for _ in range(8):
            d2 = ((x[:, None, :] - exp[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(8):
                m = assign == j
                if m.any():
                    exp[j] = x[m].mean(axis=0)
        got = similarity.ivf_train_centroids(emb, dim=64, n_lists=8, sample=32)
        assert np.allclose(got, exp)

    def test_ivf_sample_frac_trains_on_hash_filtered_sample(self, spark):
        """sample_frac pre-filters centroid training by md5-hash rate
        (no TakeOrdered over the full corpus); the sample — hence the
        centroids — is an exact, rerun-stable function of the ids."""
        import hashlib

        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        frac = 0.5
        thresh = format(min(int(frac * 2**32), 2**32 - 1), "08x")
        rows = emb.select("vec_id", "embedding").collect()
        kept = sorted(
            (
                r["vec_id"]
                for r in rows
                if hashlib.md5(str(r["vec_id"]).encode()).hexdigest()[:8] < thresh
            )
        )[:128]
        vecs = {r["vec_id"]: list(r["embedding"]) for r in rows}
        x = np.asarray([vecs[v] for v in kept], dtype="float64")
        rng = np.random.RandomState(42)
        exp = x[rng.choice(len(x), size=8, replace=False)]
        for _ in range(8):
            d2 = ((x[:, None, :] - exp[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(8):
                m = assign == j
                if m.any():
                    exp[j] = x[m].mean(axis=0)
        got = similarity.ivf_train_centroids(
            emb, dim=64, n_lists=8, sample=128, sample_frac=frac
        )
        assert np.allclose(got, exp)

    def test_ivf_matches_numpy_oracle(self, spark):
        """Exact replication: same centroids, same probe set, same
        cosine ranking computed in numpy."""
        import math

        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        rows = emb.select("vec_id", "embedding").collect()
        vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype="float64") for r in rows}
        cent = similarity.ivf_train_centroids(emb, dim=64, n_lists=8, sample=256)
        q = vecs[3]
        order = (((cent - q[None, :]) ** 2).sum(axis=1)).argsort()
        probe = set(int(j) for j in order[:3])
        expected = []
        qn = math.sqrt(float(q @ q))
        for vid, v in vecs.items():
            d2 = ((cent - v[None, :]) ** 2).sum(axis=1)
            if int(d2.argmin()) in probe:
                expected.append((vid, round(float(q @ v) / (qn * math.sqrt(float(v @ v))), 6)))
        expected.sort(key=lambda t: (-t[1], t[0]))
        got = [
            (r["vec_id"], r["cosine"])
            for r in similarity.ivf_topk(emb, list(q), cent, nprobe=3, k=10).collect()
        ]
        assert [g[0] for g in got] == [e[0] for e in expected[:10]]
        for (gv, gc), (ev, ec) in zip(got, expected):
            assert abs(gc - ec) < 1e-6


class TestCollapseExact:
    """collapse_exact=True must be output-identical to the direct
    (uncollapsed) candidate machinery — the planted 50-dup fixture has
    both within-group (C(n,2)) and cross-group pairs."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        import __spark_entry__ as E

        return E._docs_with_dups(spark, "/root/testdata/sf0.001").cache()

    def test_collapse_groups_shape(self, spark, docs):
        reps, mem = dedup.collapse_exact_groups(docs)
        n_docs = docs.count()
        n_reps = reps.count()
        assert n_reps < n_docs  # planted dups collapsed
        assert mem.count() == n_docs  # every doc belongs to a group
        # every rep is its own member and the min id of its group
        bad = (
            mem.groupBy("rep_id")
            .agg(F.min("id").alias("lo"))
            .where(F.col("lo") != F.col("rep_id"))
            .count()
        )
        assert bad == 0

    def test_simhash_collapsed_equals_direct(self, spark, docs):
        direct = {
            (r["a_id"], r["b_id"], r["hamming"])
            for r in dedup.simhash_near_dup_pairs(
                docs, max_hamming=3, collapse_exact=False
            ).collect()
        }
        collapsed = {
            (r["a_id"], r["b_id"], r["hamming"])
            for r in dedup.simhash_near_dup_pairs(
                docs, max_hamming=3, collapse_exact=True
            ).collect()
        }
        assert collapsed == direct and len(direct) >= 50

    def test_minhash_collapsed_equals_direct(self, spark, docs):
        direct = {
            (r["a_id"], r["b_id"], round(r["est_jaccard"], 9))
            for r in dedup.minhash_near_dup_pairs(
                docs, threshold=0.5, collapse_exact=False
            ).collect()
        }
        collapsed = {
            (r["a_id"], r["b_id"], round(r["est_jaccard"], 9))
            for r in dedup.minhash_near_dup_pairs(
                docs, threshold=0.5, collapse_exact=True
            ).collect()
        }
        assert collapsed == direct and len(direct) >= 50


class TestIncrementalNearDups:
    """Catalog-backed rolling dedup: batch-vs-index probe + MERGE."""

    def _full_pairs(self, spark, docs_df, threshold):
        sigs = dedup.minhash_signatures(docs_df, shingle_n=2, num_hashes=32)
        cands = dedup.minhash_lsh_candidates(sigs, bands=8, rows_per_band=4)
        est = dedup.minhash_jaccard_estimate(sigs, cands)
        return {
            (r["a_id"], r["b_id"])
            for r in est.where(F.col("est_jaccard") >= threshold).collect()
        }

    def _inc(self, spark, cat, batch, threshold=0.5):
        return dedup.incremental_near_dup_pairs(
            spark, cat, batch, threshold=threshold, shingle_n=2
        )

    def test_union_over_batches_equals_full_run(self, spark, docs, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import ParquetCatalog

        cat = ParquetCatalog(str(tmp_path / "cat"))
        b1 = docs.where(F.col("doc_id") <= 3)
        b2 = docs.where(F.col("doc_id") > 3)
        got = {
            (r["a_id"], r["b_id"])
            for b in (b1, b2)
            for r in self._inc(spark, cat, b).collect()
        }
        assert got == self._full_pairs(spark, docs, 0.5)
        assert got  # fixture plants real near-dups; guard against vacuity

    def test_reingest_idempotent(self, spark, docs, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import ParquetCatalog

        cat = ParquetCatalog(str(tmp_path / "cat"))
        b1 = docs.where(F.col("doc_id") <= 3)
        first = {(r["a_id"], r["b_id"]) for r in self._inc(spark, cat, b1).collect()}
        again = {(r["a_id"], r["b_id"]) for r in self._inc(spark, cat, b1).collect()}
        # same pairs (its own ids are excluded from the stored side —
        # a doc never pairs with its previous self) and no index growth
        assert again == first
        n = cat.read(spark, "minhash_index").count()
        assert n == b1.where(F.size(F.split("text", " ")) >= 2).count()

    def test_threshold_filters(self, spark, docs, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import ParquetCatalog

        cat = ParquetCatalog(str(tmp_path / "cat"))
        pairs = self._inc(spark, cat, docs, threshold=0.99).collect()
        # shingling lowercases + collapses whitespace, so doc 3 (case/
        # spacing variant) is signature-identical to 1 and 2 as well
        assert {(r["a_id"], r["b_id"]) for r in pairs} == {(1, 2), (1, 3), (2, 3)}

    def test_cross_batch_pair_lands_in_later_batch(self, spark, docs, tmp_path):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.sources.catalog import ParquetCatalog

        cat = ParquetCatalog(str(tmp_path / "cat"))
        # doc 1 in batch 1; its exact dup doc 2 arrives in batch 2
        out1 = self._inc(spark, cat, docs.where(F.col("doc_id") == 1)).collect()
        assert out1 == []
        out2 = {
            (r["a_id"], r["b_id"], r["est_jaccard"])
            for r in self._inc(spark, cat, docs.where(F.col("doc_id") == 2)).collect()
        }
        assert out2 == {(1, 2, 1.0)}


class TestDupClusters:
    def test_cluster_invariants_on_fixture(self, spark, docs):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import canonicalize

        pairs = dedup.minhash_near_dup_pairs(docs, threshold=0.5, shingle_n=2)
        cc = canonicalize.connected_components(pairs, src="a_id", dst="b_id")
        rows = cc.collect()
        comp = {r["id"]: r["component"] for r in rows}
        # canonical is the min member of its own cluster
        for cid in set(comp.values()):
            members = [i for i, c in comp.items() if c == cid]
            assert min(members) == cid
        # every near-dup pair is co-clustered
        for p in pairs.collect():
            assert comp[p["a_id"]] == comp[p["b_id"]]
        # the exact/norm dup family {1, 2, 3} is one cluster
        assert comp[1] == comp[2] == comp[3] == 1


class TestQuantizedTopk:
    def test_spark_quantizer_matches_python_twin(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        rows = similarity.quantize_int8(emb).orderBy("vec_id").limit(20).collect()
        src = {
            r["vec_id"]: list(r["embedding"])
            for r in emb.orderBy("vec_id").limit(20).collect()
        }
        for r in rows:
            assert list(r["qv"]) == similarity._py_quantize_int8(src[r["vec_id"]])
            assert all(-127 <= x <= 127 for x in r["qv"])

    def test_exact_on_axis_vectors(self, spark, vecs):
        got = similarity.quantized_topk(vecs, [1.0, 0.0, 0.0, 0.0], k=3).collect()
        # identical vector quantizes identically -> qcosine exactly 1.0
        assert got[0]["vec_id"] == 0 and got[0]["qcosine"] == 1.0
        # orthogonal vectors stay orthogonal after quantization
        assert [r["vec_id"] for r in got][:2] == [0, 1]

    def test_recall_vs_exact_on_real_embeddings(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = list(emb.where(F.col("vec_id") == 0).collect()[0]["embedding"])
        exact = [r["vec_id"] for r in similarity.brute_force_topk(emb, q, k=10).collect()]
        quant = [r["vec_id"] for r in similarity.quantized_topk(emb, q, k=10).collect()]
        # int8 keeps ~2 decimal digits of the cosine: top-10 overlap
        # must be high and the self-match exact
        assert quant[0] == exact[0] == 0
        assert len(set(exact) & set(quant)) >= 8

    def test_zero_vector_is_safe(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [1.0, 0.0])], "vec_id long, embedding array<float>"
        )
        rows = similarity.quantize_int8(df).orderBy("vec_id").collect()
        assert list(rows[0]["qv"]) == [0, 0] and rows[0]["scale"] == 1.0


class TestQuantizedAnn:
    """The composed quantized-ANN path: SRP bucket pruning x int8
    re-rank over a once-materialized index (VERDICT r4 weak-lite #2)."""

    def _planted(self, spark, rng_seed=7, n_background=489):
        """Corpus with 10 PLANTED near-neighbors of the query (cosine
        ~0.999) in a random-gaussian background — the shape where an
        ANN index must both find the true cluster AND prune.  The sf
        embeddings tables are pure gaussian noise (no true neighbors),
        so a recall gate there would only measure luck."""
        import numpy as np

        rng = np.random.RandomState(rng_seed)
        base = rng.randn(64)
        rows = [(i, [float(x) for x in base + 0.05 * rng.randn(64)]) for i in range(1, 11)]
        rows += [
            (i, [float(x) for x in rng.randn(64)])
            for i in range(11, 11 + n_background)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        return emb, [float(x) for x in base]

    def test_recall_on_planted_cluster_with_pruning(self, spark):
        emb, q = self._planted(spark)
        idx = similarity.build_quantized_index(emb, dim=64)
        got = similarity.quantized_ann_topk(None, q, dim=64, k=10, index=idx)
        ids = [r["vec_id"] for r in got.collect()]
        # recall gate: >= 8 of the 10 planted neighbors in the top-10
        assert len(set(ids) & set(range(1, 11))) >= 8
        # and the bucket filter actually PRUNED: the candidate set the
        # re-rank scored is a strict minority of the corpus
        import numpy as np

        planes = similarity._hyperplanes(64, 16)
        qbits = (planes @ np.asarray(q) >= 0).astype(int)
        cond = None
        for b in range(4):
            bk = "".join(map(str, qbits[b * 4 : (b + 1) * 4]))
            c = (F.col("band") == b) & (F.col("bucket") == bk)
            cond = c if cond is None else cond | c
        ncand = idx.where(cond).select("vec_id").distinct().count()
        assert ncand < emb.count() * 0.5, f"no pruning: {ncand} candidates"

    def test_prebuilt_index_equals_inline(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = list(emb.where(F.col("vec_id") == 0).collect()[0]["embedding"])
        inline = similarity.quantized_ann_topk(emb, q, dim=64, k=10).collect()
        idx = similarity.build_quantized_index(emb, dim=64)
        pre = similarity.quantized_ann_topk(None, q, dim=64, k=10, index=idx).collect()
        assert [tuple(r) for r in inline] == [tuple(r) for r in pre]

    def test_materialized_partitioned_index_prunes_and_matches(self, spark, tmp_path):
        """The production shape: index written PARTITIONED BY
        (band, bucket); the query's literal OR-of-buckets predicate
        must become partition pruning (scan reads only the matching
        directories) and return the same answer."""
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = list(emb.where(F.col("vec_id") == 0).collect()[0]["embedding"])
        path = str(tmp_path / "qidx")
        similarity.build_quantized_index(emb, dim=64).write.partitionBy(
            "band", "bucket"
        ).parquet(path)
        idx = spark.read.parquet(path)
        got = similarity.quantized_ann_topk(None, q, dim=64, k=10, index=idx)
        inline = similarity.quantized_ann_topk(emb, q, dim=64, k=10).collect()
        assert [tuple(r) for r in got.collect()] == [tuple(r) for r in inline]
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "band" in plan.split(
            "PartitionFilters"
        )[1][:400], "bucket predicate did not reach the partition filter"

    def test_zero_query_returns_empty(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        got = similarity.quantized_ann_topk(emb, [0.0] * 64, dim=64, k=10)
        assert got.count() == 0


class TestContainment:
    """Directed shingle containment — the asymmetric relation."""

    def _df(self, spark):
        full = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
        prefix = "the quick brown fox jumps over the lazy dog"  # contained in full
        other = "completely different words about spark shuffles and parquet row groups"
        return spark.createDataFrame(
            [(1, full), (2, prefix), (3, other)], "doc_id long, text string"
        )

    def test_asymmetric(self, spark):
        out = dedup.containment_pairs(self._df(spark), threshold=0.9, shingle_n=2)
        pairs = {(r.a_id, r.b_id): r.containment for r in out.collect()}
        assert pairs == {(2, 1): 1.0}  # prefix ⊂ full only, never the reverse

    def test_mutual_for_exact_dups(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
            "doc_id long, text string",
        )
        out = dedup.containment_pairs(df, threshold=0.9, shingle_n=2)
        assert {(r.a_id, r.b_id) for r in out.collect()} == {(1, 2), (2, 1)}

    def test_external_candidates_verify_only(self, spark):
        # candidate blocking given: only the listed pairs are verified
        cands = spark.createDataFrame([(2, 1)], "a_id long, b_id long")
        out = dedup.containment_pairs(
            self._df(spark), threshold=0.9, shingle_n=2, candidates=cands
        ).collect()
        assert [(r.a_id, r.b_id, r.containment) for r in out] == [(2, 1, 1.0)]

    def test_prefix_candidates_match_bruteforce(self, spark):
        # prefix filter is lossless: same output as all-pairs verify
        df = self._df(spark)
        ids = [r.doc_id for r in df.select("doc_id").collect()]
        all_pairs = spark.createDataFrame(
            [(a, b) for a in ids for b in ids if a != b], "a_id long, b_id long"
        )
        brute = dedup.containment_pairs(df, threshold=0.5, shingle_n=2, candidates=all_pairs)
        fast = dedup.containment_pairs(df, threshold=0.5, shingle_n=2)
        assert sorted(map(tuple, brute.collect())) == sorted(map(tuple, fast.collect()))

    def test_df_prefix_order_is_lossless(self, spark):
        # ordering changes candidates, never output (verify is exact)
        df = self._df(spark)
        hash_o = dedup.containment_pairs(df, threshold=0.5, shingle_n=2)
        df_o = dedup.containment_pairs(df, threshold=0.5, shingle_n=2, prefix_order="df")
        assert sorted(map(tuple, hash_o.collect())) == sorted(map(tuple, df_o.collect()))


class TestSemanticDedup:
    def _emb(self, spark):
        # two planted near-dup clusters + two loners (8-dim)
        base_a = [1.0, 0.2, -0.5, 0.8, 0.0, 0.3, -0.1, 0.6]
        base_b = [-0.7, 0.9, 0.4, -0.2, 0.5, -0.6, 0.1, 0.0]
        eps = lambda v, d: [x + d for x in v]
        rows = [
            (1, base_a),
            (2, eps(base_a, 0.01)),       # dup of 1
            (5, eps(base_a, 0.02)),       # dup of 1 (and of 2)
            (3, base_b),
            (4, eps(base_b, 0.015)),      # dup of 3
            (6, [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0]),  # loner
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_verdicts_with_explicit_candidates(self, spark):
        df = self._emb(spark)
        ids = [r["vec_id"] for r in df.select("vec_id").collect()]
        pairs = [(a, b) for a in ids for b in ids if a < b]
        cand = spark.createDataFrame(pairs, "a_id long, b_id long")
        out = {
            r["vec_id"]: (r["kept"], r["dup_of"])
            for r in similarity.semantic_dedup(df, threshold=0.99, candidates=cand).collect()
        }
        assert out == {
            1: (True, None), 2: (False, 1), 5: (False, 1),
            3: (True, None), 4: (False, 3), 6: (True, None),
        }

    def test_srp_path_consistent(self, spark):
        df = self._emb(spark)
        out = similarity.semantic_dedup(df, threshold=0.99, dim=8).collect()
        assert len(out) == 6  # one verdict per input row
        verd = {r["vec_id"]: (r["kept"], r["dup_of"]) for r in out}
        # identical-direction vectors share every SRP bucket -> the
        # planted dups are always found; loners always survive
        assert verd[6] == (True, None) and verd[1] == (True, None)
        assert not verd[2][0] and verd[2][1] < 2
        assert not verd[4][0] and verd[4][1] == 3
        # every drop is justified by a true cosine above threshold
        vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
        import math

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

        for vid, (kept, dup_of) in verd.items():
            if not kept:
                assert round(cos(vecs[vid], vecs[dup_of]), 6) >= 0.99

    def test_auto_plane_sizing(self, spark):
        # 1M rows / 256-target buckets -> 12 bits/band -> 48 planes
        assert similarity.auto_srp_planes(1_000_000, bands=4) == 48
        assert similarity.auto_srp_planes(10, bands=4) == 8  # floor
        df = self._emb(spark)
        out = similarity.semantic_dedup(df, threshold=0.99, dim=8, n_planes="auto").collect()
        assert len(out) == 6
        vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
        import math

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

        for r in out:
            if not r["kept"]:  # soundness: every drop has a true dominator
                assert round(cos(vecs[r["vec_id"]], vecs[r["dup_of"]]), 6) >= 0.99
        assert {r["vec_id"] for r in out if r["kept"]} >= {1, 6}


class TestPq:
    """similarity.pq_train_codebooks / pq_encode / pq_topk (product
    quantization: m sub-codebooks, ADC lookup-table scan)."""

    def test_encode_matches_numpy_twin(self, spark):
        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = similarity.pq_train_codebooks(emb, dim=64, m=8, k=16, sample=256)
        assert cb.shape == (8, 16, 8)
        got = {
            r.vec_id: list(r.code)
            for r in similarity.pq_encode(emb, cb).collect()
        }
        rows = emb.orderBy("vec_id").collect()
        for r in rows[:50]:
            x = np.asarray(list(r.embedding), dtype="float64")
            want = [
                int(((x[j * 8 : (j + 1) * 8] - cb[j]) ** 2).sum(axis=1).argmin())
                for j in range(8)
            ]
            assert got[r.vec_id] == want, r.vec_id

    def test_adc_distance_matches_numpy_twin(self, spark):
        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = similarity.pq_train_codebooks(emb, dim=64, m=8, k=16, sample=256)
        codes = similarity.pq_encode(emb, cb)
        q = list(emb.where(F.col("vec_id") == 0).collect()[0]["embedding"])
        got = {r.vec_id: r.adc_dist2 for r in similarity.pq_topk(codes, q, cb, k=20).collect()}
        qv = np.asarray(q, dtype="float64")
        code_map = {r.vec_id: list(r.code) for r in codes.collect()}
        for vid, d in got.items():
            want = sum(
                ((qv[j * 8 : (j + 1) * 8] - cb[j][code_map[vid][j]]) ** 2).sum()
                for j in range(8)
            )
            assert abs(d - want) < 1e-9

    def test_rerank_recall_on_planted_cluster(self, spark):
        # sf gaussian vectors have no true neighbor structure (recall
        # there measures luck — round-5 lesson); plant 10 perturbed
        # copies of one vector and require the re-ranked top-10 to find
        # >= 8 of them
        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        base = np.asarray(
            list(emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]),
            dtype="float64",
        )
        rng = np.random.RandomState(1)
        planted = spark.createDataFrame(
            [
                (int(100000 + i), [float(v) for v in base + 0.02 * rng.randn(64)])
                for i in range(10)
            ],
            "vec_id long, embedding array<float>",
        )
        corpus = (
            emb.where(F.col("vec_id") != 7)
            .select("vec_id", "embedding")
            .unionByName(planted)
        )
        cb = similarity.pq_train_codebooks(corpus, dim=64, m=8, k=16, sample=256)
        codes = similarity.pq_encode(corpus, cb)
        got = similarity.pq_topk(
            codes, list(base), cb, k=10, rerank=corpus, rerank_factor=8
        )
        hits = {r.vec_id for r in got.collect()}
        assert len({v for v in hits if v >= 100000}) >= 8

    def test_dim_must_divide(self, spark):
        import pytest as _pytest

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        with _pytest.raises(ValueError):
            similarity.pq_train_codebooks(emb, dim=64, m=7)


class TestIvfPq:
    def test_partitioned_index_prunes_and_recalls(self, spark, tmp_path):
        import numpy as np

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        base = np.asarray(
            list(emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]),
            dtype="float64",
        )
        rng = np.random.RandomState(2)
        planted = spark.createDataFrame(
            [
                (int(200000 + i), [float(v) for v in base + 0.02 * rng.randn(64)])
                for i in range(10)
            ],
            "vec_id long, embedding array<float>",
        )
        corpus = (
            emb.where(F.col("vec_id") != 7)
            .select("vec_id", "embedding")
            .unionByName(planted)
        )
        cent = similarity.ivf_train_centroids(corpus, dim=64, n_lists=8, sample=256, sample_frac=0.9)
        cb = similarity.pq_train_codebooks(corpus, dim=64, m=8, k=16, sample=256, sample_frac=0.9)
        path = str(tmp_path / "ivfpq")
        similarity.ivf_pq_index(corpus, cent, cb).write.partitionBy("list_id").parquet(path)
        idx = spark.read.parquet(path)
        got = similarity.ivf_pq_topk(
            idx, list(base), cent, cb, nprobe=3, k=10, rerank=corpus, rerank_factor=8
        )
        # partition pruning visible in the plan
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "list_id" in plan
        hits = {r.vec_id for r in got.collect()}
        assert len({v for v in hits if v >= 200000}) >= 8

    def test_index_rows_match_separate_passes(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cent = similarity.ivf_train_centroids(emb, dim=64, n_lists=4, sample=128, sample_frac=0.9)
        cb = similarity.pq_train_codebooks(emb, dim=64, m=4, k=8, sample=128, sample_frac=0.9)
        idx = {r.vec_id: (r.list_id, list(r.code)) for r in similarity.ivf_pq_index(emb, cent, cb).collect()}
        lst = {r.vec_id: r.list_id for r in similarity.ivf_assign(emb, cent).collect()}
        cod = {r.vec_id: list(r.code) for r in similarity.pq_encode(emb, cb).collect()}
        assert idx == {v: (lst[v], cod[v]) for v in idx}


class TestRepeatedSpans:
    """dedup.repeated_spans — ExactSubstr at k-gram granularity."""

    def _spans(self, spark, docs, k=3, min_count=2):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import dedup

        df = spark.createDataFrame(docs, ["doc_id", "text"])
        return {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_text"])
            for r in dedup.repeated_spans(df, k=k, min_count=min_count).collect()
        }

    def _python_oracle(self, docs, k, min_count):
        """Brute-force reference: hash every k-gram, count corpus-wide,
        merge adjacent duplicated positions into maximal spans."""
        toks = {d: t.split() for d, t in docs}
        from collections import Counter

        cnt = Counter()
        for d, ts in toks.items():
            for p in range(len(ts) - k + 1):
                cnt[tuple(ts[p : p + k])] += 1
        out = set()
        for d, ts in toks.items():
            flagged = [
                p
                for p in range(len(ts) - k + 1)
                if cnt[tuple(ts[p : p + k])] >= min_count
            ]
            i = 0
            while i < len(flagged):
                j = i
                while j + 1 < len(flagged) and flagged[j + 1] == flagged[j] + 1:
                    j += 1
                s, e = flagged[i], flagged[j] + k
                out.add((d, s, e, " ".join(ts[s:e])))
                i = j + 1
        return out

    def test_python_oracle_exactness(self, spark):
        boiler = "all rights reserved contact us terms of service"
        docs = [
            (0, f"alpha beta gamma {boiler} delta epsilon"),
            (1, f"zeta eta {boiler} theta"),
            (2, "iota kappa lamda mu nu xi omicron pi"),
            (3, "iota kappa lamda mu ends differently here now"),
            (4, "repeat me repeat me repeat me once more"),
        ]
        for k in (2, 3, 4):
            assert self._spans(spark, docs, k=k) == self._python_oracle(
                docs, k, 2
            ), f"k={k}"

    def test_adjacent_windows_merge_maximal(self, spark):
        # the shared 6-token run yields 6-3+1=4 duplicated 3-gram
        # positions in each doc that MUST merge into ONE maximal span
        docs = [
            (0, "x1 x2 one two three four five six y1"),
            (1, "one two three four five six z1 z2"),
        ]
        got = self._spans(spark, docs, k=3)
        assert got == {
            (0, 2, 8, "one two three four five six"),
            (1, 0, 6, "one two three four five six"),
        }

    def test_within_doc_repetition_counts(self, spark):
        # the 2-gram "ping pong" occurs twice inside ONE document —
        # corpus-wide count >= 2 flags both occurrences
        docs = [(0, "ping pong middle words ping pong")]
        got = self._spans(spark, docs, k=2)
        assert got == {
            (0, 0, 2, "ping pong"),
            (0, 4, 6, "ping pong"),
        }

    def test_short_docs_and_no_dups(self, spark):
        docs = [(0, "too short"), (1, "every token here is unique once")]
        assert self._spans(spark, docs, k=3) == set()

    def test_min_count_threshold(self, spark):
        docs = [
            (0, "a b c tail1"),
            (1, "a b c tail2"),
            (2, "a b c tail3"),
        ]
        assert len({s for s in self._spans(spark, docs, k=3, min_count=3)}) == 3
        assert self._spans(spark, docs, k=3, min_count=4) == set()


class TestKmeansAssign:
    def _py_kmeans(self, rows, k, iters):
        """Pure-python replay of kmeans_assign incl. the round-6
        centroid contract (HALF_UP like Spark/DuckDB ROUND)."""
        import hashlib
        from decimal import Decimal, ROUND_HALF_UP

        def r6(x):
            return float(
                Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            )

        ids = [str(i) for i, _ in rows]
        vecs = {str(i): [float(x) for x in v] for i, v in rows}
        seeds = sorted(ids, key=lambda i: hashlib.md5(i.encode()).hexdigest())[:k]
        cents = {c: list(vecs[s]) for c, s in enumerate(seeds)}
        dims = len(next(iter(vecs.values())))

        def assign(c):
            out = {}
            for i in ids:
                best = min(
                    (sum((a - b) * (a - b) for a, b in zip(vecs[i], c[ci])), ci)
                    for ci in sorted(c)
                )
                out[i] = best
            return out

        for _ in range(iters):
            a = assign(cents)
            for ci in sorted(cents):
                members = [i for i in ids if a[i][1] == ci]
                if members:
                    cents[ci] = [
                        r6(sum(vecs[i][d] for i in members) / len(members))
                        for d in range(dims)
                    ]
        a = assign(cents)
        return {i: (ci, round(d, 6)) for i, (d, ci) in a.items()}

    def _df(self, spark, rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id string, embedding array<float>",
        )

    def test_matches_python_replay(self, spark):
        import random

        rng = random.Random(11)
        rows = [
            (i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(40)
        ]
        got = {
            r["id"]: (r["cluster"], r["dist2"])
            for r in similarity.kmeans_assign(
                self._df(spark, rows), k=4, iters=2
            ).collect()
        }
        want = self._py_kmeans([(str(i), v) for i, v in rows], 4, 2)
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0], i
            assert abs(got[i][1] - want[i][1]) < 2e-6, i

    def test_recovers_planted_clusters(self, spark):
        import random

        rng = random.Random(5)
        centers = [[10.0] * 4, [-10.0] * 4, [10.0, -10.0, 10.0, -10.0]]
        rows = []
        for b, c in enumerate(centers):
            for j in range(20):
                rows.append(
                    (b * 100 + j, [x + rng.gauss(0, 0.3) for x in c])
                )
        got = similarity.kmeans_assign(self._df(spark, rows), k=3, iters=3).collect()
        by_blob = {}
        for r in got:
            by_blob.setdefault(int(r["id"]) // 100, set()).add(r["cluster"])
        # every planted blob lands in exactly one cluster, all distinct
        assert all(len(s) == 1 for s in by_blob.values())
        assert len({next(iter(s)) for s in by_blob.values()}) == 3

    def test_degenerate_identical_points(self, spark):
        rows = [(i, [1.0, 2.0]) for i in range(6)]
        got = similarity.kmeans_assign(self._df(spark, rows), k=3, iters=2).collect()
        # all points identical -> all go to cluster 0 (tie -> lowest id),
        # empty clusters carry their seed centroid, nothing crashes
        assert len(got) == 6
        assert {r["cluster"] for r in got} == {0}
        assert all(r["dist2"] == 0.0 for r in got)


class TestClusterBalancedSample:
    def test_integer_hash_exactness(self, spark):
        import hashlib

        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sampling

        rows = [(str(i), i % 3) for i in range(300)]
        assign = spark.createDataFrame(rows, "id string, cluster int")
        got = {
            r["id"]: (r["cluster"], r["n_cluster"], r["kept"])
            for r in sampling.cluster_balanced_sample(assign, per_cluster=20).collect()
        }
        n = {c: sum(1 for _, cc in rows if cc == c) for c in range(3)}
        for i, c in rows:
            u32 = int(hashlib.md5(i.encode()).hexdigest()[:8], 16)
            want_kept = 1 if u32 * n[c] < 20 * 2**32 else 0
            assert got[i] == (c, n[c], want_kept), i

    def test_small_cluster_survives_whole(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sampling

        rows = [(f"big{i}", 0) for i in range(500)] + [
            (f"rare{i}", 1) for i in range(5)
        ]
        assign = spark.createDataFrame(rows, "id string, cluster int")
        out = sampling.cluster_balanced_sample(assign, per_cluster=25).collect()
        rare = [r for r in out if r["cluster"] == 1]
        assert all(r["kept"] == 1 for r in rare) and len(rare) == 5
        big_kept = sum(r["kept"] for r in out if r["cluster"] == 0)
        # expected 25 of 500; hash-uniform draw stays in a loose band
        assert 10 <= big_kept <= 45

    def test_rerun_stable(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sampling

        rows = [(str(i), 0) for i in range(200)]
        assign = spark.createDataFrame(rows, "id string, cluster int")
        a = {r["id"]: r["kept"] for r in sampling.cluster_balanced_sample(assign, 50).collect()}
        b = {
            r["id"]: r["kept"]
            for r in sampling.cluster_balanced_sample(
                assign.repartition(13), 50
            ).collect()
        }
        assert a == b


class TestNgramNovelty:
    def _py(self, docs, k):
        import hashlib

        toks = {i: t.strip().split() for i, t in docs}
        toks = {i: ts for i, ts in toks.items() if len(ts) >= k}
        grams = {
            i: [
                hashlib.md5(" ".join(ts[p : p + k]).encode()).hexdigest()
                for p in range(len(ts) - k + 1)
            ]
            for i, ts in toks.items()
        }
        first = {}
        for i in sorted(grams):
            for h in grams[i]:
                first.setdefault(h, i)
        out = {}
        for i, hs in grams.items():
            seen = sum(1 for h in hs if first[h] < i)
            out[i] = (len(hs), round(seen / len(hs), 6), round(1 - seen / len(hs), 6))
        return out

    def test_matches_python_oracle(self, spark):
        docs = [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),      # shares prefix grams
            (3, "alpha beta gamma delta epsilon"),   # full copy of 1
            (4, "omega psi chi"),                    # 3 tokens, k=3: 1 gram
            (5, "xy"),                               # too short -> excluded
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_grams"], r["dup_frac"], r["novel_frac"])
            for r in dedup.ngram_novelty(df, k=3).collect()
        }
        assert got == self._py(docs, 3)
        assert 5 not in got
        # the verbatim copy is 100% duplicated, the original 0%
        assert got[3][1] == 1.0 and got[1][1] == 0.0

    def test_within_doc_repetition_not_self_dup(self, spark):
        # a doc repeating ITS OWN gram is still novel (first_id == id)
        df = spark.createDataFrame(
            [(7, "a b c a b c a b c")], "doc_id long, text string"
        )
        row = dedup.ngram_novelty(df, k=3).collect()[0]
        assert row["dup_frac"] == 0.0 and row["novel_frac"] == 1.0


class TestSoftDedupWeights:
    def test_weights(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        clusters = spark.createDataFrame(
            [(0, 100, 3), (1, 100, 3), (2, 100, 3), (4, 200, 2), (5, 200, 2)],
            "doc_id long, cluster_id long, cluster_size long",
        )
        got = {
            r["doc_id"]: (r["cluster_size"], r["weight"])
            for r in dedup.soft_dedup_weights(docs, clusters).collect()
        }
        assert got[0] == (3, round(1 / 3, 6)) == got[1] == got[2]
        assert got[4] == (2, 0.5) == got[5]
        assert got[3] == (1, 1.0)  # singleton untouched
        # total training mass == number of distinct content units
        # (cluster100 + cluster200 + the singleton = 3)
        assert abs(sum(w for _, w in got.values()) - 3.0) < 1e-5


class TestAnnRecallAtK:
    def _emb(self, spark, n=120, dim=16, blobs=4):
        import random

        rng = random.Random(17)
        rows = []
        for i in range(n):
            c = i % blobs
            rows.append(
                (i, [10.0 * (1 if (c >> b) & 1 else -1) + rng.gauss(0, 0.5)
                     for b in range(dim)])
            )
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    def test_recall_is_high_on_clustered_data(self, spark):
        emb = self._emb(spark)
        out = similarity.ann_recall_at_k(emb, k=10, n_queries=5).collect()
        assert len(out) == 5
        # well-separated blobs: bucket-mates contain the true top-k
        assert all(r["recall"] >= 0.8 for r in out)
        assert all(0 < r["n_candidates"] < 120 for r in out)  # really pruned

    def test_exact_arm_matches_bruteforce(self, spark):
        emb = self._emb(spark, n=60)
        out = {r["qid"]: r for r in similarity.ann_recall_at_k(emb, k=5, n_queries=3).collect()}
        # recall is |ann ∩ exact| / k, so hits <= k and recall in [0,1]
        for r in out.values():
            assert 0 <= r["hits"] <= 5
            assert abs(r["recall"] - round(r["hits"] / 5.0, 6)) < 1e-9

    def test_deterministic_across_repartition(self, spark):
        emb = self._emb(spark, n=80)
        a = [tuple(r) for r in similarity.ann_recall_at_k(emb, k=5, n_queries=4).collect()]
        b = [tuple(r) for r in similarity.ann_recall_at_k(emb.repartition(7), k=5, n_queries=4).collect()]
        assert a == b


class TestLshBucketStats:
    def test_matches_bucket_recomputation(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        got = {
            r["band"]: (r["n_buckets"], r["n_vectors"], r["max_bucket"], r["candidate_pairs"])
            for r in similarity.lsh_bucket_stats(emb, dim=64).collect()
        }
        bk = similarity.srp_buckets(emb, dim=64).select("id", "band", "bucket").collect()
        from collections import Counter

        sizes = Counter((r["band"], r["bucket"]) for r in bk)
        for band in got:
            szs = [c for (b, _), c in sizes.items() if b == band]
            want = (
                len(szs),
                sum(szs),
                max(szs),
                sum(c * (c - 1) // 2 for c in szs),
            )
            assert got[band] == want, band
        # every band indexes the whole corpus
        n = emb.count()
        assert all(v[1] == n for v in got.values())

    def test_degenerate_corpus_shows_mega_bucket(self, spark):
        # identical vectors -> one bucket per band -> pair mass n(n-1)/2
        rows = [(i, [1.0] * 8) for i in range(20)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = similarity.lsh_bucket_stats(emb, dim=8, n_planes=8, bands=4).collect()
        assert all(r["n_buckets"] == 1 and r["candidate_pairs"] == 190 for r in got)


class TestMmrRerank:
    def _np_mmr(self, vecs, query, k, pool, lam):
        """Pure-numpy MMR greedy reference (round-before-compare)."""
        import numpy as np

        ids = sorted(vecs)
        q = np.asarray(query, dtype="float64")

        def cos(a, b):
            a, b = np.asarray(a, "float64"), np.asarray(b, "float64")
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        rel = {i: round(cos(vecs[i], q), 6) for i in ids}
        cand = sorted(ids, key=lambda i: (-rel[i], i))[:pool]
        sel, out = [], []
        for rank in range(1, k + 1):
            best = None
            for c in cand:
                if c in sel:
                    continue
                ms = max((round(cos(vecs[c], vecs[s]), 6) for s in sel), default=0.0)
                score = round(lam * rel[c] - (1 - lam) * ms, 6)
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, ms, score)
            _, c, ms, score = best
            sel.append(c)
            out.append((rank, c, rel[c], ms, score))
        return out

    def test_diversifies_away_from_near_duplicates(self, spark):
        # ids 0/1 are near-copies of each other (both ~the query
        # direction), 2 is diverse-but-relevant, 3 is junk.  Plain
        # top-3 returns [1, 0, 2] (the copies back to back); MMR's
        # second pick must be the diverse 2, the twin dropping to
        # rank 3 (margins >= 5e-4, far above the 6dp rounding).
        q = [1.0, 0.2, 0.0]
        vecs = {
            0: [1.0, 0.16, 0.0],
            1: [1.0, 0.22, 0.0],    # near-copy of 0, closest to q
            2: [0.6, 0.0, 0.8],     # diverse
            3: [0.0, 1.0, 0.0],     # junk
        }
        emb = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
        )
        got = [tuple(r) for r in similarity.mmr_rerank(
            emb, q, k=3, pool=4, lam=0.5
        ).collect()]
        order = [r[1] for r in got]
        assert order == [1, 2, 0]
        top = [r["vec_id"] for r in similarity.brute_force_topk(emb, q, k=3).collect()]
        assert top == [1, 0, 2]       # the order MMR deliberately breaks
        want = self._np_mmr(vecs, q, k=3, pool=4, lam=0.5)
        assert [(r, i) for r, i, *_ in got] == [(r, i) for r, i, *_ in want]
        # numpy's pairwise-summed dot can land one 6dp quantum away
        # from the engine's sequential fold; the picks above are the
        # hard assertion, scores agree to the rounding grid
        for g, w in zip(got, want):
            assert abs(g[2] - w[2]) <= 2e-6 and abs(g[4] - w[4]) <= 2e-6

    def test_matches_numpy_reference_on_random_pool(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        vecs = {i: rng.randn(8).round(3).tolist() for i in range(30)}
        q = vecs[0]
        emb = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
        )
        got = [
            (r["rank"], r["vec_id"]) for r in
            similarity.mmr_rerank(emb, q, k=5, pool=12, lam=0.5).collect()
        ]
        want = [(r, i) for r, i, *_ in self._np_mmr(vecs, q, k=5, pool=12, lam=0.5)]
        assert got == want

    def test_lam_one_degenerates_to_topk(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        vecs = {i: rng.randn(6).round(3).tolist() for i in range(15)}
        emb = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
        )
        got = [r["vec_id"] for r in
               similarity.mmr_rerank(emb, vecs[3], k=4, pool=10, lam=1.0).collect()]
        top = [r["vec_id"] for r in
               similarity.brute_force_topk(emb, vecs[3], k=4).collect()]
        assert got == top

    def test_k_bounds_validated(self, spark):
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
        )
        import pytest as _pt
        with _pt.raises(ValueError):
            similarity.mmr_rerank(emb, [1.0, 0.0], k=9, pool=4)


class TestKnnGraph:
    def test_recall_on_planted_clusters(self, spark):
        import numpy as np

        # three tight clusters: every node's top neighbors must come
        # from its own cluster (bucket recall + exact re-rank)
        rng = np.random.RandomState(3)
        centers = [rng.randn(16) * 5 for _ in range(3)]
        rows = []
        for ci, c in enumerate(centers):
            for j in range(8):
                rows.append((ci * 100 + j, (c + rng.randn(16) * 0.05).tolist()))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = similarity.knn_graph(emb, dim=16, k=3).collect()
        by_src = {}
        for r in got:
            by_src.setdefault(r["vec_id"], []).append(r)
        assert set(by_src) == {r[0] for r in rows}  # every node has neighbors
        for src, nbrs in by_src.items():
            assert [n["rank"] for n in nbrs] == list(range(1, len(nbrs) + 1))
            for n in nbrs:
                assert n["nbr_id"] // 100 == src // 100, (src, n["nbr_id"])
                assert n["cosine"] > 0.99

    def test_directed_and_k_capped(self, spark):
        import numpy as np

        rng = np.random.RandomState(9)
        rows = [(i, rng.randn(8).tolist()) for i in range(30)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = similarity.knn_graph(emb, dim=8, k=4).collect()
        from collections import Counter

        per_src = Counter(r["vec_id"] for r in got)
        assert max(per_src.values()) <= 4
        assert all(r["vec_id"] != r["nbr_id"] for r in got)


class TestCentroidOutliers:
    def test_planted_outlier(self, spark):
        # label 0: tight cluster at (0,0) + one point far away -> only
        # the far point has z > 2 on squared-L2 to the label centroid
        rows = [(i, [0.01 * i, 0.0], 0) for i in range(9)]
        rows.append((99, [50.0, 50.0], 0))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        got = similarity.centroid_outliers(emb, dim=2, z_threshold=2.0).collect()
        assert [r["vec_id"] for r in got] == [99]
        assert got[0]["label"] == 0 and got[0]["z"] > 2.0

    def test_degenerate_labels_emit_nothing(self, spark):
        # label 1 has a single member (no variance possible), label 2
        # has zero variance (identical points) -> neither emits
        rows = [(1, [1.0, 1.0], 1), (2, [3.0, 3.0], 2), (3, [3.0, 3.0], 2)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        assert similarity.centroid_outliers(emb, dim=2).collect() == []

    def test_one_sided_far_only(self, spark):
        # a point CLOSER than the mean distance (negative z) is never
        # flagged, however extreme — the sweep is for the too-far only
        import numpy as np

        rng = np.random.RandomState(7)
        rows = [(i, (rng.randn(4) + 10).tolist(), 5) for i in range(40)]
        rows.append((500, [10.0, 10.0, 10.0, 10.0], 5))  # dead center
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        got = similarity.centroid_outliers(emb, dim=4, z_threshold=2.0).collect()
        assert all(r["z"] > 2.0 for r in got)
        assert 500 not in {r["vec_id"] for r in got}

    def test_real_data_invariants(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        got = similarity.centroid_outliers(emb, dim=64, z_threshold=2.0).collect()
        assert len(got) > 0
        ids = [r["vec_id"] for r in got]
        assert ids == sorted(ids)
        n = emb.count()
        # z>2 one-sided can flag at most ~1/4 of rows (Chebyshev); in
        # practice far fewer — guard against a broken stddev
        assert len(got) < n / 4
        for r in got:
            assert r["dist2"] >= 0 and r["z"] > 2.0


class TestKCenterSample:
    def _np_kcenter(self, vecs, k):
        """Pure-numpy greedy farthest-point reference (min-id seed,
        round-before-compare, id tie-break)."""
        import numpy as np

        def cos(a, b):
            a, b = np.asarray(a, "float64"), np.asarray(b, "float64")
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        ids = sorted(vecs)
        sel = [ids[0]]
        out = [(1, ids[0], 0.0)]
        for rank in range(2, k + 1):
            best = None
            for c in ids:
                if c in sel:
                    continue
                ms = max(round(cos(vecs[c], vecs[s]), 6) for s in sel)
                key = (ms, c)
                if best is None or key < best[0]:
                    best = (key, c, ms)
            if best is None:
                break
            _, c, ms = best
            sel.append(c)
            out.append((rank, c, ms))
        return out

    def test_matches_numpy_greedy_trace(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        vecs = {i: rng.randn(8).tolist() for i in range(40)}
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )
        want = self._np_kcenter(
            {i: [float(np.float32(x)) for x in v] for i, v in vecs.items()}, 6
        )
        got = [
            (r["rank"], r["vec_id"], r["max_sim"])
            for r in similarity.kcenter_sample(emb, k=6).collect()
        ]
        assert got == [(r, i, pytest.approx(m, abs=1e-9)) for r, i, m in want]

    def test_spreads_across_planted_clusters(self, spark):
        # three tight orthogonal clusters; k=3 must pick one vector
        # from EACH cluster (farthest-point never takes two near-dups
        # before covering an untouched cluster).
        rows = []
        for cid, axis in enumerate([0, 1, 2]):
            for j in range(5):
                v = [0.001 * j] * 3
                v[axis] = 1.0
                rows.append((cid * 100 + j, v))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = similarity.kcenter_sample(emb, k=3).collect()
        clusters = {r["vec_id"] // 100 for r in got}
        assert clusters == {0, 1, 2}
        assert [r["rank"] for r in got] == [1, 2, 3]
        assert got[0]["vec_id"] == 0 and got[0]["max_sim"] == 0.0

    def test_k_exceeding_corpus_truncates(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
        )
        got = similarity.kcenter_sample(emb, k=5).collect()
        assert [r["vec_id"] for r in got] == [1, 2]


class TestEditDistanceNearDup:
    @staticmethod
    def _lev(a, b):
        """Textbook Wagner-Fischer reference."""
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    def test_exact_and_near_pairs_hand_checked(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        docs = spark.createDataFrame(
            [
                (1, base),
                (2, "  The QUICK  brown fox jumps over the lazy dog again and again "),
                (3, base.replace("lazy", "hazy")),  # 1 substitution
                (4, "completely unrelated text about spark catalyst optimizer internals"),
            ],
            "doc_id long, text string",
        )
        got = {
            (r["a_id"], r["b_id"]): r
            for r in dedup.edit_distance_near_dup(docs, max_rel=0.3).collect()
        }
        # normalization makes 1 and 2 identical
        assert got[(1, 2)]["edit_dist"] == 0
        assert got[(1, 2)]["rel_dist"] == 0.0
        # 1 vs 3: exactly one substitution (l -> h)
        assert got[(1, 3)]["edit_dist"] == self._lev(base, base.replace("lazy", "hazy")) == 1
        assert got[(1, 3)]["rel_dist"] == pytest.approx(round(1 / len(base), 6))
        # the unrelated doc shares no shingles -> never a candidate
        assert not any(4 in k for k in got)

    def test_distance_matches_reference_on_candidates(self, spark):
        # perturbed replicas of one passage: every surviving pair's
        # edit_dist must equal the textbook DP on normalized text
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        variants = {
            10: base,
            11: base + " lambda",
            12: base.replace("delta", "delt"),
            13: "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu",
        }
        docs = spark.createDataFrame(
            list(variants.items()), "doc_id long, text string"
        )
        rows = dedup.edit_distance_near_dup(docs, max_rel=0.5).collect()
        assert rows, "LSH must propose candidates for shared-shingle variants"
        for r in rows:
            want = self._lev(variants[r["a_id"]], variants[r["b_id"]])
            assert r["edit_dist"] == want


class TestClusterLabelPurity:
    def test_hand_computed_purity_and_tie_break(self, spark):
        assigns = spark.createDataFrame(
            [(i, 0) for i in range(4)] + [(i, 1) for i in range(4, 8)],
            "id long, cluster int",
        )
        # cluster 0: labels 7,7,7,3 -> purity 0.75; cluster 1: 2-2 tie
        # between labels 1 and 5 -> majority_label = min(1)
        labels = spark.createDataFrame(
            [(0, 7), (1, 7), (2, 7), (3, 3), (4, 1), (5, 1), (6, 5), (7, 5)],
            "vec_id long, label int",
        )
        got = {r["cluster"]: r for r in
               similarity.cluster_label_purity(assigns, labels).collect()}
        assert got[0]["majority_label"] == 7 and got[0]["purity"] == 0.75
        assert got[0]["n"] == 4 and got[0]["majority_n"] == 3
        assert got[1]["majority_label"] == 1 and got[1]["purity"] == 0.5

    def test_pure_cluster_purity_one(self, spark):
        assigns = spark.createDataFrame([(0, 0), (1, 0)], "id long, cluster int")
        labels = spark.createDataFrame([(0, 9), (1, 9)], "vec_id long, label int")
        r = similarity.cluster_label_purity(assigns, labels).collect()[0]
        assert r["purity"] == 1.0 and r["majority_label"] == 9


def _py_kmeans_fit(rows, k, iters):
    """Pure-python replay of similarity._kmeans_fit (md5 seeds,
    ROUND-6 HALF_UP centroid updates, empty clusters carry forward)."""
    import hashlib
    from decimal import Decimal, ROUND_HALF_UP

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    ids = [str(i) for i, _ in rows]
    vecs = {str(i): [float(x) for x in v] for i, v in rows}
    seeds = sorted(ids, key=lambda i: hashlib.md5(i.encode()).hexdigest())[:k]
    cents = {c: list(vecs[s]) for c, s in enumerate(seeds)}
    dims = len(next(iter(vecs.values())))

    def assign(c):
        return {
            i: min(
                (sum((a - b) * (a - b) for a, b in zip(vecs[i], c[ci])), ci)
                for ci in sorted(c)
            )
            for i in ids
        }

    for _ in range(iters):
        a = assign(cents)
        for ci in sorted(cents):
            members = [i for i in ids if a[i][1] == ci]
            if members:
                cents[ci] = [
                    r6(sum(vecs[i][d] for i in members) / len(members))
                    for d in range(dims)
                ]
    return vecs, cents


class TestSimplifiedSilhouette:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id string, embedding array<float>",
        )

    def test_matches_python_replay(self, spark):
        import math
        import random

        rng = random.Random(7)
        rows = [(i, [rng.gauss(0, 1) for _ in range(5)]) for i in range(50)]
        vecs, cents = _py_kmeans_fit([(str(i), v) for i, v in rows], 4, 2)
        per = {}
        for i, v in vecs.items():
            ds = sorted(
                (sum((a - b) * (a - b) for a, b in zip(v, cents[c])), c)
                for c in sorted(cents)
            )
            sa, sb = math.sqrt(ds[0][0]), math.sqrt(ds[1][0])
            s = (sb - sa) / sb if sb > 0 else 0.0
            per.setdefault(ds[0][1], []).append(s)
        got = {
            r["cluster"]: r
            for r in similarity.simplified_silhouette(
                self._df(spark, rows), k=4, iters=2
            ).collect()
        }
        assert set(got) == set(per)
        for c in per:
            assert got[c]["n_points"] == len(per[c])
            assert abs(got[c]["silhouette"] - sum(per[c]) / len(per[c])) < 2e-6

    def test_separated_blobs_score_high(self, spark):
        import random

        rng = random.Random(3)
        rows = []
        for b, center in enumerate([50.0, -50.0]):
            for j in range(25):
                rows.append(
                    (b * 100 + j, [center + rng.gauss(0, 0.5) for _ in range(4)])
                )
        out = similarity.simplified_silhouette(self._df(spark, rows), k=2, iters=3)
        for r in out.collect():
            assert r["silhouette"] > 0.9, r

    def test_empty_and_k1_guard(self, spark):
        empty = self._df(spark, [])
        assert similarity.simplified_silhouette(empty, k=3).count() == 0


class TestDaviesBouldin:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id string, embedding array<float>",
        )

    def test_matches_python_replay(self, spark):
        import math
        import random
        from decimal import Decimal, ROUND_HALF_UP

        def r6(x):
            return float(
                Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            )

        rng = random.Random(13)
        rows = [(i, [rng.gauss(0, 2) for _ in range(5)]) for i in range(60)]
        vecs, cents = _py_kmeans_fit([(str(i), v) for i, v in rows], 4, 2)
        members = {}
        for i, v in vecs.items():
            d, c = min(
                (sum((a - b) * (a - b) for a, b in zip(v, cents[ci])), ci)
                for ci in sorted(cents)
            )
            members.setdefault(c, []).append(math.sqrt(d))
        scatter = {c: r6(sum(ds) / len(ds)) for c, ds in members.items()}
        want = {}
        for i in scatter:
            rs = []
            for j in scatter:
                if i == j:
                    continue
                m = math.sqrt(
                    sum((a - b) * (a - b) for a, b in zip(cents[i], cents[j]))
                )
                if m > 0:
                    rs.append((scatter[i] + scatter[j]) / m)
            if rs:
                want[i] = (len(members[i]), scatter[i], max(rs))
        got = {
            r["cluster"]: r
            for r in similarity.davies_bouldin(
                self._df(spark, rows), k=4, iters=2
            ).collect()
        }
        assert set(got) == set(want)
        for c in want:
            n, s, r_db = want[c]
            assert got[c]["n_points"] == n
            assert abs(got[c]["scatter"] - s) < 2e-6
            assert abs(got[c]["r_db"] - r_db) < 2e-6

    def test_separated_blobs_low_overlap(self, spark):
        import random

        rng = random.Random(4)
        rows = []
        for b, center in enumerate([100.0, -100.0, 0.0]):
            for j in range(20):
                rows.append(
                    (b * 100 + j, [center + rng.gauss(0, 0.5) for _ in range(4)])
                )
        out = similarity.davies_bouldin(self._df(spark, rows), k=3, iters=3)
        rows_out = out.collect()
        assert len(rows_out) == 3
        # tight well-separated blobs: within-scatter << between-separation
        for r in rows_out:
            assert r["r_db"] < 0.1, r


class TestMatryoshkaRecall:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    def test_signal_in_prefix_gives_high_recall(self, spark):
        import random

        rng = random.Random(9)
        rows = []
        for i in range(60):
            # all ranking signal lives in the first 4 dims; the tail is
            # near-zero noise, so dim-4 truncation preserves the order
            head = [rng.gauss(0, 1) for _ in range(4)]
            tail = [rng.gauss(0, 1e-4) for _ in range(12)]
            rows.append((i, head + tail))
        out = similarity.matryoshka_recall_at_k(
            self._df(spark, rows), trunc_dim=4, k=5, n_queries=5
        ).collect()
        assert len(out) == 5
        assert sum(r["recall"] for r in out) / 5 >= 0.8

    def test_matches_python_replay(self, spark):
        import hashlib
        import math
        import random

        rng = random.Random(21)
        rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
        vecs = {i: [float(x) for x in v] for i, v in rows}
        qids = sorted(
            vecs, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )[:4]

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return -2.0 if na == 0 or nb == 0 else d / (na * nb)

        want = {}
        for q in qids:
            full = sorted(vecs, key=lambda i: (-cos(vecs[i], vecs[q]), i))[:5]
            trun = sorted(
                vecs, key=lambda i: (-cos(vecs[i][:3], vecs[q][:3]), i)
            )[:5]
            want[q] = len(set(full) & set(trun))
        got = {
            r["qid"]: r["hits"]
            for r in similarity.matryoshka_recall_at_k(
                self._df(spark, rows), trunc_dim=3, k=5, n_queries=4
            ).collect()
        }
        assert got == want
