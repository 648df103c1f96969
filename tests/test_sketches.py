"""KMV / k-min-sample sketches: exact pure-Python oracle (the sketch
hash is Spark xxhash64, reimplemented in tests/xxhash_ref.py), merge
associativity, estimate accuracy bounds."""

import math

from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches
from tests.xxhash_ref import spark_xxhash64

SIGN = 1 << 63
M64 = (1 << 64) - 1


def _uhash_signed(v: str) -> int:
    h = spark_xxhash64(v) & M64
    u = h ^ SIGN  # same XOR the engine applies, still signed-compared
    return u - (1 << 64) if u >= SIGN else u


def _py_kmv(values, k):
    hs = sorted({_uhash_signed(v) for v in values})
    return hs[:k]


class TestKmvExact:
    def test_sketch_matches_python_oracle(self, spark):
        vals = [f"doc-{i}" for i in range(500)] * 3  # repeats collapse
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        got = sketches.kmv_sketch(df, "v", k=64).collect()[0]["kmv"]
        assert list(got) == _py_kmv(vals, 64)

    def test_grouped_sketch(self, spark):
        rows = [(i % 3, f"u{i}") for i in range(300)]
        df = spark.createDataFrame(rows, "g int, v string")
        for r in sketches.kmv_sketch(df, "v", group_cols=["g"], k=32).collect():
            want = _py_kmv([v for g, v in rows if g == r["g"]], 32)
            assert list(r["kmv"]) == want

    def test_small_cardinality_is_exact(self, spark):
        df = spark.createDataFrame([(f"x{i % 7}",) for i in range(100)], "v string")
        est = sketches.kmv_estimate(sketches.kmv_sketch(df, "v", k=64), k=64).collect()[0]
        assert est["distinct_est"] == 7.0

    def test_estimate_within_bound(self, spark):
        n, k = 20000, 256
        df = spark.range(n).select(F.concat(F.lit("id-"), F.col("id")).alias("v"))
        est = sketches.kmv_estimate(sketches.kmv_sketch(df, "v", k=k), k=k).collect()[0][
            "distinct_est"
        ]
        # bottom-k relative error ~ 1/sqrt(k-2); allow 5 sigma
        assert abs(est - n) / n < 5 / math.sqrt(k - 2)

    def test_merge_equals_union(self, spark):
        a = spark.createDataFrame([(f"a{i}",) for i in range(400)], "v string")
        b = spark.createDataFrame([(f"a{i}",) for i in range(200, 600)], "v string")
        k = 64
        merged = sketches.kmv_merge(
            sketches.kmv_sketch(a, "v", k=k).unionByName(sketches.kmv_sketch(b, "v", k=k)),
            k=k,
        ).collect()[0]["kmv"]
        direct = sketches.kmv_sketch(a.unionByName(b), "v", k=k).collect()[0]["kmv"]
        assert list(merged) == list(direct)


class TestKminQuantiles:
    def test_quantiles_from_sample(self, spark):
        df = spark.range(1000).select(F.col("id").cast("int").alias("v"))
        row = sketches.kmin_quantiles(df, "v", [0.5, 0.9], k=256).collect()[0]
        # uniform sample of 0..999: p50 near 500, p90 near 900
        assert abs(row["q50"] - 500) < 120
        assert abs(row["q90"] - 900) < 120

    def test_exact_when_sample_covers_all(self, spark):
        df = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]], "v int")
        row = sketches.kmin_quantiles(df, "v", [0.5, 1.0], k=64).collect()[0]
        assert row["q50"] == 5 and row["q100"] == 10


class TestCountMin:
    def _terms(self, spark):
        rows = (
            [("apple",)] * 50
            + [("banana",)] * 30
            + [("cherry",)] * 10
            + [(f"rare{i}",) for i in range(40)]
        )
        return spark.createDataFrame(rows, "term string")

    def test_estimate_never_undercounts(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        df = self._terms(spark)
        exact = {r["term"]: r["c"] for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()}
        # tiny width forces collisions -> overcounts, never undercounts
        got = {
            r["term"]: r["est"]
            for r in sketches.heavy_hitters(df, "term", k=100, width=8, depth=2).collect()
        }
        assert set(got) == set(exact)
        for t, e in exact.items():
            assert got[t] >= e

    def test_exact_when_width_is_collision_free(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        df = self._terms(spark)
        exact = {r["term"]: r["c"] for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()}
        got = {
            r["term"]: r["est"]
            for r in sketches.heavy_hitters(df, "term", k=100, width=1 << 16, depth=4).collect()
        }
        assert got == exact

    def test_merge_equals_full_sketch(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        df = self._terms(spark)
        a = df.limit(60).localCheckpoint(eager=True)
        b = df.exceptAll(a)
        full = {
            (r["j"], r["bucket"]): r["c"]
            for r in sketches.count_min_sketch(df, "term", width=64, depth=3).collect()
        }
        merged = {
            (r["j"], r["bucket"]): r["c"]
            for r in sketches.cms_merge(
                sketches.count_min_sketch(a, "term", width=64, depth=3).unionByName(
                    sketches.count_min_sketch(b, "term", width=64, depth=3)
                )
            ).collect()
        }
        assert merged == full

    def test_md5_family_matches_xxh64_exactness(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        df = self._terms(spark)
        exact = {r["term"]: r["c"] for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()}
        got = {
            r["term"]: r["est"]
            for r in sketches.heavy_hitters(
                df, "term", k=100, width=1 << 16, depth=4, hash_family="md5"
            ).collect()
        }
        assert got == exact


class TestCmsPrebuiltSketch:
    def test_unseen_term_reports_zero_not_collision(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        hist = spark.createDataFrame([("seen",)] * 7, "term string")
        sketch = sketches.count_min_sketch(hist, "term", width=1 << 16, depth=4)
        probe = spark.createDataFrame([("seen",), ("novel",)], "term string")
        got = {
            r["term"]: r["est"]
            for r in sketches.heavy_hitters(
                probe, "term", k=10, width=1 << 16, depth=4, sketch=sketch
            ).collect()
        }
        assert got == {"seen": 7, "novel": 0}


class TestBottomkRowSample:
    """sketches.bottomk_row_sample / row_quantile_sketch."""

    def _events(self, spark, n=400):
        return spark.createDataFrame(
            [(i, "t%d" % (i % 3), float((i * 37) % 100)) for i in range(n)],
            "event_id long, event_type string, value double",
        )

    def test_sample_size_capped_and_deterministic(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        d = self._events(spark)
        a = sketches.bottomk_row_sample(d, "event_id", ["event_type"], k=16)
        b = sketches.bottomk_row_sample(d, "event_id", ["event_type"], k=16)
        ra = sorted((r.event_type, r.event_id) for r in a.collect())
        rb = sorted((r.event_type, r.event_id) for r in b.collect())
        assert ra == rb
        import collections

        per = collections.Counter(t for t, _ in ra)
        assert all(v == 16 for v in per.values())

    def test_merge_equals_full(self, spark):
        # bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) — the
        # property that makes per-day sketches union into corpus ones
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        d = self._events(spark)
        a, b = d.where("event_id % 2 = 0"), d.where("event_id % 2 = 1")
        ka = sketches.bottomk_row_sample(a, "event_id", ["event_type"], k=16)
        kb = sketches.bottomk_row_sample(b, "event_id", ["event_type"], k=16)
        merged = sketches.bottomk_row_sample(
            ka.unionByName(kb).drop("_h"), "event_id", ["event_type"], k=16
        )
        full = sketches.bottomk_row_sample(d, "event_id", ["event_type"], k=16)
        assert sorted((r.event_type, r.event_id) for r in merged.collect()) == sorted(
            (r.event_type, r.event_id) for r in full.collect()
        )

    def test_small_group_keeps_everything_and_quantiles_exact(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        d = spark.createDataFrame(
            [(i, "x", float(i)) for i in range(10)],
            "event_id long, event_type string, value double",
        )
        out = sketches.row_quantile_sketch(
            d, "value", "event_id", [0.5, 0.9], ["event_type"], k=128
        ).collect()[0]
        # n < k -> the sample IS the group; ceil-index quantiles over 0..9
        assert out.n_sampled == 10
        assert out.q50 == 4.0  # ceil(0.5*10)=5 -> 1-based 5th of sorted
        assert out.q90 == 8.0  # ceil(0.9*10)=9

    def test_rank_error_within_bound(self, spark):
        # k=256 over 4000 uniform rows: p50 estimate within ±0.1 rank
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        d = spark.createDataFrame(
            [(i, "x", float(i)) for i in range(4000)],
            "event_id long, event_type string, value double",
        )
        out = sketches.row_quantile_sketch(
            d, "value", "event_id", [0.5], ["event_type"], k=256
        ).collect()[0]
        assert out.n_sampled == 256
        assert abs(out.q50 / 4000.0 - 0.5) < 0.1

    def test_salting_does_not_change_selection(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        d = self._events(spark)
        a = sketches.bottomk_row_sample(d, "event_id", ["event_type"], k=16, salt_buckets=1)
        b = sketches.bottomk_row_sample(d, "event_id", ["event_type"], k=16, salt_buckets=64)
        assert sorted((r.event_type, r.event_id) for r in a.collect()) == sorted(
            (r.event_type, r.event_id) for r in b.collect()
        )


class TestHll:
    """sketches.hll_sketch / hll_merge / hll_estimate."""

    def _vals(self, spark, n, tag=""):
        return spark.createDataFrame(
            [("g", f"{tag}v{i % n}") for i in range(n * 2)], "g string, v string"
        )

    def test_estimate_within_published_error(self, spark):
        # p=8 -> stderr ~1.04/16 = 6.5%; assert 3 sigma on a few scales
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        for n in (50, 500, 3000):
            d = self._vals(spark, n)
            est = sketches.hll_estimate(
                sketches.hll_sketch(d, "v", ["g"]), ["g"]
            ).collect()[0].est_distinct
            assert abs(est - n) / n < 0.20, (n, est)

    def test_duplicates_do_not_move_the_estimate(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        once = spark.createDataFrame([("g", f"v{i}") for i in range(300)], "g string, v string")
        many = once.unionByName(once).unionByName(once)
        e1 = sketches.hll_estimate(sketches.hll_sketch(once, "v", ["g"]), ["g"]).collect()
        e2 = sketches.hll_estimate(sketches.hll_sketch(many, "v", ["g"]), ["g"]).collect()
        assert e1[0].est_distinct == e2[0].est_distinct

    def test_merge_equals_full(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        d = spark.createDataFrame([("g", f"v{i}") for i in range(1000)], "g string, v string")
        a, b = d.where("substr(v, 2) % 2 = 0"), d.where("substr(v, 2) % 2 = 1")
        merged = sketches.hll_merge(
            sketches.hll_sketch(a, "v", ["g"]).unionByName(
                sketches.hll_sketch(b, "v", ["g"])
            ),
            ["g"],
        )
        full = sketches.hll_sketch(d, "v", ["g"])
        assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))

    def test_small_range_uses_linear_counting(self, spark):
        # tiny cardinality: linear counting is near-exact
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        d = spark.createDataFrame([("g", f"v{i}") for i in range(10)], "g string, v string")
        est = sketches.hll_estimate(
            sketches.hll_sketch(d, "v", ["g"]), ["g"]
        ).collect()[0].est_distinct
        assert abs(est - 10) <= 1


class TestBloom:
    def _keys(self, spark, n, prefix="k"):
        from pyspark.sql import functions as F

        return spark.range(n).select(
            F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
        )

    def test_no_false_negatives(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        keys = self._keys(spark, 300)
        sk = sketches.bloom_build(keys, "key", m_words=64, k=4)
        out = sketches.bloom_probe(keys, sk, "key", m_words=64, k=4).collect()
        assert len(out) == 300 and all(r.maybe_present == 1 for r in out)

    def test_false_positive_rate_bounded(self, spark):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        sk = sketches.bloom_build(self._keys(spark, 200), "key", m_words=256, k=4)
        probes = self._keys(spark, 500, prefix="absent")
        out = sketches.bloom_probe(probes, sk, "key", m_words=256, k=4).collect()
        fp = sum(r.maybe_present for r in out) / len(out)
        # n=200, m=8192 -> theoretical fp ~ (1-e^(-800/8192))^4 ~ 7e-5
        assert fp <= 0.02

    def test_merge_equals_full_build(self, spark):
        from pyspark.sql import functions as F

        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        keys = self._keys(spark, 250)
        a = sketches.bloom_build(keys.where(F.col("key") < "k2"), "key", m_words=64, k=4)
        b = sketches.bloom_build(keys.where(F.col("key") >= "k2"), "key", m_words=64, k=4)
        merged = sketches.bloom_merge(a.unionByName(b))
        full = sketches.bloom_build(keys, "key", m_words=64, k=4)
        assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))

    def test_md5_bits_match_python_reference(self, spark):
        import hashlib

        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import sketches

        keys = ["alpha", "beta", "gamma"]
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        got = {r.word: r.bits for r in sketches.bloom_build(df, "key", m_words=16, k=3, hash_family="md5").collect()}
        ref: dict[int, int] = {}
        for key in keys:
            for i in range(3):
                h = int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:8], 16)
                p = h % (16 * 32)
                ref[p // 32] = ref.get(p // 32, 0) | (1 << (p % 32))
        assert got == ref
