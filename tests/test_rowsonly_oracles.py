"""Exact pure-Python oracles for the driver queries that DuckDB cannot
express (no xxhash64 there): dd_minhash_lsh, dd_simhash, sim_ann_topk,
mm_features.  Each test recomputes the full result set at sf0.001 from
first principles (tests/xxhash_ref.py implements public XXH64 with
Spark's per-type dispatch) and asserts EXACT row-set equality against
the Spark query — upgrading these entries from rows-only to
value-checked."""

import hashlib
import math
import re

import numpy as np
import pytest

import __spark_entry__ as E
from tests.xxhash_ref import spark_xxhash64

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    rows = E._docs_with_dups(spark, SF).select("doc_id", "text").collect()
    return [(r["doc_id"], r["text"]) for r in rows]


def _shingles(text: str, n: int) -> list[str]:
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    x &= M64
    return x if r == 0 else ((x << r) | (x >> (64 - r))) & M64


def _to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _signature(text: str, shingle_n: int, num_hashes: int):
    """Mirror of dedup.minhash_signatures: g_i(s) = h1 XOR
    rotl(h2, (i*19+7) % 64), h2 = xxhash64(1, h1)."""
    h1s = [spark_xxhash64(s) for s in _shingles(text, shingle_n)]
    if not h1s:
        return None
    h2s = [spark_xxhash64(1, ("long", h)) for h in h1s]
    sig = []
    for i in range(num_hashes):
        r = (i * 19 + 7) % 64
        sig.append(
            min(
                _to_signed((h1 & M64) ^ _rotl64(h2, r))
                for h1, h2 in zip(h1s, h2s)
            )
        )
    return sig


class TestXxhashRef:
    def test_matches_spark(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("hello world",), ("",), ("a" * 100,), ("unicode é中\U0001f600",)],
            "s string",
        )
        got = df.select(
            F.xxhash64("s").alias("hs"),
            F.xxhash64(F.lit(7), F.xxhash64("s")).alias("hchain"),
            F.xxhash64(F.lit(1234567890123), F.xxhash64("s")).alias("hlong"),
        ).collect()
        for r, row in zip(got, df.collect()):
            s = row["s"]
            hs = spark_xxhash64(s)
            assert r["hs"] == hs
            assert r["hchain"] == spark_xxhash64(7, ("long", hs))
            assert r["hlong"] == spark_xxhash64(1234567890123, ("long", hs))


def _lsh_expected(sigs: dict, bucket_fn, bands=8, rows_per_band=4, k=32):
    buckets = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            key = (b, bucket_fn(sig[b * rows_per_band : (b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(doc_id)
    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    expected = set()
    for a, b in cands:
        eq = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        est = eq / k
        if est >= 0.5:
            expected.add((a, b, est))
    return expected


class TestMinhashLshOracle:
    def test_engine_default_xxh64_exact(self, spark, docs_with_dups):
        """ENGINE-DEFAULT family (xxh64): the same shape the retired
        rows-only driver entry had, now pinned against the library
        call directly."""
        from pyspark.sql import functions as F

        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import dedup

        sigs = {}
        for doc_id, text in docs_with_dups:
            sig = _signature(text, 3, 32)
            if sig is not None:
                sigs[doc_id] = sig
        expected = _lsh_expected(
            sigs,
            lambda band: spark_xxhash64(*[("long", h) for h in band]),
        )
        sdf = dedup.minhash_signatures(E._docs_with_dups(spark, SF)).cache()
        got = {
            (r["a_id"], r["b_id"], r["est_jaccard"])
            for r in dedup.minhash_jaccard_estimate(
                sdf, dedup.minhash_lsh_candidates(sdf)
            )
            .where(F.col("est_jaccard") >= 0.5)
            .collect()
        }
        assert got == expected and len(expected) >= 50  # >= planted dups

    def test_dd_minhash_lsh_md5_exact(self, spark, docs_with_dups):
        """The DRIVER entry (md5 family, DuckDB-oracled) against a
        hashlib.md5 recomputation."""
        sigs = {}
        for doc_id, text in docs_with_dups:
            sh = _shingles(text, 3)
            if not sh:
                continue
            sigs[doc_id] = [
                min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in sh)
                for i in range(32)
            ]
        expected = _lsh_expected(
            sigs, lambda band: hashlib.md5("|".join(band).encode()).hexdigest()
        )
        got = {
            (r["a_id"], r["b_id"], r["est_jaccard"])
            for r in E.q_dd_minhash_lsh(spark, SF).collect()
        }
        assert got == expected and len(expected) >= 50


def _simhash_fp(text: str, tok_hash) -> int:
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    hs = [tok_hash(t) for t in toks]
    fp = 0
    for b in range(64):
        s = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if s > 0:
            fp |= 1 << b
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def _simhash_expected(fps: dict) -> set:
    buckets = {}
    for doc_id, fp in fps.items():
        buckets.setdefault(fp >> (64 - 16), []).append(doc_id)
    expected = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                ham = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
                if ham <= 3:
                    expected.add((a, b, ham))
    return expected


class TestSimhashOracle:
    def test_engine_default_xxh64_exact(self, spark, docs_with_dups):
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import dedup

        fps = {
            doc_id: _simhash_fp(text, spark_xxhash64)
            for doc_id, text in docs_with_dups
            if text.strip()
        }
        f = dedup.simhash(E._docs_with_dups(spark, SF)).cache()
        got = {
            (r["a_id"], r["b_id"], r["hamming"])
            for r in dedup.simhash_candidates(f, max_hamming=3).collect()
        }
        assert got == _simhash_expected(fps) and len(got) >= 50

    def test_multi_rotation_recovers_prefix_miss(self, spark):
        """A pair differing ONLY inside the 16-bit prefix window is
        invisible to rotation 0 but found under a rotated view."""
        from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import dedup

        base = 0x0123456789ABCDEF
        flipped = base ^ (1 << 60)  # bit inside the top-16 prefix
        far = 0x7EDCBA9876543210
        fps = spark.createDataFrame(
            [(1, base), (2, flipped), (3, far)], "id long, simhash long"
        )
        one = dedup.simhash_candidates(fps, max_hamming=3, rotations=1).collect()
        assert [(r["a_id"], r["b_id"]) for r in one] == []  # prefix differs -> missed
        four = dedup.simhash_candidates(fps, max_hamming=3, rotations=4).collect()
        assert [(r["a_id"], r["b_id"], r["hamming"]) for r in four] == [(1, 2, 1)]

    def test_dd_simhash_md5_exact(self, spark, docs_with_dups):
        """Driver entry (md5 family): token hash = first 16 hex chars
        of md5 as a 64-bit value."""

        def md5_tok(t: str) -> int:
            return int(hashlib.md5(t.encode()).hexdigest()[:16], 16)

        fps = {
            doc_id: _simhash_fp(text, md5_tok)
            for doc_id, text in docs_with_dups
            if text.strip()
        }
        got = {
            (r["a_id"], r["b_id"], r["hamming"])
            for r in E.q_dd_simhash(spark, SF).collect()
        }
        assert got == _simhash_expected(fps) and len(got) >= 50


class TestAnnOracle:
    def test_sim_ann_topk_exact(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype="float64") for r in emb}
        q = vecs[0]
        planes = np.random.RandomState(42).randn(16, 64).astype("float64")

        def buckets(v):
            bits = (planes @ v >= 0).astype(int)
            return {
                (b, "".join(map(str, bits[b * 4 : (b + 1) * 4]))) for b in range(4)
            }

        qb = buckets(q)
        cands = [vid for vid, v in vecs.items() if buckets(v) & qb]
        scored = []
        qn = math.sqrt(float(q @ q))
        for vid in cands:
            v = vecs[vid]
            c = float(q @ v) / (qn * math.sqrt(float(v @ v)))
            scored.append((vid, round(c, 6)))
        scored.sort(key=lambda t: (-t[1], t[0]))
        expected = scored[:10]
        got = [
            (r["vec_id"], r["cosine"]) for r in E.q_sim_ann_topk(spark, SF).collect()
        ]
        assert [g[0] for g in got] == [e[0] for e in expected]
        for (gv, gc), (ev, ec) in zip(got, expected):
            assert abs(gc - ec) < 1e-6  # FP summation order may differ in the last ulp


class TestMmFeaturesOracle:
    def test_mm_features_exact(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").collect()
        expected = set()
        for r in docs:
            b = r["text"].encode("utf-8")
            arr = np.frombuffer(b, dtype=np.uint8)
            expected.add(
                (
                    str(r["doc_id"]),
                    "binary",
                    len(b),
                    hashlib.sha256(b).hexdigest(),
                    "bin",
                    # the contract query rounds floats to 6 (so the
                    # DuckDB oracle's moment-formula std agrees)
                    round(float(arr.mean()), 6) if len(arr) else 0.0,
                    round(float(arr.std()), 6) if len(arr) else 0.0,
                    int(np.bincount(arr, minlength=256).argmax()) if len(arr) else 0,
                )
            )
        got = {
            (
                r["url"], r["media_type"], r["byte_len"], r["sha256"], r["fmt"],
                round(r["mean_byte"], 6), round(r["std_byte"], 6), r["top_byte"],
            )
            for r in E.q_mm_features(spark, SF).collect()
        }
        assert got == expected
