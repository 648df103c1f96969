"""BPE tokenizer training: pure-python reference implementation of the
published algorithm (greedy left-to-right non-overlapping merges,
count-desc / lex-asc tie-break, </w> end-of-word marker) replayed
exactly against the distributed trainer."""

import re

from pyspark.sql import functions as F

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import tokenizer


def _py_words(texts, min_count=1):
    counts = {}
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return {w: c for w, c in counts.items() if c >= min_count}


def _py_merge(syms, lhs, rhs):
    out = []
    for x in syms:
        if out and out[-1] == lhs and x == rhs:
            out[-1] = lhs + rhs
        else:
            out.append(x)
    return tuple(out)


def _py_bpe(word_counts, n_merges):
    vocab = {}
    for w, c in word_counts.items():
        k = tuple(list(w) + ["</w>"])
        vocab[k] = vocab.get(k, 0) + c
    merges = []
    for r in range(1, n_merges + 1):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (lhs, rhs), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, lhs, rhs, lhs + rhs, freq))
        nv = {}
        for syms, c in vocab.items():
            k = _py_merge(syms, lhs, rhs)
            nv[k] = nv.get(k, 0) + c
        vocab = nv
    return merges


def _py_encode(text, merges):
    toks = []
    for w in re.split(r"[^a-z0-9]+", text.lower()):
        if not w:
            continue
        syms = tuple(list(w) + ["</w>"])
        for _, lhs, rhs, _, _ in merges:
            syms = _py_merge(syms, lhs, rhs)
        toks.extend(syms)
    return toks


CORPUS = [
    "the lower the better, the longer the lower",
    "low low lower lowest",
    "new news newer newest, widest wider wide",
    "he said that the new law was lower than the old law",
    "numbers 42 and 4242 repeat 42",
]


class TestBpeLearn:
    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        got = [
            (r["round"], r["lhs"], r["rhs"], r["merged"], r["freq"])
            for r in tokenizer.bpe_learn(df, n_merges=6).orderBy("round").collect()
        ]
        want = _py_bpe(_py_words(CORPUS), 6)
        assert got == want
        assert len(got) == 6

    def test_greedy_non_overlapping(self, spark):
        # 'aaaa' under merge (a, a) must become [aa, aa, </w>], never
        # re-merging the freshly created token with the next 'a'.
        df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
        m = tokenizer.bpe_learn(df, n_merges=1).collect()
        assert (m[0]["lhs"], m[0]["rhs"]) == ("a", "a")
        seg = tokenizer.bpe_segment(df, [("a", "a")]).collect()[0]["bpe_tokens"]
        assert list(seg) == ["aa", "aa", "</w>"] * 3

    def test_min_count_prunes_hapax(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        got = [
            (r["round"], r["lhs"], r["rhs"], r["merged"], r["freq"])
            for r in tokenizer.bpe_learn(df, n_merges=3, min_count=2)
            .orderBy("round")
            .collect()
        ]
        assert got == _py_bpe(_py_words(CORPUS, min_count=2), 3)

    def test_exhausts_and_stops(self, spark):
        # one repeated 2-char word: pairs run out after 2 merges
        df = spark.createDataFrame([("ab ab ab",)], "text string")
        m = tokenizer.bpe_learn(df, n_merges=10).orderBy("round").collect()
        assert [(r["lhs"], r["rhs"]) for r in m] == [("a", "b"), ("ab", "</w>")]


class TestBpeSegment:
    def test_matches_python_encode(self, spark):
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        merges = _py_bpe(_py_words(CORPUS), 5)
        pairs = [(lhs, rhs) for _, lhs, rhs, _, _ in merges]
        rows = tokenizer.bpe_segment(df, pairs).collect()
        for row in rows:
            assert list(row["bpe_tokens"]) == _py_encode(row["text"], merges)

    def test_token_count_conservation(self, spark):
        # every word contributes at least one token and at most
        # len(word)+1 symbols; total marker count == word count
        df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
        merges = _py_bpe(_py_words(CORPUS), 4)
        pairs = [(lhs, rhs) for _, lhs, rhs, _, _ in merges]
        out = tokenizer.bpe_segment(df, pairs)
        n_words = sum(len([w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]) for t in CORPUS)
        n_enders = out.select(
            F.sum(
                F.size(F.filter("bpe_tokens", lambda t: t.endswith("</w>")))
            ).alias("n")
        ).collect()[0]["n"]
        assert n_enders == n_words


class TestBpeEncodeStats:
    def _py_ref(self, texts, n_merges):
        """Pure-python BPE learn + encode replay (greedy left fold,
        ties lhs/rhs asc — the bpe_learn contract)."""
        import re
        from collections import Counter

        def words_of(t):
            return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

        wc = Counter(w for t in texts.values() for w in words_of(t))
        syms = {w: list(w) + ["</w>"] for w in wc}

        def fold(seq, lhs, rhs):
            out = []
            for x in seq:
                if out and out[-1] == lhs and x == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(x)
            return out

        for _ in range(n_merges):
            pc = Counter()
            for w, ss in syms.items():
                for i in range(len(ss) - 1):
                    pc[(ss[i], ss[i + 1])] += wc[w]
            if not pc:
                break
            (lhs, rhs), _f = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            syms = {w: fold(ss, lhs, rhs) for w, ss in syms.items()}
        out = {}
        for cid, t in texts.items():
            ws = words_of(t)
            if not ws:
                continue
            ni = sum(len(w) + 1 for w in ws)
            nt = sum(len(syms[w]) for w in ws)
            out[cid] = (len(ws), ni, nt, round(nt / ni, 6))
        return out

    def test_matches_python_replay(self, spark):
        texts = {
            "a": "low lower lowest low low",
            "b": "new newer newest new",
            "c": "low new low new",
        }
        df = spark.createDataFrame(list(texts.items()), "chunk_id string, text string")
        got = {
            r["chunk_id"]: (r["n_words"], r["n_init_symbols"],
                            r["n_bpe_tokens"], r["compression"])
            for r in tokenizer.bpe_encode_stats(df, n_merges=4, id_col="chunk_id").collect()
        }
        assert got == self._py_ref(texts, 4)
        # merges actually compress: fewer BPE tokens than raw symbols
        assert all(v[2] < v[1] for v in got.values())

    def test_empty_doc_omitted(self, spark):
        df = spark.createDataFrame(
            [("a", "hello hello"), ("e", "!!!")], "chunk_id string, text string"
        )
        got = tokenizer.bpe_encode_stats(df, n_merges=2, id_col="chunk_id").collect()
        assert [r["chunk_id"] for r in got] == ["a"]
