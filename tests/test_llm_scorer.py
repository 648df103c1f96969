"""LLM relation-scorer plumbing (R6 LLM path + R7 probe) pinned
WITHOUT a model: a fake Ollama-protocol HTTP server exercises the
availability gate, the retry/backoff loop, the JSON-verdict parse and
the regex fallback (RelationScorer.scala:92-152 /
OllamaClient.scala:78-141 parity)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.operators import scorer


class _FakeOllama(BaseHTTPRequestHandler):
    """Scripted responses keyed by the Concept A lemma in the prompt.

    Counters live in the server object (the server runs in the test
    process even when requests come from executor-side python
    workers), so retry attempts are observable."""

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        if self.path == "/api/tags":
            body = json.dumps({"models": [{"name": "fake"}]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", "0"))
        req = json.loads(self.rfile.read(n))
        prompt = req["prompt"]
        with self.server.lock:
            self.server.calls.append(prompt)
        if "Concept A: good_json" in prompt:
            resp = 'Sure! {"predicate": "is_a", "confidence": 1.7, "evidence": "seen it"} ok?'
        elif "Concept A: bad_pred" in prompt:
            resp = '{"predicate": "eats", "confidence": 0.8, "evidence": "x"}'
        elif "Concept A: regexy" in prompt:
            resp = 'I think the predicate: causes with confidence: 0.71 and evidence: "because so"'
        elif "Concept A: garbage" in prompt:
            resp = "no structure here at all"
        elif "Concept A: flaky" in prompt:
            with self.server.lock:
                self.server.flaky_attempts += 1
                attempts = self.server.flaky_attempts
            if attempts <= 2:  # fail twice, succeed on the 3rd retry
                self.send_error(500)
                return
            resp = '{"predicate": "part_of", "confidence": 0.9, "evidence": "third time"}'
        elif "Concept A: dead" in prompt:
            self.send_error(500)
            return
        else:
            resp = '{"predicate": "related_to", "confidence": 0.5}'
        body = json.dumps({"response": resp}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def fake_ollama():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeOllama)
    srv.lock = threading.Lock()
    srv.calls = []
    srv.flaky_attempts = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestProbe:
    def test_available(self, fake_ollama):
        _, url = fake_ollama
        assert scorer.llm_available(url) is True

    def test_unavailable(self):
        assert scorer.llm_available("http://127.0.0.1:9") is False
        assert scorer.llm_available(None) is False


class TestParseVerdict:
    def test_json_blob_validates_and_clamps(self):
        pred, conf, ev = scorer.parse_verdict(
            'noise {"predicate": "is_a", "confidence": 1.7, "evidence": "e"} noise', "fb"
        )
        assert (pred, conf, ev) == ("is_a", 1.0, "e")

    def test_unknown_predicate_defaults(self):
        pred, conf, _ = scorer.parse_verdict(
            '{"predicate": "eats", "confidence": 0.8}', "fb"
        )
        assert pred == "related_to" and conf == 0.8

    def test_regex_fallback(self):
        pred, conf, ev = scorer.parse_verdict(
            'the predicate: causes, confidence: 0.71, evidence: "why"', "fb"
        )
        assert (pred, conf, ev) == ("causes", 0.71, "why")

    def test_regex_fallback_defaults(self):
        pred, conf, ev = scorer.parse_verdict("nothing here", "fallback evidence text")
        assert (pred, conf, ev) == ("related_to", 0.5, "fallback evidence text")

    def test_fallback_evidence_utf16_truncation(self):
        # astral-plane char counts as TWO UTF-16 units (JVM .take parity)
        pred, conf, ev = scorer.parse_verdict("x", "\U0001f600" * 60)
        assert len(ev) == 50  # 100 UTF-16 units = 50 surrogate pairs


class TestRetry:
    def test_succeeds_after_two_failures(self, fake_ollama):
        srv, url = fake_ollama
        with srv.lock:
            srv.flaky_attempts = 0
        resp = scorer.ollama_generate(
            url, "fake", scorer.build_prompt("flaky", "b", "ev"), retries=3, backoff_s=0
        )
        assert "part_of" in resp
        assert srv.flaky_attempts == 3

    def test_exhausted_retries_raise(self, fake_ollama):
        _, url = fake_ollama
        with pytest.raises(Exception):
            scorer.ollama_generate(
                url, "fake", scorer.build_prompt("dead", "b", "ev"), retries=2, backoff_s=0
            )


class TestUdfEndToEnd:
    def test_batched_scoring_all_paths(self, spark, fake_ollama):
        srv, url = fake_ollama
        with srv.lock:
            srv.flaky_attempts = 0
        rows = [
            ("good_json", "b", "ctx1"),
            ("bad_pred", "b", "ctx2"),
            ("regexy", "b", "ctx3"),
            ("garbage", "b", "some longer fallback context"),
            ("flaky", "b", "ctx5"),
            ("dead", "b", "dead fallback ctx"),
        ]
        df = spark.createDataFrame(rows, "a_lemma string, b_lemma string, evidence string")
        udf = scorer.make_llm_scorer_udf(url, retries=3, backoff_s=0.0, timeout_s=10)
        out = {
            r["a_lemma"]: r["v"]
            for r in df.withColumn(
                "v", udf("a_lemma", "b_lemma", "evidence")
            ).collect()
        }
        assert out["good_json"]["predicate"] == "is_a" and out["good_json"]["confidence"] == 1.0
        assert out["bad_pred"]["predicate"] == "related_to"
        assert out["regexy"]["predicate"] == "causes" and out["regexy"]["confidence"] == 0.71
        assert out["regexy"]["evidence"] == "because so"
        g = out["garbage"]
        assert (g["predicate"], g["confidence"], g["evidence"]) == (
            "related_to", 0.5, "some longer fallback context",
        )
        assert out["flaky"]["predicate"] == "part_of"  # retries recovered it
        d = out["dead"]  # exhausted retries -> deterministic fallback verdict
        assert (d["predicate"], d["confidence"], d["evidence"]) == (
            "related_to", 0.5, "dead fallback ctx",
        )
        # every row produced exactly one verdict; the flaky row hit the
        # server 3 times (2 failures + success), the dead row `retries`
        assert srv.flaky_attempts == 3
