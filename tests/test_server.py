"""HTTP serving front end (reference JettyServer.groovy:1-25 bootstrap +
DermoServlet.groovy:45-502 param parsing / JSON / HTML rendering /
autocomplete endpoint / highlighter fragments).

The server is transport-only — these tests assert each endpoint returns
EXACTLY what the underlying (oracle-gated) KGIndex/highlight_snippets calls
return, plus HTTP-level behavior (param validation, content types, HTML
escape, concurrent requests)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pytest

from pmcanalysis_spark.serving import KGIndex, build_serving_tables
from pmcanalysis_spark.server import KGServer


def _get(url: str):
    with urllib.request.urlopen(url, timeout=60) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("serving_http")
    doc_terms = spark.createDataFrame(
        [
            ("T:LEAF1", "d1"), ("T:LEAF1", "d2"),
            ("T:LEAF2", "d3"),
            ("T:OTHER", "d2"), ("T:OTHER", "d4"),
        ],
        "term_id string, doc_id string",
    )
    lexicon = spark.createDataFrame(
        [("alpha one", "T:LEAF1"), ("alpha two", "T:LEAF2"),
         ("beta", "T:OTHER"), ("Alpha Root", "T:ROOT")],
        "name string, term_id string",
    )
    hierarchy = spark.createDataFrame(
        [("T:LEAF1", "T:ROOT"), ("T:LEAF2", "T:ROOT")],
        "term_id string, ancestor_id string",
    )
    docs = spark.createDataFrame(
        [
            ("d1", "x" * 40 + " alpha one occurs here " + "y" * 40),
            ("d2", "alpha one at the very start & <tagged>"),
            ("d3", "nothing relevant"),
        ],
        "doc_id string, text string",
    )
    paths = build_serving_tables(doc_terms, lexicon, hierarchy, str(base))
    index = KGIndex(spark, paths)
    with KGServer(index, docs=docs) as srv:
        yield srv, index


def test_health_and_404(served):
    srv, _ = served
    status, ctype, body = _get(srv.url + "/health")
    assert status == 200 and json.loads(body) == {"status": "ok"}
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(srv.url + "/nope")
    assert exc.value.code == 404


def test_lookup_json_matches_index(served):
    srv, index = served
    status, ctype, body = _get(srv.url + "/lookup?term=T:ROOT&term=T:OTHER&mode=and")
    assert status == 200 and ctype.startswith("application/json")
    got = json.loads(body)
    want = [
        {"doc_id": r["doc_id"], "n_matched": r["n_matched"]}
        for r in index.lookup(["T:ROOT", "T:OTHER"], mode="and").collect()
    ]
    assert got == want and [r["doc_id"] for r in got] == ["d2"]


def test_lookup_limit_and_validation(served):
    srv, _ = served
    got = json.loads(_get(srv.url + "/lookup?term=T:ROOT&limit=2")[2])
    assert len(got) == 2
    for bad in ("/lookup", "/lookup?term=T:ROOT&mode=xor"):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(srv.url + bad)
        assert exc.value.code == 400

def test_autocomplete_expand_resolve(served):
    srv, index = served
    assert json.loads(_get(srv.url + "/autocomplete?prefix=alpha")[2]) == \
        index.autocomplete("alpha")
    assert sorted(json.loads(_get(srv.url + "/expand?term=T:ROOT")[2])) == \
        ["T:LEAF1", "T:LEAF2", "T:ROOT"]
    assert json.loads(_get(srv.url + "/resolve?name=ALPHA%20ONE")[2]) == ["T:LEAF1"]


def test_snippets_fragments(served):
    srv, _ = served
    got = json.loads(_get(srv.url + "/snippets?term=T:LEAF1&width=10")[2])
    by_doc = {r["doc_id"]: r["snippet"] for r in got}
    # d1: match mid-doc -> 10 chars each side, tag-wrapped match
    assert by_doc["d1"] == "xxxxxxxxx <b>alpha one</b> occurs he"
    # d2: match at char 1 -> left side clipped to nothing
    assert by_doc["d2"] == "<b>alpha one</b> at the ve"
    assert "d3" not in by_doc


def test_html_rendering_escapes(served):
    srv, _ = served
    status, ctype, body = _get(
        srv.url + "/snippets?term=T:LEAF1&format=html&width=40"
    )
    assert status == 200 and ctype.startswith("text/html")
    text = body.decode()
    # d2's raw text contains & and <tagged>; the renderer must escape them
    assert "&amp;" in text and "&lt;tagged&gt;" in text
    assert "<table>" in text


def test_concurrent_requests(served):
    srv, index = served
    want = index.autocomplete("alpha")
    with ThreadPoolExecutor(8) as pool:
        results = list(
            pool.map(
                lambda _: json.loads(_get(srv.url + "/autocomplete?prefix=alpha")[2]),
                range(16),
            )
        )
    assert all(r == want for r in results)
