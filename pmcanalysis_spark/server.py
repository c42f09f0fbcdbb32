"""HTTP serving front end over the KG serving snapshot.

The reference runs an embedded Jetty (/root/reference/JettyServer.groovy:1-25)
with one servlet (/root/reference/DermoServlet.groovy:45-502) that parses
query params, expands OWL classes, queries Lucene, and renders the ranked
hits as HTML or JSON — including the jQuery-autocomplete endpoint and the
highlighter fragments around each match.

This module is the Spark-native equivalent: a stdlib ``ThreadingHTTPServer``
in front of :class:`pmcanalysis_spark.serving.KGIndex`. The engine/transport
split is deliberate — ALL query semantics (expansion, and/or conjunction,
ranking, autocomplete, snippet fragments) live in `serving.py` where they are
oracle-gated; the HTTP layer only parses params, calls the index, and renders
JSON or minimal HTML. Every lookup is a filter over the sorted parquet
snapshot (row-group pruned), so the server holds NO driver-side index state
and any number of server processes can front the same snapshot — the
scale-out story is "N stateless HTTP processes x 1 immutable snapshot",
the same shape as the reference's N servlets over one Lucene index.

Spark actions are thread-safe per session, so the threading server can
answer concurrent requests; each request costs one small pruned-scan job.
For production QPS you would front this with the materialized result cache
(lineage.materialize_stage) or export the snapshot to a point-lookup store —
the snapshot layout (sorted by term_id) is already the right one for both.

Endpoints (GET, mirroring the servlet's param names where it has them):

- ``/lookup?term=T[&term=T2...][&mode=or|and][&limit=N][&format=json|html]``
- ``/autocomplete?prefix=P[&k=N]`` — jQuery-style JSON array of names
- ``/expand?term=T`` — the OWL expansion (class + subclasses)
- ``/resolve?name=L`` — label -> term ids
- ``/snippets?term=T[&limit=N][&width=W]`` — highlighted fragments for docs
  matching T (requires the server to be built with a docs table)
- ``/health`` — liveness probe
"""

from __future__ import annotations

import html as _html
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .serving import KGIndex, highlight_snippets


def _render_html(rows: list[dict], title: str) -> str:
    """Minimal HTML table rendering (DermoServlet.groovy's HTML branch
    emits a result table the same way; styling is the caller's concern)."""
    if not rows:
        body = "<p>no results</p>"
    else:
        cols = list(rows[0].keys())
        head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
        trs = "".join(
            "<tr>" + "".join(f"<td>{_html.escape(str(r[c]))}</td>" for c in cols) + "</tr>"
            for r in rows
        )
        body = f"<table><tr>{head}</tr>{trs}</table>"
    return (
        f"<html><head><title>{_html.escape(title)}</title></head>"
        f"<body><h1>{_html.escape(title)}</h1>{body}</body></html>"
    )


class KGServer:
    """Stateless HTTP front end over a :class:`KGIndex` snapshot.

    ``docs`` (optional) is a DataFrame with (doc_id, text) used by the
    ``/snippets`` endpoint; ``lexicon`` defaults to the index's lexicon
    table. Use ``start()``/``stop()`` (or as a context manager); ``port=0``
    picks a free port (exposed as ``.port`` after start).
    """

    def __init__(
        self,
        index: KGIndex,
        docs: DataFrame | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.index = index
        self.docs = docs
        self.host = host
        self.port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ---- endpoint implementations (pure: params -> python data) ----

    def _ep_lookup(self, q: dict) -> list[dict]:
        terms = q.get("term", [])
        if not terms:
            raise ValueError("at least one term= param required")
        mode = q.get("mode", ["or"])[0]
        if mode not in ("or", "and"):
            raise ValueError("mode must be 'or' or 'and'")
        limit = int(q.get("limit", ["1000"])[0])
        rows = self.index.lookup(terms, mode=mode, limit=limit).collect()
        return [{"doc_id": r["doc_id"], "n_matched": r["n_matched"]} for r in rows]

    def _ep_autocomplete(self, q: dict) -> list[str]:
        prefix = q.get("prefix", [""])[0]
        k = int(q.get("k", ["10"])[0])
        return self.index.autocomplete(prefix, k=k)

    def _ep_expand(self, q: dict) -> list[str]:
        term = q.get("term", [None])[0]
        if term is None:
            raise ValueError("term= param required")
        return self.index.expand(term)

    def _ep_resolve(self, q: dict) -> list[str]:
        name = q.get("name", [None])[0]
        if name is None:
            raise ValueError("name= param required")
        return self.index.resolve(name)

    def _ep_snippets(self, q: dict) -> list[dict]:
        if self.docs is None:
            raise ValueError("server built without a docs table")
        term = q.get("term", [None])[0]
        if term is None:
            raise ValueError("term= param required")
        limit = int(q.get("limit", ["20"])[0])
        width = int(q.get("width", ["30"])[0])
        # lexicon rows for this term only — the broadcast side stays tiny and
        # the doc scan is pruned to docs that actually contain the name
        lex = self.index.lexicon.filter(F.col("term_id") == term)
        rows = (
            highlight_snippets(self.docs, lex, width=width)
            .orderBy("doc_id")
            .limit(limit)
            .collect()
        )
        return [
            {"doc_id": r["doc_id"], "term_id": r["term_id"], "snippet": r["snippet"]}
            for r in rows
        ]

    # ---- HTTP plumbing ----

    def _handler_class(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet: tests/servers share stderr
                pass

            def _send(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 (http.server API)
                parsed = urlparse(self.path)
                q = parse_qs(parsed.query)
                fmt = q.get("format", ["json"])[0]
                try:
                    if parsed.path == "/health":
                        self._send(200, b'{"status": "ok"}', "application/json")
                        return
                    routes = {
                        "/lookup": server._ep_lookup,
                        "/autocomplete": server._ep_autocomplete,
                        "/expand": server._ep_expand,
                        "/resolve": server._ep_resolve,
                        "/snippets": server._ep_snippets,
                    }
                    if parsed.path not in routes:
                        self._send(404, b'{"error": "not found"}', "application/json")
                        return
                    result = routes[parsed.path](q)
                    if fmt == "html":
                        rows = (
                            result
                            if result and isinstance(result[0], dict)
                            else [{"value": v} for v in result]
                        )
                        body = _render_html(rows, parsed.path.lstrip("/")).encode()
                        self._send(200, body, "text/html; charset=utf-8")
                    else:
                        body = json.dumps(result).encode()
                        self._send(200, body, "application/json")
                except ValueError as exc:
                    self._send(
                        400, json.dumps({"error": str(exc)}).encode(), "application/json"
                    )
                except Exception as exc:  # pragma: no cover - defensive 500
                    self._send(
                        500, json.dumps({"error": str(exc)}).encode(), "application/json"
                    )

        return Handler

    def start(self) -> "KGServer":
        self._httpd = ThreadingHTTPServer(
            (self.host, self.port), self._handler_class()
        )
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="kg-server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    def __enter__(self) -> "KGServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"
