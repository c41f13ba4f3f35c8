"""HTTP JSON endpoint over the serving engine — the actix-web analog.

The reference serves `POST /search` and `GET /info` from a resident
tantivy searcher (cantine/src/main.rs:245-260 mounts the routes, :253 caps
the request body at 4 KiB). This is the same surface over IndexServer:

  POST /search   SearchQuery JSON → {total_found, items, next, agg}
                 400 on bad request (unknown field, bad cursor, bad range —
                 api.BadRequest), 413 over the 4 KiB body cap
  GET  /info     {n_docs, tiers, features: {min/max/count per feature}}
                 (main.rs:174-189 computes the same full-range view)
  GET  /healthz  200 once an engine is open

Concurrency: stdlib ThreadingHTTPServer — one thread per request, all
sharing the engine. That is safe by construction (kernel jobs run on a
cloned never-mutated session, pinned tables are read-only; pytest pins a
4-thread concurrent search) and FAIR scheduling interleaves the resulting
small Spark jobs (bench.py QPS measurements). A background thread polls
IndexServer.maybe_refresh(), so a generation landing mid-traffic swaps the
engine blue/green under the running endpoint — requests always read
`server.engine` at dispatch time and in-flight queries on a just-retired
engine still complete (its directories are deleted one swap LATER).

Driver-side work per request is trivial (JSON in/out, ≤255 items), so the
endpoint adds no measurable latency over engine.search() — the QPS bench
(bench.py SPARK_GRAFT_QPS=1) drives THIS endpoint, not the Python API.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from cantine_spark.api import BadRequest, SearchResult

MAX_BODY_BYTES = 4096  # the reference's request cap (main.rs:253)


def result_to_dict(res: SearchResult) -> dict:
    return {
        "total_found": res.total_found,
        "items": res.items,
        "next": res.next,
        "agg": ({k: [vars(s) for s in v] for k, v in res.agg.items()}
                if res.agg else None),
    }


@dataclass
class SearchHTTPServer:
    """HTTP frontend over an IndexServer (or anything with .engine/.search
    and .maybe_refresh). Use as a context manager or call start()/stop()."""
    server: object                     # serve.IndexServer
    host: str = "127.0.0.1"
    port: int = 0                      # 0 → ephemeral (tests)
    poll_seconds: float = 5.0          # refresh poll cadence; 0 → no thread

    def __post_init__(self):
        backend = self.server

        class Handler(BaseHTTPRequestHandler):
            # one engine lookup per request → a refresh swap between
            # requests is picked up immediately, never mid-request
            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 (stdlib casing)
                if self.path == "/healthz":
                    try:
                        backend.engine
                    except RuntimeError:
                        return self._json(503, {"status": "no index yet"})
                    return self._json(200, {"status": "ok"})
                if self.path == "/info":
                    from cantine_spark.aggregate import full_range_info
                    eng = backend.engine
                    feats = sorted(eng.features)
                    return self._json(200, {
                        "n_docs": eng.reader.num_docs,
                        "tiers": len(eng.reader.manifest.get("tiers", []))
                        or 1,
                        "features": full_range_info(eng.reader.docmeta,
                                                    feats),
                    })
                return self._json(404, {"error": "not found"})

            def do_POST(self):  # noqa: N802
                if self.path != "/search":
                    return self._json(404, {"error": "not found"})
                length = int(self.headers.get("Content-Length", 0))
                if length > MAX_BODY_BYTES:
                    return self._json(413, {
                        "error": f"body exceeds {MAX_BODY_BYTES} bytes"})
                raw = self.rfile.read(length)
                try:
                    query = json.loads(raw or b"{}")
                except json.JSONDecodeError as e:
                    return self._json(400, {"error": f"bad JSON: {e}"})
                try:
                    res = backend.search(query)
                except BadRequest as e:
                    return self._json(400, {"error": str(e)})
                except RuntimeError as e:  # no generations yet
                    return self._json(503, {"error": str(e)})
                return self._json(200, result_to_dict(res))

            def log_message(self, *a):  # quiet by default
                pass

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()

    # ----------------------------------------------------------- lifecycle
    def start(self) -> "SearchHTTPServer":
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        self._threads.append(t)
        if self.poll_seconds > 0 and hasattr(self.server, "maybe_refresh"):
            r = threading.Thread(target=self._refresh_loop, daemon=True)
            r.start()
            self._threads.append(r)
        return self

    def _refresh_loop(self) -> None:
        while not self._stop.wait(self.poll_seconds):
            try:
                if self.server.maybe_refresh():
                    m = self.server.engine.reader.manifest
                    print(f"[serve] refreshed: {m.get('n_docs')} docs",
                          flush=True)
            except Exception as e:  # noqa: BLE001 — keep serving on a
                # failed refresh; the old engine stays live (blue/green)
                print(f"[serve] refresh failed: {e!r}", flush=True)

    def stop(self) -> None:
        self._stop.set()
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "SearchHTTPServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"
