"""Interactive store query HTTP facade.

Ref: kstream/store/http.go:120-401 — REST endpoints over the store registry:
  GET /stores                         list store names        (http.go:~130)
  GET /stores/{store}                 full scan               (http.go:149-192)
  GET /stores/{store}/{key}           point lookup            (http.go:333-392)
  GET /stores/{store}/indexes/{col}/{value}   index lookup    (http.go:194-327)

Spark-first: every endpoint is a thin JSON shim over the registry's
DataFrames — Spark SQL is the real query surface (StoreRegistry.sql); this
server exists for drop-in parity with the reference's HTTP consumers.
Stdlib-only (ThreadingHTTPServer), started on a daemon thread.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

# full-scan page cap: the reference pages its scan through an iterator
# (store/http.go:149-192) instead of buffering the store; collect() has no
# such backpressure, so an explicit row cap (?limit= overridable) keeps a
# big store from materializing on the HTTP thread
DEFAULT_SCAN_LIMIT = 10_000


class StoreHttpServer:
    def __init__(self, registry, host: str = "127.0.0.1", port: int = 0):
        self.registry = registry
        reg = registry

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, payload) -> None:
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                url = urlparse(self.path)
                parts = [unquote(p) for p in url.path.strip("/").split("/") if p]
                try:
                    if parts == ["stores"]:
                        return self._json(200, reg.stores())
                    if len(parts) >= 2 and parts[0] == "stores":
                        store = reg.store(parts[1])
                        if len(parts) == 2:          # full scan (capped)
                            q = parse_qs(url.query)
                            raw = q.get("limit", [DEFAULT_SCAN_LIMIT])[0]
                            try:
                                limit = int(raw)
                            except (TypeError, ValueError):
                                return self._json(
                                    400, {"error": f"bad limit: {raw!r}"})
                            if limit < 0:
                                return self._json(
                                    400, {"error": f"bad limit: {limit}"})
                            # collect limit+1 so a truncated scan is
                            # distinguishable from a complete one (the
                            # reference pages the COMPLETE store —
                            # store/http.go:149-192; we cap but say so)
                            rows = [r.asDict() for r in
                                    store.get_all().limit(limit + 1).collect()]
                            truncated = len(rows) > limit
                            self.send_response(200)
                            body = json.dumps(rows[:limit],
                                              default=str).encode()
                            self.send_header("Content-Type",
                                             "application/json")
                            self.send_header("X-Truncated",
                                             "true" if truncated else "false")
                            self.send_header("Content-Length", str(len(body)))
                            self.end_headers()
                            self.wfile.write(body)
                            return None
                        if len(parts) == 3:          # point lookup
                            key: object = parts[2]
                            try:
                                key = int(parts[2])
                            except ValueError:
                                pass
                            rows = [r.asDict() for r in store.get(key).collect()]
                            if not rows:
                                return self._json(404, {"error": "key not found"})
                            return self._json(200, rows[0])
                        if len(parts) == 5 and parts[2] == "indexes":
                            val: object = parts[4]
                            try:
                                val = int(parts[4])
                            except ValueError:
                                pass
                            rows = [r.asDict() for r in
                                    store.get_indexed(parts[3], val).collect()]
                            return self._json(200, rows)
                    return self._json(404, {"error": "unknown route"})
                except KeyError:
                    return self._json(404, {"error": f"store not found: {parts[1]}"})
                except Exception as e:  # noqa: BLE001
                    return self._json(500, {"error": str(e)})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_port
        self._thread: threading.Thread | None = None

    def start(self) -> "StoreHttpServer":
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
