"""REST serving surface: the reference's primary entry point
(api-jersey ``MahaResource.scala`` — ``@Path("/registry")``) rebuilt on
the standard-library HTTP server over a live engine.

Routes (all under ``/registry/{registry}``, mirroring MahaResource):

- ``GET  /cubes``                          cube-name list (:53-61)
- ``GET  /domain``                         full domain json (:64-73)
- ``GET  /domain/cubes/{cube}``            per-cube domain (:76-85)
- ``GET  /flattenDomain``                  flat domain (:88-97)
- ``GET  /flattenDomain/cubes/{cube}``     flat per-cube (:100-121)
- ``POST /schemas/{schema}/query``         JSON reporting request ->
  reference JSON envelope via the full engine lifecycle (:170+)
- ``POST /schemas/{schema}/sql``           SQL text -> same envelope
  (the Calcite entry ``MahaCalciteSqlParser``; our grammar is
  ``request/sql.py``)

Scale posture: the handler is a thin adapter — the engine executes on
the cluster, rows stream through ``toLocalIterator`` inside the JSON
serializer, and the server is ``ThreadingHTTPServer`` so one slow query
never blocks discovery endpoints. A production deployment would put the
same engine behind any WSGI/ASGI stack; nothing here is stdlib-bound by
design, only by the no-new-dependencies environment.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional

from ..engine import MahaSparkEngine


class RestServer:
    """In-process HTTP server bound to one engine + registry name."""

    def __init__(self, engine: MahaSparkEngine,
                 registry_name: str = "maha", port: int = 0,
                 request_log_path: Optional[str] = None):
        self.engine = engine
        self.registry_name = registry_name
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        self.port = port
        if request_log_path and engine.request_logger is None:
            # the service layer always logs requests in the reference
            # (MahaRequestLogHelper); opt in with a JSONL path here
            from ..log.request_log import JsonlRequestLogWriter
            engine.request_logger = JsonlRequestLogWriter(request_log_path)

    # ------------------------------------------------------------------
    def start(self) -> "RestServer":
        handler = _make_handler(self.engine, self.registry_name)
        self._httpd = ThreadingHTTPServer(("localhost", self.port), handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    @property
    def base_url(self) -> str:
        return f"http://localhost:{self.port}"


def _make_handler(engine: MahaSparkEngine, registry_name: str):
    from ..request.request import ValidationError
    from ..request.sql import SqlParseError
    from .avatica import AvaticaHandler

    from .avatica_proto import ProtobufAvaticaHandler

    registry = engine.registry
    avatica = AvaticaHandler(engine)  # shared: connections span requests
    avatica_pb = ProtobufAvaticaHandler(avatica)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test output
            pass

        # ------------------------------------------------------ helpers
        def _send(self, code: int, payload: Any) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _not_found(self, msg: str) -> None:
            # MahaResource NotFoundException(Error(...)) shape
            self._send(404, {"errorMsg": msg})

        def _parts(self) -> list[str]:
            return [p for p in self.path.split("?")[0].split("/") if p]

        def _check_registry(self, parts: list[str]) -> bool:
            if len(parts) < 2 or parts[0] != "registry" \
                    or parts[1] != registry_name:
                self._not_found(
                    f"registry {'/'.join(parts[1:2]) or '?'} not found")
                return False
            return True

        # ------------------------------------------------------- routes
        def do_GET(self) -> None:
            p = self._parts()
            if not self._check_registry(p):
                return
            try:
                rest = p[2:]
                if rest == ["cubes"]:
                    self._send(200, registry.cubes())
                elif rest == ["domain"]:
                    self._send(200, registry.domain_json())
                elif len(rest) == 3 and rest[:2] == ["domain", "cubes"]:
                    self._send(200, registry.cube_json(rest[2]))
                elif rest == ["flattenDomain"]:
                    self._send(200, registry.flatten_domain_json())
                elif len(rest) == 3 and \
                        rest[:2] == ["flattenDomain", "cubes"]:
                    self._send(200, registry.flatten_cube_json(rest[2]))
                elif len(rest) == 4 and \
                        rest[:2] == ["flattenDomain", "cubes"]:
                    self._send(200, registry.flatten_cube_json(
                        rest[2], int(rest[3])))
                elif rest == ["status"]:
                    # serving telemetry: result-cache hit rates, scoped
                    # caches, binding memo, persisted-block residency
                    self._send(200, engine.status())
                else:
                    self._not_found(f"no route {self.path}")
            except KeyError as e:
                self._not_found(str(e))

        def do_POST(self) -> None:
            p = self._parts()
            # Avatica JSON wire endpoint (reference mounts
            # AvaticaMahaJsonHandler at /sql-avatica): one POST per
            # protocol request, connection state held server-side.
            # Content-Type selects the serialization, matching the
            # reference's AvaticaMahaJsonHandler / ...ProtobufHandler pair
            # (stock Avatica JDBC drivers default to protobuf).
            if p and p[-1] in ("avatica", "sql-avatica"):
                n = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(n)
                ctype = self.headers.get("Content-Type", "")
                if "protobuf" in ctype:
                    out = avatica_pb.handle_bytes(raw)
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/x-google-protobuf")
                    self.send_header("Content-Length", str(len(out)))
                    self.end_headers()
                    self.wfile.write(out)
                    return
                body = json.loads(raw.decode() or "{}")
                self._send(200, avatica.handle(body))
                return
            if not self._check_registry(p):
                return
            rest = p[2:]
            if len(rest) != 3 or rest[0] != "schemas" \
                    or rest[2] not in ("query", "sql"):
                self._not_found(f"no route {self.path}")
                return
            schema = rest[1]
            n = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(n).decode()
            try:
                if rest[2] == "sql":
                    from ..request.sql import sql_to_request_json
                    body = sql_to_request_json(body, registry=registry)
                # MahaResource reads the caller's Request-Id header into
                # the request log; generated when absent
                self._send(200, engine.execute(
                    body, schema=schema,
                    request_id=self.headers.get("Request-Id"),
                    user_id=self.headers.get("User-Id", "")))
            except (ValidationError, SqlParseError) as e:
                self._send(400, {"errorMsg": str(e)})  # client error
            except Exception as e:  # engine/execution failure -> 500
                # (reference GeneralError handling: runtime errors are
                # server errors, not client errors — 4xx would skew
                # client retry behavior and the request-log status)
                self._send(500, {"errorMsg": str(e)})

    return Handler
