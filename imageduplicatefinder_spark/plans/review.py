"""Interactive review surface: the reference's REST API re-expressed
over the engine's tables, using only the stdlib HTTP server (this
container ships no web framework).

Route parity with the reference (ref: app/WebServer.java:44-239):

=================  =============================================
reference route    here
=================  =============================================
POST /api/process  POST /api/process {"root", "extensions"?} ->
                   {"job_id"} — scans the directory, runs the full
                   DedupPipeline in a background thread
GET /api/job/{id}  GET /api/job/<id> -> {"status", "metrics": [...]}
                   (per-stage rows from the checkpoint manager)
GET /api/clusters  GET /api/clusters?job=<id>&limit=N
GET /api/plan      GET /api/plan?job=<id>&limit=N
POST /api/plan/    POST /api/plan/update {"job", "overrides":
  update             [{repo,path,commit,action}]} — runs
                     ``apply_plan_overrides`` (same safety rules as
                     the reference editor: sanitized actions,
                     KEEP-wins dedup, every cluster keeps a keeper)
                     and REPLACES the job's plan
POST /api/apply    POST /api/apply {"job", "quarantine_dir",
                     "dry_run"?} -> the move manifest
                     (``plans/apply.py``)
GET /api/image     NOT carried over — thumbnail serving is UI
                   concern; the media tier exposes features/sketches
                   as tables instead (SURVEY §2.1 S10 scope note)
=================  =============================================

The server is a review-time driver-side tool: DataFrames stay lazy
until a route materializes a bounded page (``limit`` capped at
``MAX_PAGE``); the pipeline itself runs exactly as in batch. One
background thread per job; job state is in-process (the reference's
jobs map, WebServer.java:143-166).
"""

from __future__ import annotations

import json
import threading
import uuid
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

MAX_PAGE = 10_000


class _ClientError(ValueError):
    """Malformed client input -> HTTP 400 (not the generic 500)."""


class _Job:
    def __init__(self) -> None:
        self.status = "RUNNING"
        self.error: str | None = None
        self.result = None
        self.pipe = None
        # serializes plan-mutating routes (update/apply) against each
        # other: ThreadingHTTPServer handles requests concurrently, and
        # two unsynchronized updates would both read the same base plan
        # and silently drop one client's overrides (last-writer-wins)
        self.lock = threading.Lock()


def _df_page(df, limit) -> list[dict]:
    try:
        limit = max(1, min(int(limit), MAX_PAGE))
    except (TypeError, ValueError) as exc:
        raise _ClientError(f"bad 'limit': {limit!r}") from exc
    return [
        {k: (v if isinstance(v, (int, float, str, bool, type(None)))
             else str(v))
         for k, v in row.asDict().items()}
        for row in df.limit(limit).collect()
    ]


class ReviewServer:
    """``ReviewServer(spark).start()`` -> port. ``stop()`` shuts down."""

    def __init__(self, spark: SparkSession, port: int = 0) -> None:
        self.spark = spark
        self.port = port
        self.jobs: dict[str, _Job] = {}
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # --- job runner ---------------------------------------------------

    def _run_job(self, job: _Job, root: str, extensions: tuple) -> None:
        try:
            import tempfile

            from imageduplicatefinder_spark.config import DedupConfig
            from imageduplicatefinder_spark.plans.pipeline import (
                DedupPipeline,
            )
            from imageduplicatefinder_spark.sources.files import (
                files_as_documents,
                scan_files,
            )

            docs = files_as_documents(
                scan_files(self.spark, root, extensions=extensions)
            )
            pipe = DedupPipeline(
                self.spark, DedupConfig(),
                checkpoint_dir=tempfile.mkdtemp(prefix="review_job_"),
            )
            job.result = pipe.run(docs)
            job.pipe = pipe
            job.status = "DONE"
        except Exception as exc:  # noqa: BLE001 - surfaced via the API
            job.status = "FAILED"
            job.error = f"{type(exc).__name__}: {exc}"

    # --- routes -------------------------------------------------------

    def _handle(self, method: str, path: str, query: dict, body: dict):
        if method == "POST" and path == "/api/process":
            root = body.get("root")
            if not root:
                return 400, {"error": "missing 'root'"}
            exts = tuple(body.get("extensions", ("py", "java", "go")))
            job_id = uuid.uuid4().hex[:12]
            job = _Job()
            self.jobs[job_id] = job
            threading.Thread(
                target=self._run_job, args=(job, root, exts), daemon=True
            ).start()
            return 202, {"job_id": job_id}

        if method == "GET" and path.startswith("/api/job/"):
            job = self.jobs.get(path.rsplit("/", 1)[1])
            if job is None:
                return 404, {"error": "unknown job"}
            out = {"status": job.status, "error": job.error}
            if job.pipe is not None:
                out["metrics"] = [asdict(m) for m in job.pipe.ckpt.metrics]
            return 200, out

        if method == "GET" and path in ("/api/clusters", "/api/plan"):
            job = self.jobs.get(query.get("job", [""])[0])
            if job is None:
                return 404, {"error": "unknown job"}
            if job.status != "DONE":
                return 409, {"status": job.status, "error": job.error}
            df = (job.result.clusters if path == "/api/clusters"
                  else job.result.plan)
            limit = query.get("limit", ["1000"])[0]
            return 200, {"rows": _df_page(df, limit)}

        if method == "POST" and path == "/api/plan/update":
            job = self.jobs.get(body.get("job", ""))
            if job is None:
                return 404, {"error": "unknown job"}
            if job.status != "DONE":
                return 409, {"status": job.status}
            overrides = body.get("overrides", [])
            if not overrides:
                return 400, {"error": "missing 'overrides'"}
            from dataclasses import replace

            from imageduplicatefinder_spark.operators.plan import (
                apply_plan_overrides,
            )

            ov = self.spark.createDataFrame(
                [(o.get("repo"), o.get("path"), o.get("commit"),
                  o.get("action")) for o in overrides],
                "repo string, path string, commit string, action string",
            )
            with job.lock:
                # materialize before replacing: the editor contract is
                # that the updated plan is a stable table, not a live
                # view of ov
                new_plan = apply_plan_overrides(job.result.plan, ov)
                new_plan = new_plan.localCheckpoint()
                job.result = replace(job.result, plan=new_plan)
            summary = {
                r["action"]: r["n"]
                for r in new_plan.groupBy("action")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            return 200, {"summary": summary}

        if method == "POST" and path == "/api/apply":
            job = self.jobs.get(body.get("job", ""))
            if job is None:
                return 404, {"error": "unknown job"}
            if job.status != "DONE":
                return 409, {"status": job.status}
            qdir = body.get("quarantine_dir")
            if not qdir:
                return 400, {"error": "missing 'quarantine_dir'"}
            from imageduplicatefinder_spark.plans.apply import (
                apply_plan_moves,
            )

            with job.lock:  # apply must see a settled plan, not one
                # mid-swap with a concurrent /api/plan/update
                manifest = apply_plan_moves(
                    job.result.plan, qdir, dry_run=bool(body.get("dry_run"))
                )
            return 200, {"manifest": manifest}

        return 404, {"error": f"no route {method} {path}"}

    # --- http plumbing ------------------------------------------------

    def start(self) -> int:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802 - stdlib name
                pass

            def _respond(self, method):
                parsed = urlparse(self.path)
                body = {}
                n = int(self.headers.get("Content-Length") or 0)
                if n:
                    try:
                        body = json.loads(self.rfile.read(n))
                    except json.JSONDecodeError:
                        self._send(400, {"error": "invalid JSON body"})
                        return
                    if not isinstance(body, dict):
                        self._send(400, {"error": "JSON body must be "
                                                  "an object"})
                        return
                try:
                    code, payload = server._handle(
                        method, parsed.path, parse_qs(parsed.query), body
                    )
                except _ClientError as exc:
                    code, payload = 400, {"error": str(exc)}
                except Exception as exc:  # noqa: BLE001 - API surface
                    code, payload = 500, {
                        "error": f"{type(exc).__name__}: {exc}"
                    }
                self._send(code, payload)

            def _send(self, code, payload):
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):  # noqa: N802 - stdlib name
                self._respond("GET")

            def do_POST(self):  # noqa: N802 - stdlib name
                self._respond("POST")

        self._httpd = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
