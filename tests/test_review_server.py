"""E2E test of the interactive review surface (plans/review.py) and
the side-effecting apply (plans/apply.py): the full reference workflow
process -> job status -> plan -> override -> apply, over localhost
HTTP, against a real directory with planted duplicate files
(ref: app/WebServer.java:44-239, app/Commands.java:302-354)."""

import json
import os
import time
import urllib.request

import pytest


def _req(port, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
        method=method,
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def corpus_dir(tmp_path):
    src = tmp_path / "repo"
    src.mkdir()
    body = "\n".join(f"line {i} of the shared program body" for i in range(40))
    (src / "a.py").write_text(body)
    (src / "b.py").write_text(body)                  # exact dup of a.py
    sub = src / "pkg"
    sub.mkdir()
    (sub / "a.py").write_text(body)                  # dup with SAME basename
    (src / "c.py").write_text("completely different content " * 30)
    (src / "skip.txt").write_text("not a scanned extension")
    return str(src)


def test_review_server_full_workflow(spark, corpus_dir, tmp_path):
    from imageduplicatefinder_spark.plans.review import ReviewServer

    server = ReviewServer(spark)
    port = server.start()
    try:
        code, out = _req(port, "POST", "/api/process",
                         {"root": corpus_dir, "extensions": ["py"]})
        assert code == 202
        job = out["job_id"]

        deadline = time.time() + 300
        while time.time() < deadline:
            code, st = _req(port, "GET", f"/api/job/{job}")
            assert code == 200
            if st["status"] != "RUNNING":
                break
            time.sleep(1)
        assert st["status"] == "DONE", st
        assert any(m["stage"] == "plan" for m in st["metrics"])

        code, plan = _req(port, "GET", f"/api/plan?job={job}")
        assert code == 200
        rows = plan["rows"]
        by_action = {}
        for r in rows:
            by_action.setdefault(r["action"], []).append(r)
        # 3 identical files -> 1 KEEP + 2 DELETE; c.py is a singleton
        assert len(by_action["KEEP"]) == 1
        assert len(by_action["DELETE"]) == 2

        code, cl = _req(port, "GET", f"/api/clusters?job={job}&limit=10")
        assert code == 200 and len(cl["rows"]) == 3

        # flip one DELETE to KEEP through the editor route
        flip = by_action["DELETE"][0]
        code, upd = _req(port, "POST", "/api/plan/update", {
            "job": job,
            "overrides": [{"repo": flip["repo"], "path": flip["path"],
                           "commit": flip["commit"], "action": "KEEP"}],
        })
        assert code == 200
        assert upd["summary"] == {"KEEP": 2, "DELETE": 1}

        # dry-run apply reports, then real apply moves with collision
        qdir = str(tmp_path / "quarantine")
        code, dry = _req(port, "POST", "/api/apply",
                         {"job": job, "quarantine_dir": qdir,
                          "dry_run": True})
        assert code == 200
        assert [m["status"] for m in dry["manifest"]] == ["would_move"]
        code, ap = _req(port, "POST", "/api/apply",
                        {"job": job, "quarantine_dir": qdir})
        assert code == 200
        (moved,) = ap["manifest"]
        assert moved["status"] == "moved"
        assert not os.path.exists(moved["src"])
        assert os.path.exists(moved["target"])

        # error surface
        assert _req(port, "GET", "/api/job/nope")[0] == 404
        assert _req(port, "POST", "/api/process", {})[0] == 400
        assert _req(port, "GET", "/api/plan?job=nope")[0] == 404
    finally:
        server.stop()


def test_apply_plan_moves_collision_and_missing(spark, tmp_path):
    """safeMove parity without the HTTP layer: two DELETE files with
    the same basename land as name and name_1; a vanished source is
    recorded missing, not fatal (Commands.java:336-354, 76-84)."""
    from imageduplicatefinder_spark.plans.apply import apply_plan_moves

    d = tmp_path / "files"
    (d / "x").mkdir(parents=True)
    (d / "dup.py").write_text("one")
    (d / "x" / "dup.py").write_text("two")
    plan = spark.createDataFrame(
        [("DELETE", str(d / "dup.py")),
         ("DELETE", str(d / "x" / "dup.py")),
         ("DELETE", str(d / "gone.py")),
         ("KEEP", str(d / "x"))],
        "action string, path string",
    )
    qdir = str(tmp_path / "q")
    manifest = apply_plan_moves(plan, qdir)
    statuses = {m["src"]: m for m in manifest}
    assert len(manifest) == 3  # KEEP row untouched
    targets = sorted(
        os.path.basename(m["target"]) for m in manifest
        if m["status"] == "moved"
    )
    assert targets == ["dup.py", "dup_1.py"]
    assert statuses[str(d / "gone.py")]["status"] == "missing"
    assert sorted(os.listdir(qdir)) == ["dup.py", "dup_1.py"]


def test_review_server_failed_job_surfaces_error(spark):
    """A job over a nonexistent root must end FAILED with the error
    string in the status payload — never a hung RUNNING or a server
    crash (the reference's JobStatus error field,
    WebServer.java:29-36)."""
    from imageduplicatefinder_spark.plans.review import ReviewServer

    server = ReviewServer(spark)
    port = server.start()
    try:
        code, out = _req(port, "POST", "/api/process",
                         {"root": "/nonexistent/dir/xyz"})
        assert code == 202
        job = out["job_id"]
        deadline = time.time() + 120
        while time.time() < deadline:
            code, st = _req(port, "GET", f"/api/job/{job}")
            if st["status"] != "RUNNING":
                break
            time.sleep(0.5)
        assert st["status"] == "FAILED"
        assert st["error"]
        # data routes answer 409 with the failure, not 500
        code, body = _req(port, "GET", f"/api/plan?job={job}")
        assert code == 409 and body["error"]
    finally:
        server.stop()


def test_apply_dry_run_predicts_real_targets(spark, tmp_path):
    """Review finding: dry-run must reserve targets in-run so its
    manifest names match what the real apply produces on basename
    collisions."""
    from imageduplicatefinder_spark.plans.apply import apply_plan_moves

    d = tmp_path / "files"
    (d / "x").mkdir(parents=True)
    (d / "dup.py").write_text("one")
    (d / "x" / "dup.py").write_text("two")
    plan = spark.createDataFrame(
        [("DELETE", str(d / "dup.py")),
         ("DELETE", str(d / "x" / "dup.py"))],
        "action string, path string",
    )
    qdir = str(tmp_path / "q")
    dry = apply_plan_moves(plan, qdir, dry_run=True)
    real = apply_plan_moves(plan, qdir)
    assert [m["target"] for m in dry] == [m["target"] for m in real]
    assert sorted(os.path.basename(m["target"]) for m in dry) == [
        "dup.py", "dup_1.py"
    ]


def test_review_server_client_errors_are_400(spark, corpus_dir):
    """Malformed client input (non-numeric limit, non-object JSON body)
    must answer 400, not 500."""
    from imageduplicatefinder_spark.plans.review import ReviewServer

    server = ReviewServer(spark)
    port = server.start()
    try:
        code, out = _req(port, "POST", "/api/process",
                         {"root": corpus_dir, "extensions": ["py"]})
        job = out["job_id"]
        deadline = time.time() + 300
        while time.time() < deadline:
            _, st = _req(port, "GET", f"/api/job/{job}")
            if st["status"] != "RUNNING":
                break
            time.sleep(1)
        assert st["status"] == "DONE"
        code, body = _req(port, "GET", f"/api/plan?job={job}&limit=abc")
        assert code == 400 and "limit" in body["error"]
        # valid-JSON non-object body
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/process", data=b"[1, 2]",
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.stop()
