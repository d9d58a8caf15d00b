"""V5 CLI shell: drive bin/glsh.py as a real subprocess against a live
QueryServer (one-shot --eval mode and the connect-failure path)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from graph_loom_spark.graph import PropertyGraph
from graph_loom_spark.interface import CypherSession
from graph_loom_spark.serve import QueryServer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GLSH = os.path.join(REPO, "bin", "glsh.py")


@pytest.fixture()
def server(spark, tmp_path):
    sess = CypherSession(PropertyGraph.empty(spark))
    sess.execute('CREATE (p:Person {name:"Trinity"})')
    qs = QueryServer(
        sess, api_key="sekrit", timeout_s=120, ws_timeout_s=120,
        log_dir=str(tmp_path / "logs"),
    )
    httpd = qs.serve(port=0)
    yield httpd.server_address[1]
    httpd.shutdown()


def _glsh(port, *args):
    return subprocess.run(
        [sys.executable, GLSH, "--port", str(port), *args],
        capture_output=True, text=True, timeout=120,
    )


def test_glsh_eval_roundtrip(server):
    r = _glsh(server, "--api-key", "sekrit", "-e", "MATCH (p:Person) RETURN p")
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    [row] = out["rows"]
    assert row["label"] == "Person" and row["metadata"] == {"name": "Trinity"}


def test_glsh_eval_error_text(server):
    r = _glsh(server, "--api-key", "sekrit", "-e", "FROBNICATE")
    assert r.returncode == 0  # server-side errors print verbatim, exit 0
    assert r.stdout.startswith("error:") and "unrecognized" in r.stdout


def test_glsh_connect_failure_exit_code():
    # nothing listens on this port → exit 2 with a hint, like glsh.rs
    r = subprocess.run(
        [sys.executable, GLSH, "--port", "1", "-e", "x"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 2
    assert "Failed to connect" in r.stderr
