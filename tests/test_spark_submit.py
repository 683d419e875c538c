"""The north rule's literal invocation shape: ``spark-submit --py-files``
on a multi-executor (local-cluster) master, driver AND executors resolving
the library from the zip — run from OUTSIDE the repo so nothing leaks in
via cwd.

Opt-in (KNX_SUBMIT_TESTS=1): the run spawns 3 JVMs and takes ~70 s, and it
must never overlap another Spark workload on this host (bench corruption —
see BENCH/BASELINE.md). The on-record execution lives in
BENCH/BASELINE.md ("North-rule invocation shape"); this test keeps the
recipe executable.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("KNX_SUBMIT_TESTS") != "1"
    or shutil.which("spark-submit") is None,
    reason="opt-in: KNX_SUBMIT_TESTS=1 + spark-submit on PATH",
)


def _submit(entry: str, zip_path: str, workdir: str, cwd: str) -> dict:
    cmd = [
        "spark-submit",
        "--master",
        "local-cluster[2,2,2048]",
        "--py-files",
        zip_path,
        entry,
        "--generate",
        "500",
        "--workdir",
        workdir,
    ]
    out = subprocess.run(
        cmd, cwd=cwd, capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # the CLI prints exactly one JSON line on stdout (after spark noise)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_submit_and_resume_via_py_files(tmp_path):
    zip_path = str(tmp_path / "knx.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        pkg = os.path.join(REPO, "knowledge_nexus_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    entry = str(tmp_path / "entry.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), entry)
    workdir = str(tmp_path / "run")

    cold = _submit(entry, zip_path, workdir, cwd=str(tmp_path))
    assert cold["nodes"] > 0 and cold["edges"] > 0
    assert all("row_count" in s for s in cold["stages"].values())

    warm = _submit(entry, zip_path, workdir, cwd=str(tmp_path))
    assert all(s.get("resumed") for s in warm["stages"].values())
    assert (warm["nodes"], warm["edges"]) == (cold["nodes"], cold["edges"])
