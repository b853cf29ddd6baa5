"""Packaged-artifact gate (round-4; VERDICT r3 Missing #2).

The north rule's deployment mode is ``spark-submit --py-files
dist/web_crawler_spark.zip``: executors and the driver import the
package from the zip alone.  A module missing from the packaging script
would surface only at submit time — this gate rebuilds the zip and runs
the driver-contract checker in a FRESH interpreter with the zip
shadowing the source tree (``SPARK_GRAFT_FROM_ZIP=1`` asserts the
package actually resolved from the zip), over the entry with the widest
import surface (the end-to-end crawl demo: engine, store, oracle,
simulators, urls, dedup, corpus)."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
# driver-generated fixture dir; overridable so the gate SKIPS (not
# errors) on a machine without the fixture (round-4 ADVICE)
SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL_DIR", "/root/testdata/sf0.001")


def test_driver_contract_passes_from_zip_alone():
    if not Path(SF_SMALL).is_dir():
        pytest.skip(f"testdata fixture {SF_SMALL} not present")
    build = subprocess.run(
        ["bash", str(ROOT / "scripts" / "build_pyfiles.sh")],
        capture_output=True, text=True, timeout=120,
    )
    assert build.returncode == 0, build.stderr
    env = dict(os.environ, SPARK_GRAFT_FROM_ZIP="1")
    proc = subprocess.run(
        [
            sys.executable, "-u", str(ROOT / "scripts" / "check_entry.py"),
            SF_SMALL, "crawl_bfs_demo",
        ],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(ROOT),
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "package imported from" in out and "web_crawler_spark.zip" in out
    assert "ALL OK" in out
