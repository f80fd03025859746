"""The north_rule deployment shape, end-to-end: package the engine with
``tools/build_pyfiles.py``, deploy it via ``spark-submit --py-files``
(the rule's literal command), kill-and-resume across two separate driver
JVMs, and check the final crawl trace / per-host ordering / seen set
against the reference-semantics simulator oracle.

``PYTHONPATH`` is emptied and the driver cwd moved off the repo, so the
``webcrawler_spark`` import genuinely resolves from the shipped zip —
the same artifact a real cluster's executors would unpack.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from webcrawler_spark.sources.fixtures import SEED_URLS, make_webgraph
from webcrawler_spark.sources.simulator import simulate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# 12 hosts / base 10 exhausts in ~15 politeness rounds with 32 visits and
# one seen-but-never-visited URL (richest small oracle per round spent);
# the 300-round cap means "run to frontier exhaustion" on both sides
HOSTS, BASE, ROUNDS = 12, 10, 300
KILL_AT = 7  # rounds before the simulated kill


def _find_spark_submit() -> str | None:
    p = shutil.which("spark-submit")
    if p:
        return p
    for c in (
        os.path.join(os.environ.get("SPARK_HOME", ""), "bin", "spark-submit"),
        "/opt/spark/bin/spark-submit",
    ):
        if c and os.path.isfile(c):
            return c
    return None


@pytest.mark.slow
def test_spark_submit_pyfiles_kill_resume(tmp_path):
    submit = _find_spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on this machine")

    zip_path = str(tmp_path / "webcrawler_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "build_pyfiles.py"), zip_path],
        check=True,
    )
    store = str(tmp_path / "store")
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # the package must come from --py-files alone
    env.pop("SPARK_GRAFT_CPUS", None)

    def run(rounds: int, resume: bool, cores: int) -> dict:
        # the resume run uses a DIFFERENT topology (cores + shuffle
        # partitions) than the killed run: snapshot state must be
        # topology-independent, as a resized real cluster requires
        cmd = [
            submit, "--master", f"local[{cores}]", "--driver-memory", "4g",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_crawl.py"),
            "--store", store, "--rounds", str(rounds),
            "--hosts", str(HOSTS), "--pages-base", str(BASE),
            "--shuffle-partitions", str(cores),
        ]
        if resume:
            # the resumed driver also compacts the store's delta dirs
            # first — resume-from-compacted through the REAL binary
            cmd += ["--resume", "--compact"]
        r = subprocess.run(cmd, env=env, cwd=str(tmp_path),
                           capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
        stats_lines = [ln for ln in r.stdout.splitlines()
                       if ln.startswith("{") and '"visited"' in ln]
        assert stats_lines, (r.stdout[-2000:], r.stderr[-2000:])
        return json.loads(stats_lines[-1])

    s1 = run(KILL_AT, resume=False, cores=8)  # "kill" mid-crawl
    assert s1["visited"] > 0 and s1["master"] == "local[8]"
    # resume from the snapshot store on a resized "cluster", finish
    s2 = run(ROUNDS, resume=True, cores=4)
    assert s2["resumed"] and s2["trace_rows"] >= s1["visited"]
    assert s2["compacted"], "the killed run committed >1 delta per table"

    # oracle: the single-threaded reference-semantics simulator on the
    # SAME deterministic fixture graph, run clean (no kill) to completion
    wg, robots = make_webgraph(n_hosts=HOSTS, pages_per_host_base=BASE)
    sim = simulate(wg, robots, list(SEED_URLS), max_rounds=ROUNDS)

    trace = pq.read_table(f"{store}/export/trace").to_pylist()
    assert {(r["time_ms"], r["url"]) for r in trace} == {
        (t, u) for (t, s, u, h) in sim.trace
    }
    eo, so = defaultdict(list), defaultdict(list)
    for r in sorted(trace, key=lambda r: (r["time_ms"], r["seq"])):
        eo[r["host"]].append(r["url"])
    for t, s, u, h in sorted(sim.trace):
        so[h].append(u)
    assert dict(eo) == dict(so)

    seen = {r["url"] for r in pq.read_table(f"{store}/export/seen").to_pylist()}
    assert seen == sim.seen
