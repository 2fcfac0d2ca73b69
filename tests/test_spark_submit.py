"""Real ``spark-submit --py-files`` packaging run (north rule).

The acceptance shape is "the whole job ships via spark-submit
--py-files" (reference deploy: SURVEY.md §7.9). Every other test
imports ``siren_spark`` from the repo working tree; this one proves the
zip is self-contained: it zips the package, copies the job script OUT
of the repo, and launches real ``spark-submit`` from a neutral cwd with
no repo on ``PYTHONPATH`` — the driver *and* the executor Python
workers can resolve ``siren_spark`` only from the ``--py-files``
archive. Asserts the crawl completes and its result count matches the
single-process oracle simulator on the same site.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

from siren_spark.testing.oracle import simulate_crawl
from siren_spark.testing.sitegen import (
    WINDOW_END, WINDOW_START, SiteSpec, build_site,
)
from tests.conftest import pages_df, seeds_df

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
SPEC = SiteSpec(mirror_seed_range=(10, 12))
BUDGET = 7


def _zip_package(dst: Path) -> None:
    with zipfile.ZipFile(dst, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO / "siren_spark").rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            zf.write(p, p.relative_to(REPO))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_py_files_packaging(spark, tmp_path):
    site = build_site(SPEC)
    sim = simulate_crawl(site.pages, site.seeds, budget_per_host=BUDGET,
                         window_start=WINDOW_START, window_end=WINDOW_END,
                         keywords=SPEC.keywords)

    pages_path = tmp_path / "pages"
    seeds_path = tmp_path / "seeds"
    pages_df(spark, site.pages).write.parquet(str(pages_path))
    seeds_df(spark, site.seeds).write.parquet(str(seeds_path))

    pkg_zip = tmp_path / "siren_spark.zip"
    _zip_package(pkg_zip)
    # the job script leaves the repo: its `from siren_spark...` imports
    # must resolve from the zip or the run fails
    job = tmp_path / "submit_job.py"
    shutil.copy(REPO / "siren_spark" / "jobs" / "crawl.py", job)

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    env["SPARK_GRAFT_MASTER"] = "local[2]"
    env["SPARK_DRIVER_MEM"] = "4g"
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", "--driver-memory", "4g",
         "--py-files", str(pkg_zip), str(job),
         "--pages", str(pages_path), "--seeds", str(seeds_path),
         "--checkpoint", str(tmp_path / "ckpt"),
         "--budget", str(BUDGET),
         "--start", WINDOW_START.strftime("%Y-%m-%d"),
         "--end", WINDOW_END.strftime("%Y-%m-%d"),
         "--bloom-bits", str(1 << 16), "--bloom-buckets", "4",
         "--salt-buckets", "4",
         "--keywords", *SPEC.keywords],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    final = [ln for ln in proc.stdout.splitlines()
             if ln.startswith("crawl complete:")]
    assert final, proc.stdout[-2000:]
    got = int(final[0].rsplit("results=", 1)[1])
    assert got == len(sim.results)
