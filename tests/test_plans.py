"""Physical-plan assertions: pushdown, pruning, join strategy.

Guards the properties that matter at 100 TB: predicate pushdown reaches
the parquet scan, scans are column-pruned, small-side joins broadcast,
and the crawl's fetch join never shuffles the pages side.
"""

import contextlib
import io
import re

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_date_filter_pushed_to_scan(spark):
    p = _plan(entrymod.queries()["p1_date_window_filter"](spark, SF))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("o_orderdate" in f for f in pushed), p


def test_scan_column_pruned(spark):
    p = _plan(entrymod.queries()["q1_pricing_summary"](spark, SF))
    schema = re.search(r"ReadSchema: struct<([^>]*)>", p).group(1)
    cols = {c.split(":")[0] for c in schema.split(",")}
    # 6 of lineitem's 11 columns — unused columns never leave the scan
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert {"l_quantity", "l_returnflag", "l_shipdate"} <= cols


def test_small_dim_join_broadcasts(spark):
    p = _plan(entrymod.queries()["j1_enrichment_join"](spark, SF))
    assert "BroadcastHashJoin" in p


def test_crawl_fetch_join_broadcasts_and_pages_never_shuffle(spark):
    from pyspark.sql import functions as F
    from siren_spark.crawl import CrawlConfig, prepare_pages
    from siren_spark.testing.sitegen import SiteSpec, build_site
    from tests.conftest import pages_df
    site = build_site(SiteSpec(mirror_seed_range=(10, 12)))
    pages_p = prepare_pages(pages_df(spark, site.pages), CrawlConfig())
    sched = spark.createDataFrame(
        [(p["url"], p["url"], None) for p in site.pages[:5]],
        "url string, url_canon string, meta map<string,string>")
    joined = pages_p.join(F.broadcast(sched), "url_canon", "inner")
    p = _plan(joined)
    assert "BroadcastHashJoin" in p
    # the pages scan side must reach the join without an Exchange
    # (no shuffle of html at any scale)
    scan_side = p.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in scan_side, p
