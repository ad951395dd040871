"""O15 component protocol: user-swappable stages (the reference's
``defprocessor`` / config-map plug points — pegasus's README demos a
same-host extractor; this is its engine equivalent)."""

import shutil
import tempfile

from pyspark.sql import DataFrame, functions as F

from pegasus_spark.config import CrawlConfig, Stage
from pegasus_spark.crawl import crawl
from pegasus_spark.fixtures import WebParams, generate_web, write_web
from pegasus_spark.tables import ManifestCatalog


class SameHostOnly(Stage):
    """Keep only candidate links whose host matches a seed host
    (pegasus README's enlive same-host extractor, DataFrame-style)."""

    name = "same-host-extractor"

    def setup(self, spark, cfg):
        self.spark = spark

    def set_hosts(self, hosts):
        self.hosts = list(hosts)

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(F.col("host").isin(self.hosts))


def test_same_host_extractor_restricts_crawl(spark):
    tmp = tempfile.mkdtemp()
    try:
        params = WebParams(seed=17, n_pages=200, n_hosts=8, fanout=3.0, n_seeds=2)
        web = generate_web(params)
        write_web(web, f"{tmp}/web")
        seed_hosts = set()
        for u in web["seeds"]["url"]:
            seed_hosts.add(u.split("://", 1)[1].split("/", 1)[0].split(":")[0].lower())

        stage = SameHostOnly()
        stage.set_hosts(seed_hosts)
        cfg = CrawlConfig(web_dir=f"{tmp}/web", job_dir=f"{tmp}/job",
                          seen_parts=4, pre_enqueue=stage)
        res = crawl(spark, cfg)
        assert res.stop_reason == "exhausted"
        cat = ManifestCatalog(spark, f"{tmp}/job")
        hosts = {r["host"] for r in cat.read("corpus").select("host").collect()}
        assert hosts <= seed_hosts  # never left the seed hosts
        assert res.visited > len(web["seeds"])  # but did crawl beyond seeds
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
