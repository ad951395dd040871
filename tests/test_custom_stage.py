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


class ThumbnailWriter(Stage):
    """Corpus writer override (pegasus's :writer / default-writer-fn):
    strip payload bytes, stamp the caption — schema-preserving value
    transform, rows untouched."""

    name = "thumbnail-writer"

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn("bytes", F.lit(None).cast("binary")).withColumn(
            "caption", F.concat(F.lit("thumb:"), F.coalesce("caption", F.lit("")))
        )


def test_writer_plug_point_transforms_corpus(spark):
    tmp = tempfile.mkdtemp()
    try:
        params = WebParams(seed=23, n_pages=120, n_hosts=6, n_seeds=2)
        web = generate_web(params)
        write_web(web, f"{tmp}/web")
        cfg = CrawlConfig(web_dir=f"{tmp}/web", job_dir=f"{tmp}/job",
                          seen_parts=4, corpus_size=30, writer=ThumbnailWriter())
        res = crawl(spark, cfg)
        assert res.visited == 30
        cat = ManifestCatalog(spark, f"{tmp}/job")
        corpus = cat.read("corpus")
        assert corpus.count() == 30
        assert corpus.filter(F.col("bytes").isNotNull()).count() == 0
        assert corpus.filter(~F.col("caption").startswith("thumb:")).count() == 0
        # visited bookkeeping intact: resume continues cleanly
        cfg2 = CrawlConfig(web_dir=f"{tmp}/web", job_dir=f"{tmp}/job",
                           seen_parts=4, corpus_size=30, writer=ThumbnailWriter())
        assert crawl(spark, cfg2, resume=True).stop_reason == "corpus_size"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_fetch_shuffle_join_path_matches_broadcast(spark):
    """Force the size-gated fetch past its broadcast ceiling
    (fetch_broadcast_max=0 → co-partitioned shuffle join) and require the
    exact same corpus as the broadcast path."""
    tmp = tempfile.mkdtemp()
    try:
        params = WebParams(seed=31, n_pages=150, n_hosts=6, n_seeds=3)
        web = generate_web(params)
        write_web(web, f"{tmp}/web")
        outs = []
        for name, bmax in (("bc", 2_000_000), ("sh", 0)):
            cfg = CrawlConfig(web_dir=f"{tmp}/web", job_dir=f"{tmp}/{name}",
                              seen_parts=4, corpus_size=40,
                              fetch_broadcast_max=bmax)
            res = crawl(spark, cfg)
            assert res.visited == 40
            cat = ManifestCatalog(spark, f"{tmp}/{name}")
            outs.append({
                tuple(r) for r in cat.read("corpus")
                .select("url_hash", "fetch_round", "fetch_vt", "valid").collect()
            })
        assert outs[0] == outs[1]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_update_state_plug_point(spark):
    """pegasus's :update-state (default-update-state-fn override): a user
    callback sees every round's stats before the checkpoint; mutations
    persist into the checkpoint's stats blob."""
    import tempfile as _tf

    from pegasus_spark.tables import CheckpointStore

    tmp = tempfile.mkdtemp()
    try:
        params = WebParams(seed=29, n_pages=120, n_hosts=6, n_seeds=2)
        web = generate_web(params)
        write_web(web, f"{tmp}/web")
        rounds_seen = []

        def upd(st):
            rounds_seen.append(st["round"])
            st["custom_note"] = f"r{st['round']}"

        cfg = CrawlConfig(web_dir=f"{tmp}/web", job_dir=f"{tmp}/job",
                          seen_parts=4, corpus_size=30, update_state=upd)
        res = crawl(spark, cfg)
        assert rounds_seen == list(range(res.rounds))
        latest = CheckpointStore(f"{tmp}/job").latest()
        assert latest["stats"]["custom_note"] == f"r{latest['round']}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


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
                          seen_parts=4, pre_enqueue=stage,
                          round_width_vt=48_000)
        res = crawl(spark, cfg)
        assert res.stop_reason == "exhausted"
        cat = ManifestCatalog(spark, f"{tmp}/job")
        hosts = {r["host"] for r in cat.read("corpus").select("host").collect()}
        assert hosts <= seed_hosts  # never left the seed hosts
        assert res.visited > len(web["seeds"])  # but did crawl beyond seeds
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
