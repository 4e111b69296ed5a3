"""CLI entry points (crawl / match / report) — the reference's EP1–EP3
user surface."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from webscraper_spark import cli
from webscraper_spark.synth import gen_corpus, write_corpus


@pytest.fixture(scope="module")
def demo(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_demo")
    write_corpus(gen_corpus(n_urls=400, n_hosts=8, seed=21), str(d / "corpus"))
    pd.DataFrame({"Company Name": [f"Acme {i}" for i in range(0, 30, 2)]}).to_csv(
        d / "crm.csv", index=False
    )
    pd.DataFrame(
        {"Organization Name": [f"ACME {i}!!" for i in range(0, 30, 3)]
         + [f"Newco {i}" for i in range(4)]}
    ).to_csv(d / "incoming.csv", index=False)
    return d


def test_cli_crawl_and_report(spark, demo, capsys):
    store = str(demo / "store")
    rc = cli.main([
        "--cores", "8", "crawl",
        "--pages", str(demo / "corpus" / "pages.parquet"),
        "--seeds", str(demo / "corpus" / "seeds.parquet"),
        "--seeds-format", "parquet",
        "--hosts", str(demo / "corpus" / "hosts.parquet"),
        "--store", store, "--rounds", "2", "--budget", "3",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [l["round"] for l in lines] == [1, 2]
    assert all(l["scheduled"] >= l["fetched"] for l in lines)

    rc = cli.main(["--cores", "8", "report", "--store", store])
    assert rc == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert out[-1]["committed_rounds"] == [0, 1, 2]
    # report totals equal the crawl lineage
    per_round = {o["round"]: o for o in out[:-1]}
    for l in lines:
        assert per_round[l["round"]]["scheduled"] == l["scheduled"]


def test_cli_match_partition(spark, demo, capsys):
    rc = cli.main([
        "--cores", "8", "match",
        "--incoming", str(demo / "incoming.csv"),
        "--crm", str(demo / "crm.csv"),
        "--key", "Organization Name", "--crm-key", "Company Name",
        "--out-matched", str(demo / "m"), "--out-unmatched", str(demo / "u"),
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # incoming = multiples of 3 in [0,30) + 4 Newcos; crm = evens in [0,30)
    # → matched = multiples of 6 (5 names), unmatched = 5 odd-multiples + 4
    assert res == {"matched": 5, "unmatched": 9}


def test_cli_compact(spark, demo, capsys):
    store = str(demo / "store2")
    rc = cli.main([
        "--cores", "8", "crawl",
        "--pages", str(demo / "corpus" / "pages.parquet"),
        "--seeds", str(demo / "corpus" / "seeds.parquet"),
        "--seeds-format", "parquet",
        "--hosts", str(demo / "corpus" / "hosts.parquet"),
        "--store", store, "--rounds", "2", "--budget", "3",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = cli.main(["--cores", "8", "compact", "--store", store,
                   "--tables", "seen,fetched", "--target-partitions", "1"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {l["table"]: l["compacted_through"] for l in lines} == {
        "seen": 2, "fetched": 2,
    }
    # report still works over the compacted store
    rc = cli.main(["--cores", "8", "report", "--store", store])
    assert rc == 0


def test_cli_crawl_drop_dir_batch_and_streaming_equivalent(
    spark, tmp_path_factory, capsys
):
    """VERDICT r04 #4: both drop-dir shapes are drivable from the same
    entry point — `crawl --drop-dir` (ledger-committed batch) and
    `crawl --drop-dir --drop-mode streaming` (checkpointed stream →
    pages_stream sink → the same round job) — and they produce identical
    fetched tables across an incremental two-batch drop sequence."""
    import os

    from webscraper_spark.sources.tables import TableStore
    from webscraper_spark.sources.warc import build_warc
    from webscraper_spark.synth import gen_corpus, to_spark, write_corpus

    corpus = gen_corpus(n_urls=240, n_hosts=6, seed=13)
    d = tmp_path_factory.mktemp("cli_drop")
    write_corpus(corpus, str(d / "corpus"))
    pages = corpus["pages"].to_dict("records")
    seed_urls = set(corpus["seeds"]["url"])
    in_a = [r for r in pages if r["url"] in seed_urls]
    rest = [r for r in pages if r["url"] not in seed_urls]
    in_a += rest[: len(rest) // 2]
    in_b = rest[len(rest) // 2:]
    drop = str(d / "drop")
    os.makedirs(drop)

    def write_batch(name, rows):
        recs = [
            {"url": r["url"], "warc_ts": r["warc_ts"], "html": r["html"] or b""}
            for r in rows
        ]
        with open(os.path.join(drop, name), "wb") as f:
            f.write(build_warc(recs))

    def crawl(store, rounds, *extra):
        rc = cli.main([
            "--cores", "8", "crawl", "--drop-dir", drop,
            "--seeds", str(d / "corpus" / "seeds.parquet"),
            "--seeds-format", "parquet",
            "--hosts", str(d / "corpus" / "hosts.parquet"),
            "--store", store, "--rounds", str(rounds), "--budget", "3",
            *extra,
        ])
        assert rc == 0
        return [
            json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
        ]

    st_batch = str(d / "store_batch")
    st_stream = str(d / "store_stream")

    write_batch("batch_a.warc", in_a)
    lin_b1 = crawl(st_batch, 1)
    assert lin_b1[0]["n_ingested_files"] == 1
    lin_s1 = crawl(st_stream, 1, "--drop-mode", "streaming")
    assert lin_s1[0]["fetched"] == lin_b1[0]["fetched"]

    write_batch("batch_b.warc", in_b)
    crawl(st_batch, 2)
    crawl(st_stream, 2, "--drop-mode", "streaming")

    # the streaming sink drained each archive exactly once (checkpoint):
    # rows in pages_stream == total pages across both archives
    n_sink = spark.read.parquet(os.path.join(st_stream, "pages_stream")).count()
    from webscraper_spark.sources.warc import pages_from_warc_files

    n_want = pages_from_warc_files(
        spark.read.format("binaryFile").load(drop)
    ).count()
    assert n_sink == n_want

    def orders(store_dir):
        store = TableStore(spark, store_dir)
        return sorted(
            (r["round"], r["host"], r["host_seq"], r["url"], r["fetch_status"])
            for r in store.read_delta("fetched").collect()
        )

    assert orders(st_batch) == orders(st_stream)

    # exactly one of --pages / --drop-dir is required
    assert cli.main([
        "crawl", "--seeds", str(d / "corpus" / "seeds.parquet"),
        "--seeds-format", "parquet",
        "--hosts", str(d / "corpus" / "hosts.parquet"),
        "--store", str(d / "store_none"),
    ]) == 2
    capsys.readouterr()


def test_entry_contract_from_foreign_cwd(tmp_path):
    """The driver may import __spark_entry__ from any CWD; executors must
    still import the engine (self-shipped via addPyFile, the sc-level
    twin of spark-submit --py-files)."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import __spark_entry__ as m\n"
        "from webscraper_spark.session import get_spark\n"
        "spark = get_spark(cores=4)\n"
        "print('ROWS', m.entry(spark).count())\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=str(tmp_path),
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ROWS 24" in out.stdout


def test_cli_curate(spark, tmp_path, capsys):
    import shutil

    docs_dir = str(tmp_path / "docs.parquet")
    # copy the driver's fixed documents table as input
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .write.mode("overwrite").parquet(docs_dir)
    out = str(tmp_path / "curated")
    rc = cli.main([
        "--cores", "8", "curate",
        "--docs", docs_dir, "--out", out,
        "--min-quality", "0.75", "--ivf-centroids", "4",
        "--ivf-sample", "0.8",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs_out"] > 0
    assert summary["docs_out"] <= summary["docs_in"]
    clean = spark.read.parquet(f"{out}/clean_docs.parquet")
    emb = spark.read.parquet(f"{out}/embeddings.parquet")
    assert clean.count() == summary["docs_out"]
    assert emb.count() == summary["docs_out"]
    row = emb.first()
    assert len(row["embedding"]) == 64
    assert row["centroid_id"] is not None
    # every doc passed the gate it claims
    assert clean.filter("quality_score < 0.75 OR lang_pred <> 'en'").count() == 0
    shutil.rmtree(out, ignore_errors=True)


def test_cli_curate_decontaminate_and_redact(spark, tmp_path, capsys):
    """curate --benchmark drops leaky docs; --redact-pii scrubs the
    output text. Docs are synthesized so the expectation is exact:
    every 13-token window contains a per-doc unique token (u{i} at
    positions 0 and 12), so docs share grams ONLY with their own
    benchmark copy; --min-dup-docs 9999 neutralizes passage cleaning
    so cleaned text == raw text and benchmark membership alone decides
    the drop."""
    import pandas as pd

    rows = [
        (i,
         f"u{i} the quick brown fox jumps over the lazy dog near "
         f"barn u{i} contact x@y.example now and more plain words")
        for i in range(30)
    ]
    docs_dir = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(docs_dir)
    bench_dir = str(tmp_path / "bench.parquet")
    spark.read.parquet(docs_dir).filter("doc_id % 3 = 0") \
        .write.mode("overwrite").parquet(bench_dir)
    out = str(tmp_path / "curated2")
    rc = cli.main([
        "--cores", "8", "curate",
        "--docs", docs_dir, "--out", out,
        "--min-quality", "0.0", "--min-dup-docs", "9999",
        "--benchmark", bench_dir, "--redact-pii",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["decontaminated"] == 10  # exactly the bench members
    assert summary["pii_redacted"] is True
    clean = spark.read.parquet(f"{out}/clean_docs.parquet")
    assert clean.count() == 20
    assert clean.filter("doc_id % 3 = 0").count() == 0  # leaks gone
    # no email survives; the placeholder proves redaction ran
    assert clean.filter("text LIKE '%x@y.example%'").count() == 0
    assert clean.filter("text LIKE '%<EMAIL>%'").count() == 20
    # n_tokens describes the SHIPPED (redacted) text
    bad = clean.filter("n_tokens <> size(split(trim(text), '\\\\s+'))")
    assert bad.count() == 0
