"""Distributed ingest: the executor-parallel download path against a
live local HTTP fixture."""

from __future__ import annotations

import http.server
import io
import pathlib
import shutil
import threading
import zipfile

import pytest

from market_etl_spark.ingest.distributed import build_work_list, distributed_download

SCRATCH = pathlib.Path(__file__).resolve().parent.parent / ".scratch" / "dist_ingest"


def _zip_bytes(payload: bytes) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("inner.csv", payload)
    return buf.getvalue()


@pytest.fixture(scope="module")
def http_base():
    class H(http.server.BaseHTTPRequestHandler):
        bodies: dict[str, bytes] = {}

        def do_GET(self):
            body = type(self).bodies.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", H
    srv.shutdown()


def test_distributed_download(spark, http_base):
    base, handler = http_base
    lake = SCRATCH / "lake"
    shutil.rmtree(lake, ignore_errors=True)
    work = build_work_list(["AAA", "BBB", "CCC"], "2024-01", "2024-03")
    assert len(work) == 9
    # serve 7 of the 9; two 404
    for key, _ in work[:7]:
        handler.bodies["/" + key] = _zip_bytes(b"x,y\n" * 100)

    out = distributed_download(
        spark, base, str(lake), ["AAA", "BBB", "CCC"], "2024-01", "2024-03",
        partitions=4, backoff=0.01,
    )
    by_status: dict[str, int] = {}
    for r in out.collect():
        by_status[r.status] = by_status.get(r.status, 0) + 1
    assert by_status == {"downloaded": 7, "skipped_404": 2}
    assert len(list(lake.rglob("*.zip"))) == 7

    # idempotent distributed re-run: everything skips, nothing re-fetched
    out2 = distributed_download(
        spark, base, str(lake), ["AAA", "BBB", "CCC"], "2024-01", "2024-03",
        partitions=4, backoff=0.01,
    )
    statuses = {r.status for r in out2.collect() if r.status != "skipped_404"}
    assert statuses == {"skipped_exists"}


def test_python_datasource_archive_read(spark, http_base):
    """The Spark 4 Python DataSource form of the same ingest: work list
    = input partitions, executors fetch idempotently, result is an
    audit DataFrame."""
    from market_etl_spark.ingest.datasource import BinanceArchiveDataSource

    base, handler = http_base
    lake = SCRATCH / "lake_ds"
    shutil.rmtree(lake, ignore_errors=True)
    work = build_work_list(["DDD", "EEE"], "2024-01", "2024-02")
    for key, _ in work[:3]:
        handler.bodies["/" + key] = _zip_bytes(b"a,b\n" * 50)

    spark.dataSource.register(BinanceArchiveDataSource)
    reader = (
        spark.read.format("binance_archive")
        .option("base_url", base)
        .option("dest_root", str(lake))
        .option("symbols", "DDD,EEE")
        .option("start", "2024-01")
        .option("end", "2024-02")
        .option("backoff", "0.01")
    )
    rows = reader.load().collect()
    by_status: dict[str, int] = {}
    for r in rows:
        by_status[r.status] = by_status.get(r.status, 0) + 1
    assert by_status == {"downloaded": 3, "skipped_404": 1}
    assert len(list(lake.rglob("*.zip"))) == 3
    assert all(r.bytes > 0 for r in rows if r.status == "downloaded")

    # declarative re-read: idempotent (filesystem is the checkpoint)
    rows2 = reader.load().collect()
    assert {r.status for r in rows2} == {"skipped_exists", "skipped_404"}


def test_python_datasource_streaming_tail(spark, http_base):
    """The streaming form: the work list is consumed batch_size at a
    time with the offset checkpointed — each availableNow start drains
    one micro-batch and resumes where the last committed."""
    import tempfile

    from market_etl_spark.ingest.datasource import BinanceArchiveDataSource

    base, handler = http_base
    lake = SCRATCH / "lake_stream"
    shutil.rmtree(lake, ignore_errors=True)
    work = build_work_list(["FFF", "GGG"], "2024-01", "2024-02")  # 4 archives
    for key, _ in work[:3]:
        handler.bodies["/" + key] = _zip_bytes(b"s,t\n" * 20)

    spark.dataSource.register(BinanceArchiveDataSource)
    ckpt = tempfile.mkdtemp()
    out_dir = tempfile.mkdtemp()

    def drain_one_batch():
        q = (
            spark.readStream.format("binance_archive")
            .option("base_url", base)
            .option("dest_root", str(lake))
            .option("symbols", "FFF,GGG")
            .option("start", "2024-01")
            .option("end", "2024-02")
            .option("backoff", "0.01")
            .option("batch_size", "2")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain_one_batch()  # items 0-1
    assert spark.read.parquet(out_dir).count() == 2
    drain_one_batch()  # items 2-3 (offset resumed from checkpoint)
    rows = spark.read.parquet(out_dir).collect()
    statuses = sorted(r.status for r in rows)
    assert len(rows) == 4
    assert statuses.count("downloaded") == 3
    assert statuses.count("skipped_404") == 1
    assert len(list(lake.rglob("*.zip"))) == 3
    drain_one_batch()  # work list exhausted: no new rows
    assert spark.read.parquet(out_dir).count() == 4
