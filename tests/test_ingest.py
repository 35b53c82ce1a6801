"""Ingest utility tests: local HTTP fixture (no external network),
retry/backoff, 404 skip, idempotency, streaming unzip, zone rewrite."""

from __future__ import annotations

import http.server
import io
import pathlib
import shutil
import threading
import zipfile

import pytest

from market_etl_spark.ingest import (
    ArchiveDownloader,
    StreamingUnzipper,
    build_archive_path,
    generate_months,
    zone_rewrite,
)

SCRATCH = pathlib.Path(__file__).resolve().parent.parent / ".scratch" / "ingest"


class _Handler(http.server.BaseHTTPRequestHandler):
    """Serves canned bodies; fails the first N requests per path to
    exercise retry."""

    bodies: dict[str, bytes] = {}
    fail_first: dict[str, int] = {}
    hits: dict[str, int] = {}

    def do_GET(self):
        cls = type(self)
        cls.hits[self.path] = cls.hits.get(self.path, 0) + 1
        if cls.fail_first.get(self.path, 0) >= cls.hits[self.path]:
            self.send_response(503)
            self.end_headers()
            return
        body = cls.bodies.get(self.path)
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


@pytest.fixture(scope="module")
def http_fixture():
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def _zip_bytes(name: str, payload: bytes) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(name, payload)
    return buf.getvalue()


def test_generate_months():
    assert generate_months("2025-07", "2025-09") == [(2025, 7), (2025, 8), (2025, 9)]
    assert generate_months("2024-11", "2025-02") == [
        (2024, 11), (2024, 12), (2025, 1), (2025, 2)
    ]
    with pytest.raises(ValueError):
        generate_months("2025-09", "2025-07")


def test_build_archive_path_zero_pads():
    assert build_archive_path("BTCUSDT", 2025, 7) == (
        "raw/binance/spot/trades/symbol=BTCUSDT/year=2025/month=07/"
        "BTCUSDT-trades-2025-07.zip"
    )


def test_zone_rewrite():
    assert zone_rewrite("raw/a/b/x.zip") == "raw_unzipped/a/b/x.csv"
    with pytest.raises(ValueError):
        zone_rewrite("other/a.zip")


def test_downloader_end_to_end(http_fixture):
    lake = SCRATCH / "lake1"
    shutil.rmtree(lake, ignore_errors=True)
    key_ok = build_archive_path("BTCUSDT", 2025, 7)
    key_retry = build_archive_path("ETHUSDT", 2025, 7)
    payload = b"a,b,c\n" * 1000
    _Handler.bodies = {
        "/" + key_ok: _zip_bytes("BTCUSDT-trades-2025-07.csv", payload),
        "/" + key_retry: _zip_bytes("ETHUSDT-trades-2025-07.csv", payload),
    }
    _Handler.fail_first = {"/" + key_retry: 2}  # two 503s, then success
    _Handler.hits = {}

    dl = ArchiveDownloader(http_fixture, str(lake), retries=3, backoff=0.01)
    stats = dl.run(["BTCUSDT", "ETHUSDT", "BNBUSDT"], "2025-07", "2025-07")
    # BNBUSDT isn't served -> permanent 404 skip, no retries
    assert stats["downloaded"] == 2
    assert stats["skipped_404"] == 1
    assert stats["failed"] == 0
    assert _Handler.hits["/" + key_retry] == 3  # retried through backoff
    assert _Handler.hits["/" + build_archive_path("BNBUSDT", 2025, 7)] == 1
    assert (lake / key_ok).exists()
    assert not list(lake.rglob("*.part"))  # no partial objects

    # idempotent re-run: nothing re-downloaded
    hits_before = dict(_Handler.hits)
    stats2 = dl.run(["BTCUSDT", "ETHUSDT"], "2025-07", "2025-07")
    assert stats2["skipped_exists"] == 2
    assert _Handler.hits["/" + key_ok] == hits_before["/" + key_ok]


def test_downloader_gives_up_after_retries(http_fixture):
    lake = SCRATCH / "lake2"
    shutil.rmtree(lake, ignore_errors=True)
    key = build_archive_path("XRPUSDT", 2025, 8)
    _Handler.bodies = {"/" + key: b"x"}
    _Handler.fail_first = {"/" + key: 99}
    _Handler.hits = {}
    dl = ArchiveDownloader(http_fixture, str(lake), retries=3, backoff=0.01)
    assert dl.download_file(f"{http_fixture}/{key}", key) is False
    assert dl.stats["failed"] == 1
    assert _Handler.hits["/" + key] == 3
    assert not (lake / key).exists()


def test_streaming_unzipper(http_fixture):
    lake = SCRATCH / "lake3"
    shutil.rmtree(lake, ignore_errors=True)
    payload = b"1,2,3\n" * 200_000  # ~1.2 MB
    key = build_archive_path("BTCUSDT", 2025, 7)
    (lake / key).parent.mkdir(parents=True)
    (lake / key).write_bytes(_zip_bytes("inner.csv", payload))

    uz = StreamingUnzipper(str(lake), chunk_size=64 * 1024)  # force many chunks
    stats = uz.run()
    assert stats == {"found": 1, "processed": 1, "skipped": 0, "failed": 0}
    out = lake / zone_rewrite(key)
    assert out.read_bytes() == payload

    # idempotent re-run
    stats2 = uz.run()
    assert stats2["skipped"] == 1 and stats2["processed"] == 1


def test_unzipper_rejects_multimember(tmp_path):
    lake = SCRATCH / "lake4"
    shutil.rmtree(lake, ignore_errors=True)
    key = "raw/a/two.zip"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.csv", b"1")
        zf.writestr("b.csv", b"2")
    (lake / key).parent.mkdir(parents=True)
    (lake / key).write_bytes(buf.getvalue())
    uz = StreamingUnzipper(str(lake))
    assert uz.extract(key) is False
    assert uz.stats["failed"] == 1
    assert not (lake / zone_rewrite(key)).exists()


def test_cli_entry_points_importable_and_parse():
    """The job CLIs mirror the reference's runnable jobs; --help must
    work (argparse wiring) without touching network or Spark."""
    import pytest as _pytest

    from market_etl_spark.etl import main as etl_main
    from market_etl_spark.ingest.downloader import main as dl_main
    from market_etl_spark.ingest.unzipper import main as uz_main

    for entry in (etl_main, dl_main, uz_main):
        with _pytest.raises(SystemExit) as e:
            entry(["--help"])
        assert e.value.code == 0
