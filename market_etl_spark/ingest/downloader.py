"""HTTP archive downloader (S1-S3).

Parity with the reference's Glue PyShell downloader
(jobs/downloader/glue_binance_downloader.py): month-range work-list
cross symbols (:38-57, :173-179), Hive-style zero-padded archive paths
(:67-81), streaming download with bounded memory (:112-125), 3
retries with 1/2/4s exponential backoff (:107-148), 404 as permanent
skip, idempotent existence check before any network call (:83-94),
politeness delay (:182), and a run-stats dict (:30-36, 184-196).

stdlib only (urllib); targets a local filesystem lake root. Writes go
to a temp file then atomically rename — a crashed run never leaves a
partial object, which is what makes the existence check a safe
idempotency key.
"""

from __future__ import annotations

import pathlib
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field


def generate_months(start: str, end: str) -> list[tuple[int, int]]:
    """'2025-07'..'2025-09' → [(2025,7),(2025,8),(2025,9)] inclusive."""
    sy, sm = (int(x) for x in start.split("-"))
    ey, em = (int(x) for x in end.split("-"))
    if (sy, sm) > (ey, em):
        raise ValueError(f"start {start!r} after end {end!r}")
    out = []
    y, m = sy, sm
    while (y, m) <= (ey, em):
        out.append((y, m))
        m += 1
        if m > 12:
            y, m = y + 1, 1
    return out


def build_archive_path(
    symbol: str, year: int, month: int, data_type: str = "trades", zone: str = "raw"
) -> str:
    """Hive-style archive key with zero-padded month:
    ``raw/binance/spot/trades/symbol=X/year=Y/month=MM/X-trades-Y-MM.zip``."""
    return (
        f"{zone}/binance/spot/{data_type}/symbol={symbol}/year={year}/"
        f"month={month:02d}/{symbol}-{data_type}-{year}-{month:02d}.zip"
    )


@dataclass
class ArchiveDownloader:
    base_url: str
    dest_root: str
    retries: int = 3
    backoff: float = 1.0
    delay: float = 0.0
    chunk_size: int = 1 << 20

    stats: dict = field(
        default_factory=lambda: {
            "attempted": 0,
            "downloaded": 0,
            "skipped_exists": 0,
            "skipped_404": 0,
            "failed": 0,
            "bytes": 0,
        }
    )

    def _dest(self, key: str) -> pathlib.Path:
        return pathlib.Path(self.dest_root) / key

    def exists(self, key: str) -> bool:
        """Idempotent skip: an object present in the zone is done."""
        return self._dest(key).exists()

    def download_file(self, url: str, key: str) -> bool:
        """Stream one archive; True iff it landed (or already existed).

        404 is a permanent skip (no retries — the month simply isn't
        published); transient errors retry with exponential backoff.
        """
        self.stats["attempted"] += 1
        if self.exists(key):
            self.stats["skipped_exists"] += 1
            return True
        dest = self._dest(key)
        dest.parent.mkdir(parents=True, exist_ok=True)
        tmp = dest.with_suffix(dest.suffix + ".part")
        for attempt in range(self.retries):
            try:
                with urllib.request.urlopen(url, timeout=300) as resp, open(tmp, "wb") as out:
                    while True:
                        chunk = resp.read(self.chunk_size)
                        if not chunk:
                            break
                        out.write(chunk)
                        self.stats["bytes"] += len(chunk)
                tmp.rename(dest)
                self.stats["downloaded"] += 1
                if self.delay:
                    time.sleep(self.delay)
                return True
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    self.stats["skipped_404"] += 1
                    return False
                if attempt + 1 < self.retries:
                    time.sleep(self.backoff * (2**attempt))
            except (urllib.error.URLError, OSError):
                if attempt + 1 < self.retries:
                    time.sleep(self.backoff * (2**attempt))
        tmp.unlink(missing_ok=True)
        self.stats["failed"] += 1
        return False

    def run(self, symbols: list[str], start: str, end: str, data_type: str = "trades") -> dict:
        """Work list = months × symbols; one idempotent unit per pair."""
        for year, month in generate_months(start, end):
            for symbol in symbols:
                key = build_archive_path(symbol, year, month, data_type)
                self.download_file(f"{self.base_url.rstrip('/')}/{key}", key)
        return dict(self.stats)


def main(argv: list[str] | None = None) -> None:
    """CLI mirroring the reference downloader job's arguments
    (symbols, month range, destination), plus ``--base-url`` so the
    same binary serves production endpoints and local test fixtures."""
    import argparse
    import json

    p = argparse.ArgumentParser(description="Idempotent monthly-archive downloader")
    p.add_argument("--base-url", required=True)
    p.add_argument("--dest-root", required=True)
    p.add_argument("--symbols", required=True, help="comma-separated, e.g. BTCUSDT,ETHUSDT")
    p.add_argument("--start", required=True, help="YYYY-MM first month")
    p.add_argument("--end", required=True, help="YYYY-MM last month (inclusive)")
    p.add_argument("--data-type", default="trades")
    p.add_argument("--retries", type=int, default=3)
    p.add_argument("--delay", type=float, default=0.0)
    args = p.parse_args(argv)

    dl = ArchiveDownloader(
        base_url=args.base_url,
        dest_root=args.dest_root,
        retries=args.retries,
        delay=args.delay,
    )
    stats = dl.run(args.symbols.split(","), args.start, args.end, args.data_type)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
