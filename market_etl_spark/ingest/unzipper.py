"""Streaming ZIP extractor (S4-S6).

Parity with the reference's unzipper
(jobs/downloader/glue_binance_unzipper.py): zone listing with suffix
filter (:33-50), bounded-memory streaming extraction in 5 MB chunks
(:60-154 — the reference uses S3 multipart parts; locally the same
chunk loop feeds an append write + atomic rename), zone-rewrite naming
``raw/ → raw_unzipped/``, ``.zip → .csv`` (:156-168), idempotent skip
(:52-58), and found/processed/skipped/failed stats (:25-31).

Memory stays ~chunk_size regardless of archive size — a 50 GB member
extracts in 5 MB steps, never fully resident.
"""

from __future__ import annotations

import pathlib
import zipfile
from dataclasses import dataclass, field

CHUNK = 5 * 1024 * 1024  # 5 MB, the reference's multipart part size


def zone_rewrite(
    key: str,
    src_zone: str = "raw",
    dst_zone: str = "raw_unzipped",
    src_suffix: str = ".zip",
    dst_suffix: str = ".csv",
) -> str:
    """``raw/.../x.zip`` → ``raw_unzipped/.../x.csv`` (first zone
    segment only, suffix swap)."""
    if not key.startswith(src_zone + "/"):
        raise ValueError(f"key {key!r} not in zone {src_zone!r}")
    if not key.endswith(src_suffix):
        raise ValueError(f"key {key!r} lacks suffix {src_suffix!r}")
    return dst_zone + key[len(src_zone) : len(key) - len(src_suffix)] + dst_suffix


@dataclass
class StreamingUnzipper:
    lake_root: str
    chunk_size: int = CHUNK

    stats: dict = field(
        default_factory=lambda: {"found": 0, "processed": 0, "skipped": 0, "failed": 0}
    )

    def list_archives(self, zone: str = "raw", suffix: str = ".zip") -> list[str]:
        """Recursive zone listing with a suffix filter, as lake-relative
        keys (the reference's paginated list_objects_v2 loop)."""
        root = pathlib.Path(self.lake_root)
        keys = sorted(
            p.relative_to(root).as_posix()
            for p in (root / zone).rglob(f"*{suffix}")
            if p.is_file()
        )
        self.stats["found"] += len(keys)
        return keys

    def extract(self, zip_key: str) -> bool:
        """Stream-extract the single member of one archive to its
        rewritten zone path; idempotent; True iff the CSV is present
        afterwards."""
        root = pathlib.Path(self.lake_root)
        dst = root / zone_rewrite(zip_key)
        if dst.exists():
            self.stats["skipped"] += 1
            return True
        src = root / zip_key
        tmp = dst.with_suffix(dst.suffix + ".part")
        try:
            with zipfile.ZipFile(src) as zf:
                members = zf.namelist()
                if len(members) != 1:
                    raise ValueError(f"{zip_key}: expected 1 member, found {len(members)}")
                dst.parent.mkdir(parents=True, exist_ok=True)
                with zf.open(members[0]) as inner, open(tmp, "wb") as out:
                    while True:
                        chunk = inner.read(self.chunk_size)
                        if not chunk:
                            break
                        out.write(chunk)
            tmp.rename(dst)
            self.stats["processed"] += 1
            return True
        except Exception:
            tmp.unlink(missing_ok=True)
            self.stats["failed"] += 1
            return False

    def run(self, zone: str = "raw") -> dict:
        for key in self.list_archives(zone):
            self.extract(key)
        return dict(self.stats)


def main(argv: list[str] | None = None) -> None:
    """CLI for the streaming unzipper: extract every archive in the raw
    zone into the extracted zone with bounded memory."""
    import argparse
    import json

    p = argparse.ArgumentParser(description="Bounded-memory ZIP-extract job")
    p.add_argument("--lake-root", required=True, help="lake root containing the raw zone")
    p.add_argument("--zone", default="raw")
    args = p.parse_args(argv)

    uz = StreamingUnzipper(lake_root=args.lake_root)
    print(json.dumps(uz.run(args.zone)))


if __name__ == "__main__":
    main()
