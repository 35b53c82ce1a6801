"""Ingest utilities (SURVEY.md §2.1 S1-S6): land remote archives into
the lake's raw zones.

Driver-side plain Python by design — the reference isolates this from
the query engine for the same reason (Spark can't stream remote ZIPs;
README.md:135-137). At scale the per-file work distributes with
``spark.sparkContext.parallelize(work_list).foreachPartition(...)``;
each unit is self-contained and idempotent, so retries/replays are
free.
"""

from .downloader import ArchiveDownloader, build_archive_path, generate_months
from .unzipper import StreamingUnzipper, zone_rewrite

__all__ = [
    "ArchiveDownloader",
    "StreamingUnzipper",
    "build_archive_path",
    "generate_months",
    "zone_rewrite",
]
