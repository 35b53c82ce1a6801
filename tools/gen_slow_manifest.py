"""Generate tests/slow_manifest.txt from a `pytest --durations=0` log.

The VERIFY gate's pytest window is shorter than the full suite (~43-56
min); VERDICT r14 item 3 asks for a marker-gated fast tier <= 15 min
that still exercises every test module, with the long protocol drills
behind `-m slow` (never deleted, still run at round exit).

Policy, applied to per-test (setup+call+teardown) totals from the
measured log:

- a test whose total >= THRESHOLD seconds goes in the manifest (slow);
- every file keeps at least one unmarked test: if a file's tests are
  all above threshold, its cheapest test is removed from the manifest
  so the fast tier covers the module.

Usage: python tools/gen_slow_manifest.py <durations.log> [threshold]
Writes tests/slow_manifest.txt (sorted, one nodeid per line).
"""

from __future__ import annotations

import collections
import pathlib
import re
import sys

THRESHOLD_DEFAULT = 2.0


def main() -> None:
    log = sys.argv[1]
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else THRESHOLD_DEFAULT
    tot: collections.Counter = collections.Counter()
    for line in open(log):
        m = re.match(r"([0-9.]+)s (call|setup|teardown)\s+(\S+)", line)
        if m:
            tot[m.group(3)] += float(m.group(1))

    slow = {k for k, v in tot.items() if v >= thr}
    by_file: dict[str, list] = collections.defaultdict(list)
    for k in tot:
        by_file[k.split("::")[0]].append(k)
    for f, tests in by_file.items():
        if all(t in slow for t in tests):
            keep = min(tests, key=lambda t: tot[t])
            slow.discard(keep)
            print(f"keeping {keep} ({tot[keep]:.1f}s) so {f} stays covered")

    fast_sec = sum(v for k, v in tot.items() if k not in slow)
    out = pathlib.Path(__file__).resolve().parent.parent / "tests" / "slow_manifest.txt"
    out.write_text("".join(f"{k}\n" for k in sorted(slow)))
    print(
        f"{len(slow)} slow tests -> {out}; fast tier "
        f"{len(tot) - len(slow)} tests, ~{fast_sec / 60:.1f} min measured"
    )


if __name__ == "__main__":
    main()
