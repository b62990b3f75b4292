#!/usr/bin/env python3
"""End-of-round README count refresh — keeps the three numbers the
README states (gated queries, tests, spec suites) in sync with reality
so they can never go stale again (the round-12 "532 tests" lesson).

Sources of truth:
  - gated queries: `PASS ` lines in a selfcheck log, or the query dirs
    under a Verify output directory.
  - tests/suites: the final ScalaTest summary in an `sbt test` log.

Usage: python3 scripts/refresh_counts.py <sbt_test_log> <verify_out_dir>
Prints the old/new numbers; edits README.md in place.
"""
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    log = Path(sys.argv[1])
    verify_dir = Path(sys.argv[2])
    m = re.findall(r"Tests: succeeded (\d+), failed (\d+)", log.read_text())
    if not m:
        sys.exit(f"no ScalaTest summary in {log}")
    tests, failed = (int(x) for x in m[-1])
    if failed:
        sys.exit(f"refusing to record a failing suite ({failed} failed)")
    suites = len(re.findall(r"^\[info\] [A-Za-z0-9]+Spec:$",
                            log.read_text(), re.M))
    queries = len([d for d in verify_dir.iterdir()
                   if d.is_dir() and d.name.startswith("q")])
    readme = REPO / "README.md"
    s = readme.read_text()
    old = s
    s = re.sub(r"\b\d+ gated queries", f"{queries} gated queries", s)
    s = re.sub(r"\(\d+/\d+\s*\npass at sf0\.01\)",
               f"({queries}/{queries}\npass at sf0.01)", s)
    s = re.sub(r"\(\d+/\d+ pass at sf0\.01\)",
               f"({queries}/{queries} pass at sf0.01)", s)
    s = re.sub(r"\b\d+ tests across \d+ specs",
               f"{tests} tests across {suites} specs", s)
    s = re.sub(r"# \d+ tests", f"# {tests} tests", s)
    readme.write_text(s)
    print(f"queries={queries} tests={tests} suites={suites} "
          f"changed={'yes' if s != old else 'no'}")


if __name__ == "__main__":
    main()
