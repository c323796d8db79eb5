#!/usr/bin/env python
"""Generate the README gate line's test-count fragment from a real
pytest summary (r15 verdict ask #8 — the count drifted by one in three
consecutive rounds because the line was hand-written before the last
test landed).

Usage:
    python -m pytest tests/ -q 2>&1 | tail -2 | python tools/readme_test_count.py
    # or pass the summary line as an argument
    python tools/readme_test_count.py "502 passed, 3 skipped in 1380.12s"

Prints the canonical fragment, e.g.:
    pytest 502 passed / 0 failed (3 env-gated skips)

The round-end README row MUST paste this output verbatim; it also
cross-checks the claim against `pytest --collect-only -q` when invoked
with --check (collected == passed + failed + skipped).
"""

from __future__ import annotations

import re
import subprocess
import sys


def parse(summary: str) -> tuple[int, int, int]:
    def grab(word: str) -> int:
        m = re.search(rf"(\d+) {word}", summary)
        return int(m.group(1)) if m else 0

    return grab("passed"), grab("failed"), grab("skipped")


def main() -> int:
    text = (
        " ".join(sys.argv[1:])
        if sys.argv[1:] and not sys.argv[1].startswith("--")
        else sys.stdin.read()
    )
    passed, failed, skipped = parse(text)
    if passed == 0:
        print("no 'N passed' found in input", file=sys.stderr)
        return 2
    frag = f"pytest {passed} passed / {failed} failed"
    if skipped:
        frag += f" ({skipped} env-gated skips)"
    print(frag)
    if "--check" in sys.argv:
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
            capture_output=True,
            text=True,
        ).stdout
        m = re.search(r"(\d+) tests? collected", out)
        collected = int(m.group(1)) if m else -1
        ok = collected == passed + failed + skipped
        print(
            f"collected={collected} vs claimed={passed + failed + skipped}: "
            + ("OK" if ok else "MISMATCH"),
            file=sys.stderr,
        )
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
