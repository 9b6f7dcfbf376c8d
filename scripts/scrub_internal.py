#!/usr/bin/env python3
"""Redact internal-infrastructure hostnames from files before commit.

LEAKCHECK's hit list is self-amplifying: committing any file that quotes a
prior hit verbatim (a verdict, a ledger, a tool log) re-introduces the
string, and the next scan counts the quote as a fresh hit. This scrubber
breaks the loop: run it over any generated artifact (bench ledgers, docs
assembled from tool output) before `git add`. The patterns below are
structural — corporate artifact-mirror / internal-zone hostname shapes —
assembled from fragments so this file itself never contains a hit.

Usage: scripts/scrub_internal.py FILE... (rewrites in place; prints the
files it changed). Exit 0 always — a no-op scrub is success.
"""
import re
import sys

# Structural shapes of internal hostnames, with no literal spelled out:
#   <anything>.<internal-zone-word>.<org>.dev  and  artifact-mirror paths.
_ZONE = "(?:infra|corp|internal|intra)"
_PATTERNS = [
    re.compile(r"[a-z0-9.-]+\." + _ZONE + r"\.[a-z0-9-]+\.dev[a-z0-9./_-]*"),
    re.compile(r"https?://[a-z0-9.-]*" + _ZONE + r"[a-z0-9.-]*/[^\s\"']*"),
]
_REPLACEMENT = "[internal-host-redacted]"


def scrub(text: str) -> str:
    for pat in _PATTERNS:
        text = pat.sub(_REPLACEMENT, text)
    return text


def main(paths):
    for p in paths:
        try:
            with open(p, encoding="utf-8", errors="surrogateescape") as f:
                before = f.read()
        except OSError as e:
            print(f"skip {p}: {e}", file=sys.stderr)
            continue
        after = scrub(before)
        if after != before:
            with open(p, "w", encoding="utf-8", errors="surrogateescape") as f:
                f.write(after)
            print(f"scrubbed {p}")


if __name__ == "__main__":
    main(sys.argv[1:])
