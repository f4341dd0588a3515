"""Certification-window invariant guard (r4 ADVICE item).

The external driver verifies only the FIRST 50 keys of
`__spark_entry__.queries()` per round (the documented rotation). Any key
whose code path changes in a round MUST sit inside that round's window,
or the change ships without a driver-signed correctness row.

Usage:
    python tools/check_window.py KEY [KEY ...]   # assert all in window
    python tools/check_window.py --list          # print window membership

Exit 0 iff every named key is registered AND within the first 50.
"""
from __future__ import annotations

import sys

WINDOW = 50


def main(argv: list[str]) -> int:
    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod

    keys = list(entrymod.queries().keys())
    window = keys[:WINDOW]
    if not argv or argv[0] == "--list":
        for i, k in enumerate(keys):
            mark = "IN " if i < WINDOW else "out"
            print(f"{i + 1:3d} {mark} {k}")
        print(f"\n{len(keys)} keys, window = first {WINDOW}")
        return 0
    bad = [k for k in argv if k not in window]
    unknown = [k for k in bad if k not in keys]
    outside = [k for k in bad if k in keys]
    for k in unknown:
        print(f"UNKNOWN key: {k!r} (not registered in queries())")
    for k in outside:
        print(
            f"OUTSIDE window: {k!r} at position {keys.index(k) + 1} "
            f"(> {WINDOW}) — rotate it in before shipping this round"
        )
    if bad:
        return 1
    print(f"OK: {len(argv)} key(s) all inside the first-{WINDOW} window")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
