"""Regenerate registry.DRIVER_GREEN from the driver's CORRECTNESS files.

The registry orders the driver's 50-entry correctness window as a
verification-priority queue (unverified oracle-paired queries first).
Since round 4, ``registry.driver_green()`` also reads CORRECTNESS_r*.json
live, so a missed run of this script no longer wastes a round — running
it still bakes the verdicts into the committed set for provenance:

    python scripts/update_driver_green.py          # print the new set
    python scripts/update_driver_green.py --write  # rewrite registry.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY = os.path.join(REPO, "cve_manager_spark", "plans", "registry.py")


def green_names() -> list[str]:
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            if r.get("hash_match") is True:
                names.add(name)
    return sorted(names)


def main() -> int:
    names = green_names()
    body = "\n".join(f'    "{n}",' for n in names)
    literal = "DRIVER_GREEN = frozenset({\n" + body + "\n})"
    if "--write" in sys.argv:
        with open(REGISTRY) as f:
            src = f.read()
        new, n = re.subn(
            r"DRIVER_GREEN = frozenset\(\{.*?\}\)", literal, src, count=1, flags=re.S
        )
        if n != 1:
            print("DRIVER_GREEN literal not found in registry.py", file=sys.stderr)
            return 1
        with open(REGISTRY, "w") as f:
            f.write(new)
        print(f"registry.py updated: {len(names)} green queries")
    else:
        print(literal)
        print(f"# {len(names)} green queries", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
