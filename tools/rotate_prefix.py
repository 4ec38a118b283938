"""Compute the never-driver-certified pool for the next prefix rotation.

The driver certifies only the first 50 registry entries each round
(`registry._FLAGSHIP_PREFIX`), so the prefix rotates to ACCUMULATE
coverage. This script is the "usual recompute" the staging comments
reference: all registry names minus every entry ever green in a committed
CORRECTNESS_r*.json, printed grouped by defining module so the next prefix
can be staged family-by-family.

Usage: python tools/rotate_prefix.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_flight_bigdata_dashboard_spark import registry


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    certified: set[str] = set()
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        data = json.load(open(f))
        for name, cell in data.items():
            if (
                isinstance(cell, dict)
                and cell.get("rows_match")
                and cell.get("schema_match")
                and cell.get("hash_match") in (True, None)
            ):
                certified.add(name)
    by_module: dict[str, list[str]] = {}
    for mod in registry._MODULES:
        for name in mod.QUERIES:
            if name not in certified:
                by_module.setdefault(mod.__name__.rsplit(".", 1)[-1], []).append(name)
    total = sum(len(v) for v in by_module.values())
    print(f"certified: {len(certified)}  registry: {len(registry.queries())}  "
          f"never-certified pool: {total}")
    for mod, names in sorted(by_module.items()):
        print(f"\n# {mod} ({len(names)})")
        for n in sorted(names):
            print(f'    "{n}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
