"""Regenerate plans.DRIVER_VERIFIED_HISTORY from the CORRECTNESS_r*.json
artifacts: the union of query names the driver has hash-verified green in
any prior round. Run after each round's artifact lands; paste the output
into ssidentity_spark/plans/__init__.py (tests/test_registry_window.py
asserts the committed set matches the artifacts exactly).
"""

from __future__ import annotations

import glob
import json
import os


def driver_green_history(repo_root: str | None = None) -> set[str]:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, rec in rows.items():
            if rec.get("hash_match"):
                green.add(name)
    return green


if __name__ == "__main__":
    names = sorted(driver_green_history())
    print(f"# {len(names)} driver-green queries across CORRECTNESS_r*.json")
    for n in names:
        print(f'        "{n}",')
