"""Summarize outputs/protocol/*.json runner summaries into one table.

Usage: python scripts/summarize_protocol.py [dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else "outputs/protocol"
    rows = []
    for path in sorted(glob.glob(os.path.join(d, "*.json"))):
        s = json.load(open(path))
        r = s.get("test_rmse") or s.get("test_auroc")
        if not r:
            continue
        rows.append(
            (
                os.path.basename(path).removesuffix(".json"),
                f"{r['mean']:.4f} ± {r['std']:.4f}",
                r.get("n", ""),
            )
        )
    w = max(len(r[0]) for r in rows) if rows else 8
    print(f"{'protocol':<{w}}  test metric (mean ± std)  n")
    for name, metric, n in rows:
        print(f"{name:<{w}}  {metric:<24}  {n}")


if __name__ == "__main__":
    main()
