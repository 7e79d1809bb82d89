#!/usr/bin/env python3
"""Builder-side partial gate: prune oracle_sql.json to the query dirs
actually present in a filtered graft.Verify dump, then run check.py.

Usage: python3 tools/checksome.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys

import check


def main(sf_dir: str, out_dir: str) -> int:
    path = f"{out_dir}/oracle_sql.json"
    with open(path) as f:
        oracles = json.load(f)
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    kept = {k: v for k, v in oracles.items() if k in dirs}
    with open(path, "w") as f:
        json.dump(kept, f)
    print(f"checking {len(kept)} of {len(oracles)} oracles")
    return check.main(sf_dir, out_dir)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
