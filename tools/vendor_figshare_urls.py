#!/usr/bin/env python
"""Vendor jarvis-tools' exact figshare dataset URL table.

Zero-egress counterpart of tools/vendor_atom_tables.py for the dataset
URLs in alignn_tpu/data/figshare.py (13 entries are None there because
they cannot be verified without network access or jarvis-tools).  Run in
any jarvis-equipped environment:

    python tools/vendor_figshare_urls.py

writes alignn_tpu/data/figshare_urls.json mapping dataset name -> URL,
which `alignn_tpu.data.figshare.resolve_url` then prefers.
"""

import json
import os
import sys


def main() -> int:
    try:
        from jarvis.db.figshare import get_db_info
    except ImportError:
        print("jarvis-tools not installed; run where "
              "`pip install jarvis-tools` works.", file=sys.stderr)
        return 1
    info = get_db_info()
    # jarvis schema: name -> [url, filename, description, ...]
    table = {name: row[0] for name, row in info.items()}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.pardir, "alignn_tpu", "data",
                       "figshare_urls.json")
    with open(out, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    print(f"wrote {out} ({len(table)} datasets)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
