"""Build the --py-files zip for spark-submit deployment.

The north rule mandates "run via spark-submit --py-files on multi-executor
clusters"; this makes that claim executable:

    python tools/package.py                 # → dist/mrt_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/mrt_spark.zip \
        tools/submit_pipeline.py <transcripts> <dictionary> <work_dir>

The zip is deterministic (sorted entries, zeroed timestamps) so repeated
builds are byte-identical — a rebuilt artifact never looks like a change.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "metadata_reconciliation_tool_spark"
DEFAULT_OUT = os.path.join(REPO, "dist", "mrt_spark.zip")


def build_zip(out_path: str = DEFAULT_OUT) -> str:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, PKG)
    entries = []
    for dirpath, _dirnames, filenames in os.walk(pkg_root):
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, REPO)
            entries.append((arc, full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    print(build_zip(out))
