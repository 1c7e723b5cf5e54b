"""Driver-side ingest utilities (S4).

HTTP fetch is an orchestration step, not a Spark op — the reference runs
it as a separate script before the Spark jobs
(``scripts/fetch_data.py:12-26``, wired first in the DAG at
``dags/etl_daily.py:35``). Kept equally thin here: stdlib urllib, atomic
rename, skip-if-exists. At scale this is the job that lands source files
into the raw zone for the file-source stream (W1) to pick up.
"""

from __future__ import annotations

import os
import urllib.request
from pathlib import Path


def fetch_to_raw(
    url: str,
    dest: str | Path,
    skip_if_exists: bool = True,
    timeout: int = 60,
) -> Path:
    """Download ``url`` to ``dest`` (parity: ``scripts/fetch_data.py:12-26``
    including its skip-if-exists fast path). Atomic: writes to a .part file
    and renames, so a killed fetch never leaves a truncated file for the
    inbox stream to ingest."""
    dest = Path(dest)
    if skip_if_exists and dest.exists():
        return dest
    dest.parent.mkdir(parents=True, exist_ok=True)
    part = dest.with_suffix(dest.suffix + ".part")
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        with open(part, "wb") as f:
            while chunk := resp.read(1 << 20):
                f.write(chunk)
    os.replace(part, dest)
    return dest
