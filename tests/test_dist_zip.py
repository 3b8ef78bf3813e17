"""dist/ zip staleness gate (VERDICT r05 #5).

``spark-submit --py-files dist/deepseek_ocr_2_spark.zip`` silently runs
whatever code is IN the zip — past rounds lost time to a stale zip
shipping old kernels.  This gate makes staleness a CI failure instead
of a runtime mystery:

* zip ABSENT (fresh checkout — dist/ is gitignored): build it, pass.
* zip PRESENT: every ``.py`` member's bytes must equal the live file,
  and the member set must equal the live ``.py`` file set.  Any drift
  fails with the exact remediation command.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "deepseek_ocr_2_spark"
ZIP = os.path.join(REPO, "dist", f"{PKG}.zip")
FIX = "python tools/make_pyfiles_zip.py"


def _live_members() -> dict:
    out = {}
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for name in files:
            if name.endswith(".py"):
                full = os.path.join(root, name)
                with open(full, "rb") as f:
                    out[os.path.relpath(full, REPO)] = f.read()
    return out


def test_dist_zip_matches_live_package():
    if not os.path.exists(ZIP):
        # fresh checkout: no stale artifact exists to mislead anyone —
        # build it so the checkout leaves CI deploy-ready
        import sys

        sys.path.insert(0, os.path.join(REPO, "tools"))
        import make_pyfiles_zip

        make_pyfiles_zip.main()
        assert os.path.exists(ZIP)

    live = _live_members()
    with zipfile.ZipFile(ZIP) as zf:
        members = {n for n in zf.namelist() if n.endswith(".py")}
        stale = sorted(
            n for n in members & set(live) if zf.read(n) != live[n]
        )
    missing = sorted(set(live) - members)
    extra = sorted(members - set(live))
    problems = []
    if stale:
        problems.append(f"stale members (content drift): {stale}")
    if missing:
        problems.append(f"missing from zip: {missing}")
    if extra:
        problems.append(f"deleted from package but still in zip: {extra}")
    assert not problems, (
        f"dist/{PKG}.zip lags the live package — rerun `{FIX}`.  "
        + "; ".join(problems)
    )
