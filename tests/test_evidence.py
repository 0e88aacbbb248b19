"""Evidence hygiene (VERDICT r2 weak #4): every training run referenced in
docs/ must have committed artifacts under docs/evidence/<run>/ — runs/ is
gitignored, so a doc citing an unsnapshotted run is citing nothing."""

import os
import re

DOCS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "docs")
EVIDENCE = os.path.join(DOCS, "evidence")


def _referenced_runs():
    runs = set()
    for fn in os.listdir(DOCS):
        if not fn.endswith(".md"):
            continue
        text = open(os.path.join(DOCS, fn)).read()
        runs |= set(re.findall(r"runs/([A-Za-z0-9_\-]+)", text))
    return runs


def test_docs_cite_only_snapshotted_runs():
    missing = []
    for run in sorted(_referenced_runs()):
        d = os.path.join(EVIDENCE, run)
        if not os.path.isdir(d) or not os.path.exists(
            os.path.join(d, "metrics.jsonl")
        ):
            missing.append(run)
    assert not missing, (
        f"docs/ reference runs without committed evidence: {missing} — "
        "run scripts/snapshot_evidence.sh <run> and commit docs/evidence"
    )
