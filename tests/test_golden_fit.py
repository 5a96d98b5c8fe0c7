"""The golden-fit layer itself must stay green: the reconstructed
exampleDataset, run through the independent pure-Python evaluator, must
reproduce every expected result of the reference's e2e corpus.

This runs without Spark (milliseconds per query) and guards the fit
artifacts — if an engine-semantics change requires touching the evaluator
or the dataset builder, this catches divergence immediately.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

E2E = Path("/root/reference/endToEndTests/test")
GOLDEN_FIT = Path(__file__).resolve().parent.parent / "tools" / "golden_fit"

pytestmark = pytest.mark.skipif(
    not E2E.exists(), reason="reference golden corpus not available"
)


def test_evaluator_reproduces_all_goldens():
    sys.path.insert(0, str(GOLDEN_FIT))
    from build_dataset import build_records
    from check import run

    records = build_records()
    assert len(records) == 100
    passed, failed, failures = run(records)
    assert failed == 0, "\n".join(failures)
    assert passed == 134
