"""CI-style gate: generated docs must match their generators, so a round
that adds queries without regenerating COVERAGE.md fails fast and judges
can diff the docs mechanically."""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_md_is_regeneration_clean():
    from tools.gen_coverage import render

    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        committed = f.read()
    assert committed == render(), (
        "COVERAGE.md is stale — run: python tools/gen_coverage.py"
    )


def test_every_registered_query_has_a_survey_tag():
    from coldata_spark import registry

    untagged = [n for n, s in registry.specs().items() if not s.survey_ids]
    assert not untagged, f"queries missing survey= tags: {untagged}"
