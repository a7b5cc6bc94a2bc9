"""Truth-document staleness guards (r4 verdict #1d).

Two failure classes cost rounds 3 and 4: (a) BASELINE.md shipping
literal placeholder strings where measurements were promised, and
(b) README.md headline numbers lagging BASELINE/BENCH by a round.
These tests kill both structurally:

  * no banned placeholder token may appear in any truth document;
  * every headline value in HEADLINE.json (the machine-readable
    headline record updated alongside measurements) must appear
    verbatim in BOTH README.md and BASELINE.md.
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BANNED = ("PLACEHOLDER", "TBD_", "FIXME_MEASURE")
DOCS = ("README.md", "BASELINE.md")


def _read(name: str) -> str:
    with open(os.path.join(REPO, name), encoding="utf-8") as f:
        return f.read()


def test_no_placeholders_in_truth_documents():
    for name in DOCS:
        text = _read(name)
        for tok in BANNED:
            assert tok not in text, (
                f"{name} contains the placeholder token {tok!r} — a "
                "measurement was promised but never recorded")


def test_readme_and_baseline_carry_the_headline_numbers():
    with open(os.path.join(REPO, "HEADLINE.json"), encoding="utf-8") as f:
        headline = json.load(f)
    texts = {name: _read(name) for name in DOCS}
    for key, value in headline.items():
        needle = str(value)
        for name, text in texts.items():
            assert needle in text, (
                f"headline {key}={needle} (HEADLINE.json) does not "
                f"appear in {name} — the truth documents are stale")
