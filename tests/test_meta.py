"""Meta-tests over the test suite itself.

r12 (ADVICE r11): conftest._SLOW_TESTS is a free-text name set — a
renamed or deleted test would silently fall out of the slow tier and
start running in the fast inner loop (or stop being tracked) with no
signal. This pin scans the test sources for each listed name, so the
tier list stays honest under any pytest invocation scope (a
collection-time hook can't distinguish a scoped run from a full one).
"""

import re
from pathlib import Path

import conftest

TESTS_DIR = Path(__file__).parent


def test_every_slow_tier_entry_names_a_real_test():
    source = "\n".join(
        p.read_text() for p in sorted(TESTS_DIR.glob("test_*.py"))
    )
    defined = set(re.findall(r"^def (test_\w+)\(", source, re.MULTILINE))
    stale = conftest._SLOW_TESTS - defined
    assert not stale, (
        "conftest._SLOW_TESTS entries match no test function "
        f"(renamed or deleted?): {sorted(stale)}"
    )
