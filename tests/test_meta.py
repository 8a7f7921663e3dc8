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


def test_no_qualified_epoch_us_in_oracles():
    """The events-layout rewrite in oracles()/parked() replaces the
    exact token `epoch_us(ts)` — a QUALIFIED `epoch_us(e.ts)` would
    survive unrewritten and break at the gate under a raw-int64 events
    regeneration (the r2 failure class; found latent in the first cut
    of the r13 funnel oracles). Every oracle, gated or parked, must
    reference epoch_us unqualified."""
    import re

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (
        queries as q,
    )

    texts = dict(q.oracles())
    texts.update({k: v.oracle for k, v in q.parked().items() if v.oracle})
    offenders = [
        name for name, o in texts.items() if re.search(r"epoch_us\(\s*\w+\.", o)
    ]
    assert offenders == []
