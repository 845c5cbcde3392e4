"""PLANS.md drift check (round 11, VERDICT #8 stretch).

PLANS.md is the rendered artifact of the "explain and iterate until
it's the plan you'd want" loop — but nothing pinned it to the CURRENT
plans: a plan regression the structural pins in test_plan_shapes.py
don't cover (a new exchange, a lost broadcast in an unpinned query)
could drift the document silently.  This test regenerates the document
through the real generator (a subprocess, so the session config is
exactly the generator's, not the test session's) and diffs it
section-by-section against the committed file after normalizing the
run-volatile tokens (expression ids, RDD ids — allocation counters
that shift whenever upstream queries change).

A failure means: the committed PLANS.md no longer matches the plans
the code produces — rerun `python scripts/dump_plans.py` and REVIEW
the diff (an unreviewed plan change is the bug this test exists to
catch), then commit the regenerated file.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _normalize(text: str) -> str:
    # expression ids (#123) and RDD ids are allocation counters —
    # volatile across sessions; everything else in the formatted plan
    # is structural
    text = re.sub(r"#\d+", "#x", text)
    text = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[x]", text)
    text = re.sub(r"\[plan_id=\d+\]", "", text)
    return text


def _sections(text: str) -> dict[str, str]:
    parts = re.split(r"^## ", text, flags=re.MULTILINE)
    return {
        p.split("\n", 1)[0].strip(): p.split("\n", 1)[1] for p in parts[1:]
    }


def test_plans_md_matches_regenerated(tmp_path):
    out = tmp_path / "plans_regen.md"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(_ROOT, "scripts", "dump_plans.py"),
            "/root/testdata/sf0.001",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=_ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    committed = _sections(_normalize(open(os.path.join(_ROOT, "PLANS.md")).read()))
    regen = _sections(_normalize(out.read_text()))
    assert set(committed) == set(regen), (
        f"query set drifted: only committed {sorted(set(committed) - set(regen))}, "
        f"only regenerated {sorted(set(regen) - set(committed))} — rerun "
        f"scripts/dump_plans.py and review"
    )
    drifted = sorted(n for n in committed if committed[n] != regen[n])
    assert not drifted, (
        f"physical plans drifted for {drifted} — rerun scripts/dump_plans.py, "
        f"REVIEW the plan diff, and commit the regenerated PLANS.md"
    )
