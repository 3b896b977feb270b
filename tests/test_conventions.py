"""Package-wide code conventions the verdicts have ratcheted in."""

import re
from pathlib import Path

PKG = Path(__file__).parent.parent / "clickhouse_datafusion_spark"


def test_no_blanket_except_pass():
    """r13 (VERDICT task 5): the seam convention is narrow exception
    classes + a recorded or propagated error; a blanket
    ``except Exception: pass`` silently eats genuine failures. The
    last one (the JVM active-session pin) was narrowed to the Connect
    no-JVM shape — keep the package at zero."""
    pat = re.compile(r"except\s+Exception\s*(?:as\s+\w+\s*)?:\s*\n\s*pass\b")
    offenders = [str(p) for p in sorted(PKG.rglob("*.py"))
                 if pat.search(p.read_text())]
    assert not offenders, offenders
