"""Floor-selection rule for bench.py's automatic solo re-pin.

r11 verdict What's-wrong #1: the floor must come from the PRIOR
round's committed BENCH_LOCAL file — never the current round's own
(earlier same-day run or the shell-truncated redirect target) — or the
re-pin silently re-bases onto the numbers it is supposed to audit.
"""

import json

from bench import _trailing_floor


def _write(d, rnd, payload):
    p = d / f"BENCH_LOCAL_r{rnd:02d}.json"
    p.write_text(payload if isinstance(payload, str) else json.dumps(payload))


def test_floor_skips_current_rounds_own_file(tmp_path):
    """A same-round re-run (current round's file parseable) must floor
    against the PRIOR round, not the same day's earlier run."""
    _write(tmp_path, 11, {"queries_min": {"q": 0.2}})
    _write(tmp_path, 12, {"queries_min": {"q": 0.9}})  # current round
    assert _trailing_floor(str(tmp_path)) == {"q": 0.2}


def test_floor_skips_shell_truncated_redirect_target(tmp_path):
    """`python bench.py > BENCH_LOCAL_r12.json` truncates the target
    before the process starts; the empty file marks the current round
    and the floor falls back to r11."""
    _write(tmp_path, 11, {"queries_min": {"q": 0.2}})
    _write(tmp_path, 12, "")  # unparseable redirect target
    assert _trailing_floor(str(tmp_path)) == {"q": 0.2}


def test_floor_skips_unparseable_prior_and_keeps_descending(tmp_path):
    """An unparseable prior file is skipped, not treated as 'no floor'."""
    _write(tmp_path, 10, {"queries_min": {"q": 0.3}})
    _write(tmp_path, 11, "{broken")
    _write(tmp_path, 12, "")
    assert _trailing_floor(str(tmp_path)) == {"q": 0.3}


def test_floor_empty_when_only_current_round_exists(tmp_path):
    """One file = the current round itself: no prior floor, no re-pin."""
    _write(tmp_path, 12, {"queries_min": {"q": 0.2}})
    assert _trailing_floor(str(tmp_path)) == {}
    assert _trailing_floor(str(tmp_path / "missing")) == {}


def test_floor_falls_back_to_queries_median(tmp_path):
    """Old artifacts without queries_min floor on the medians."""
    _write(tmp_path, 11, {"queries": {"q": 0.4}})
    _write(tmp_path, 12, "")
    assert _trailing_floor(str(tmp_path)) == {"q": 0.4}
