"""README perf-table drift gate: the block between the BENCH markers must
be exactly what tools/gen_readme_perf.py renders from the BENCH_r*.json
it names, and that round may lag the newest measured file by AT MOST one
(the driver writes BENCH_r{N}.json after round N ends, so the first suite
run that sees it predates any chance to regenerate). Hand-edits and
multi-round staleness still fail (VERDICT r3 weak #1 — one source of
perf truth)."""

import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "gen_readme_perf", os.path.join(REPO, "tools", "gen_readme_perf.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_readme_perf_table_matches_its_named_bench():
    tool = _load_tool()
    newest, _ = tool.latest_bench()
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    i, j = text.find(tool.BEGIN), text.find(tool.END)
    assert i >= 0 and j > i, "README.md lost its BENCH markers"
    current = text[i:j + len(tool.END)]
    m = re.search(r"BENCH_r(\d+)\.json", current)
    assert m, "README BENCH block doesn't name its source BENCH file"
    claimed = int(m.group(1))
    assert claimed >= newest - 1, (
        "README perf table lags the newest measurement by more than one "
        "round (claims r%02d, newest measured is r%02d) — run "
        "`python tools/gen_readme_perf.py`" % (claimed, newest))
    block = tool.render_block(claimed, tool.bench_for_round(claimed))
    assert current == block, (
        "README perf table was hand-edited or mis-rendered — run "
        "`python tools/gen_readme_perf.py` (block must match the render "
        "of BENCH_r%02d.json exactly)" % claimed)


def test_generator_handles_old_and_new_mig_keys():
    tool = _load_tool()
    # pre-r4 style: mig_eval_seconds is the cold pass
    tracked, cold = tool._mig_numbers(
        {"mig_eval_seconds": 71.6, "mig_eval_seconds_warm": 8.6})
    assert (tracked, cold) == (8.6, 71.6)
    # r4+ style: mig_eval_seconds already tracks warm; cold rides alongside
    tracked, cold = tool._mig_numbers(
        {"mig_eval_seconds": 8.6, "mig_eval_seconds_warm": 8.6,
         "mig_eval_seconds_cold": 71.6})
    assert (tracked, cold) == (8.6, 71.6)
